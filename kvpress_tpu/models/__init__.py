from .llama import Runner, init_params
from .convert import convert_state_dict, from_torch_model, load_pretrained

__all__ = ["Runner", "init_params", "convert_state_dict", "from_torch_model", "load_pretrained"]
