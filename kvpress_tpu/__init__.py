"""kvpress_tpu — a TPU-native long-context KV-cache compression framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of
NVIDIA/kvpress (see SURVEY.md): presses are pure score/compress functions over
explicit sharded cache pytrees, threaded through jitted prefill/decode loops.
"""

from .cache import KVCache, init_cache, masked_fraction, shrink, valid_mask
from .config import ModelConfig, tiny_config
from .models.llama import Runner, init_params
from .pipeline import KVPressPipeline
from .presses import *       # noqa: F401,F403 — the full press catalog
from .presses import __all__ as _press_all

__version__ = "0.1.0"

__all__ = [
    "KVCache",
    "init_cache",
    "masked_fraction",
    "shrink",
    "valid_mask",
    "ModelConfig",
    "tiny_config",
    "Runner",
    "init_params",
    "KVPressPipeline",
] + list(_press_all)
