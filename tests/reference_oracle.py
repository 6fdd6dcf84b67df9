"""Import the reference kvpress (read-only, /root/reference) as a *test
oracle*: we run its presses on a tiny torch model and assert that our JAX
presses keep the same KV entries. No reference code is copied — it is executed
in-process to generate expected outputs."""

import sys
import types


def _shim(name: str, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def load_reference():
    class _LRUCache(dict):
        def __init__(self, maxsize=None, **kw):
            super().__init__()

    def _cached(cache=None, key=None, **kw):
        def deco(fn):
            return fn
        return deco

    _shim("cachetools", LRUCache=_LRUCache, cached=_cached)
    _shim("fire", Fire=lambda *a, **k: None)
    # kvzap/data.py imports FP8Linear, whose module needs triton (absent here);
    # FP8 paths are never exercised on the tiny test models.
    class _FP8Linear:
        pass
    _shim("transformers.integrations.finegrained_fp8", FP8Linear=_FP8Linear)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import kvpress  # noqa: F401

    return kvpress


def tiny_torch_model(model_type="llama", eager=True, seed=0, **kw):
    import torch
    from transformers import AutoModelForCausalLM, LlamaConfig, Qwen3Config

    common = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=1024,
        tie_word_embeddings=False,
    )
    common.update(kw)
    cls = {"llama": LlamaConfig, "qwen3": Qwen3Config}[model_type]
    if model_type == "qwen3":
        common["head_dim"] = common["hidden_size"] // common["num_attention_heads"]
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(
        cls(**common, attn_implementation="eager" if eager else "sdpa")
    )
    model.eval()
    return model


def run_reference_press(model, press, ids):
    """Prefill with the press attached; return list of (keys, values) numpy
    arrays per layer, shape (B, Hkv, S_kept, D)."""
    import torch
    from transformers import DynamicCache

    cache = DynamicCache()
    with press(model), torch.no_grad():
        model.model(
            input_ids=torch.tensor(ids),
            past_key_values=cache,
            output_attentions=getattr(model.config, "_attn_implementation", "") == "eager",
        )
    out = []
    for layer in cache.layers:
        out.append((layer.keys.float().numpy(), layer.values.float().numpy()))
    return out
