"""HF checkpoint → stacked JAX params.

Handles the architecture surface the reference special-cases in
``kvpress/utils.py:12-95``: plain q/k/v/o (Llama/Mistral/Qwen2), fused qkv and
gate_up (Phi3 — split at conversion time so the runtime has one layout),
q/k-norm (Qwen3/Gemma3). Input is any mapping name→numpy array (from
``safetensors`` shards or a torch ``state_dict``).
"""

from __future__ import annotations

import os
import json
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        import torch
        if t.dtype == torch.bfloat16 or "float8" in str(t.dtype):
            # fp8 checkpoints (reference evaluate.py:370 FineGrainedFP8Config)
            # are ingested by upcasting: v5e has no fp8 MXU — the runtime
            # memory story is weight-int8 (models.llama.quantize_params_int8).
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def convert_state_dict(
    sd: Mapping[str, "np.ndarray"], cfg: ModelConfig, dtype=jnp.bfloat16
) -> dict:
    """Map an HF-style state dict to our stacked layout ((L, in, out) linears)."""
    get = lambda name: _np(sd[name])
    has = lambda name: name in sd
    L = cfg.num_layers
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def stack(maker):
        return jnp.asarray(np.stack([maker(i) for i in range(L)]), dtype)

    def linear(i, name):
        w = get(f"model.layers.{i}.{name}.weight")
        # Fine-grained fp8 checkpoints carry 128x128 block inverse scales;
        # dequantize at conversion (fp8 payload was upcast by _np already).
        for scale_key in (f"model.layers.{i}.{name}.weight_scale_inv",
                          f"model.layers.{i}.{name}.weight_scale"):
            if has(scale_key):
                s = get(scale_key)
                if s.ndim == 2 and s.shape != w.shape:       # block scales
                    br = -(-w.shape[0] // s.shape[0])
                    bc = -(-w.shape[1] // s.shape[1])
                    s = np.repeat(np.repeat(s, br, 0), bc, 1)[
                        : w.shape[0], : w.shape[1]
                    ]
                w = w * s
                break
        return w.T  # (in, out)

    pfx = "model.layers.0.self_attn."
    fused_qkv = has(pfx + "qkv_proj.weight")
    fused_gu = has("model.layers.0.mlp.gate_up_proj.weight")

    def q_of(i):
        if fused_qkv:
            w = get(f"model.layers.{i}.self_attn.qkv_proj.weight").T
            return w[:, : Hq * D]
        return linear(i, "self_attn.q_proj")

    def k_of(i):
        if fused_qkv:
            w = get(f"model.layers.{i}.self_attn.qkv_proj.weight").T
            return w[:, Hq * D : (Hq + Hkv) * D]
        return linear(i, "self_attn.k_proj")

    def v_of(i):
        if fused_qkv:
            w = get(f"model.layers.{i}.self_attn.qkv_proj.weight").T
            return w[:, (Hq + Hkv) * D :]
        return linear(i, "self_attn.v_proj")

    def gate_of(i):
        if fused_gu:
            w = get(f"model.layers.{i}.mlp.gate_up_proj.weight").T
            return w[:, : cfg.intermediate_size]
        return linear(i, "mlp.gate_proj")

    def up_of(i):
        if fused_gu:
            w = get(f"model.layers.{i}.mlp.gate_up_proj.weight").T
            return w[:, cfg.intermediate_size :]
        return linear(i, "mlp.up_proj")

    layers = {
        "wq": stack(q_of),
        "wk": stack(k_of),
        "wv": stack(v_of),
        "wo": stack(lambda i: linear(i, "self_attn.o_proj")),
        "wg": stack(gate_of),
        "wu": stack(up_of),
        "wd": stack(lambda i: linear(i, "mlp.down_proj")),
        "ln1": stack(lambda i: get(f"model.layers.{i}.input_layernorm.weight")),
        "ln2": stack(
            lambda i: get(f"model.layers.{i}.post_attention_layernorm.weight")
            if has(f"model.layers.{i}.post_attention_layernorm.weight")
            else get(f"model.layers.{i}.pre_feedforward_layernorm.weight")
        ),
    }
    if cfg.post_norms:
        layers["ln1_post"] = stack(
            lambda i: get(f"model.layers.{i}.post_attention_layernorm.weight")
        )
        layers["ln2_post"] = stack(
            lambda i: get(f"model.layers.{i}.post_feedforward_layernorm.weight")
        )
        layers["ln2"] = stack(
            lambda i: get(f"model.layers.{i}.pre_feedforward_layernorm.weight")
        )
    if cfg.attention_bias and has(pfx + "q_proj.bias"):
        layers["bq"] = stack(lambda i: get(f"model.layers.{i}.self_attn.q_proj.bias"))
        layers["bk"] = stack(lambda i: get(f"model.layers.{i}.self_attn.k_proj.bias"))
        layers["bv"] = stack(lambda i: get(f"model.layers.{i}.self_attn.v_proj.bias"))
    if cfg.qk_norm:
        layers["q_norm"] = stack(
            lambda i: get(f"model.layers.{i}.self_attn.q_norm.weight")
        )
        layers["k_norm"] = stack(
            lambda i: get(f"model.layers.{i}.self_attn.k_norm.weight")
        )

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "ln_f": jnp.asarray(get("model.norm.weight"), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings and has("lm_head.weight"):
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def from_torch_model(model, dtype=jnp.float32) -> tuple[dict, ModelConfig]:
    """Convert a live ``transformers`` CausalLM (used by the parity tests)."""
    cfg = ModelConfig.from_hf_config(model.config)
    params = convert_state_dict(dict(model.state_dict()), cfg, dtype)
    return params, cfg


def from_torch_multimodal(model, dtype=jnp.float32):
    """``Gemma3ForConditionalGeneration`` → (params, cfg, embed_images).

    Mirrors the reference's multimodal entry (base_press.py:191-202: the
    press hooks ``model.model.language_model.layers`` only, with sliding
    layers skipped — which our sliding_flag handling already does). The
    vision tower + projector are converted to JAX (models/siglip.py), so
    ``embed_images`` — (B, C, I, I) pixels → (B, mm_tokens_per_image, E)
    features for ``multimodal_embeds`` — is one jitted XLA program: torch is
    only touched at conversion time, never at inference.
    """
    from .siglip import VisionConfig, convert_vision_tower, encode_images

    cfg = ModelConfig.from_hf_config(model.config.text_config)
    full_sd = dict(model.state_dict())
    sd = {}
    for k, v in full_sd.items():
        if k.startswith("model.language_model."):
            sd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            sd[k] = v
    params = convert_state_dict(sd, cfg, dtype)
    vcfg = VisionConfig.from_hf_config(model.config)
    vparams = convert_vision_tower(full_sd, vcfg, dtype)

    def embed_images(pixel_values):
        return encode_images(vparams, pixel_values, vcfg=vcfg)

    embed_images.vparams = vparams
    embed_images.vcfg = vcfg
    return params, cfg, embed_images


def multimodal_embeds(
    params: dict, cfg: ModelConfig, ids, image_features, image_token_id: int
):
    """(B, S) ids + (n_images, P, E) projected vision features → inputs_embeds.

    ids contain ``image_token_id`` placeholders (the HF processor contract:
    each image contributes P consecutive placeholder tokens); feature rows are
    scattered into those positions in order of appearance. Text embeddings are
    pre-scaled by sqrt(E) (Gemma3ScaledWordEmbedding) because the
    inputs_embeds path in Runner.forward — like HF's — skips the scaling."""
    from .llama import embed_tokens

    ids = jnp.asarray(ids)
    x = embed_tokens(params, ids, cfg)
    feats = jnp.asarray(image_features).reshape(-1, x.shape[-1])
    mask = ids == image_token_id
    # order-of-appearance row index for every position (garbage where ~mask)
    row = jnp.cumsum(mask.reshape(-1)).reshape(ids.shape) - 1
    repl = feats[jnp.clip(row, 0, feats.shape[0] - 1)].astype(x.dtype)
    return jnp.where(mask[..., None], repl, x)


def load_pretrained(path_or_repo: str, dtype=jnp.bfloat16) -> tuple[dict, ModelConfig]:
    """Load from a local HF checkpoint directory of safetensors shards."""
    from safetensors import safe_open
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(path_or_repo)
    if hasattr(hf_cfg, "text_config"):
        hf_cfg = hf_cfg.text_config
    cfg = ModelConfig.from_hf_config(hf_cfg)

    if os.path.isdir(path_or_repo):
        directory = path_or_repo
    else:
        from huggingface_hub import snapshot_download
        directory = snapshot_download(path_or_repo, allow_patterns=["*.safetensors*", "*.json"])

    idx = os.path.join(directory, "model.safetensors.index.json")
    shards = {}
    if os.path.exists(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    else:
        files = ["model.safetensors"]
    sd = {}
    for fname in files:
        # torch framework: numpy can't represent bf16; _np() upcasts on read.
        with safe_open(os.path.join(directory, fname), framework="pt") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    return convert_state_dict(sd, cfg, dtype), cfg
