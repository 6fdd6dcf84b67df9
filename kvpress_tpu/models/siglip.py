"""JAX SigLIP vision tower + Gemma3 multimodal projector.

Closes the last torch dependency on an inference path: the reference
compresses ``Gemma3ForConditionalGeneration`` wholly in-framework
(reference kvpress/presses/base_press.py:197-202 hooks
``model.model.language_model.layers``; the vision tower runs inside the
same HF forward). Here the tower is a jittable JAX function so multimodal
prefill is one XLA program — shardable, bf16 on the MXU, no host round
trip per image.

Architecture (HF ``SiglipVisionModel`` semantics, modeling_siglip.py):
  patchify (non-overlapping conv == reshape + one matmul) + learned
  position embeddings → pre-LN transformer (LayerNorm with bias, MHA with
  q/k/v/out biases, gelu-tanh MLP) → post LayerNorm.
Gemma3 projector (modeling_gemma3.py ``Gemma3MultiModalProjector``):
  avg-pool the g×g patch grid to √mm_tokens per side, Gemma-style RMSNorm
  (fp32, ``x * (1 + w)``), then a single (H_vision, E_text) projection.

TPU notes: the patch conv has stride == kernel, so it is exactly a
(B, N, C·P²) @ (C·P², H) matmul — no conv lowering, one MXU op. The
encoder runs as a ``lax.scan`` over stacked layer params (one compiled
layer body, L iterations).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """Static SigLIP + projector geometry (hashable: jit-static)."""

    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    mm_tokens_per_image: int = 256

    @classmethod
    def from_hf_config(cls, hf_cfg) -> "VisionConfig":
        """From a full ``Gemma3Config`` (vision_config + mm_tokens_per_image)."""
        vc = hf_cfg.vision_config
        return cls(
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_layers=vc.num_hidden_layers,
            num_heads=vc.num_attention_heads,
            image_size=vc.image_size,
            patch_size=vc.patch_size,
            num_channels=vc.num_channels,
            layer_norm_eps=vc.layer_norm_eps,
            mm_tokens_per_image=hf_cfg.mm_tokens_per_image,
        )

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def convert_vision_tower(
    sd: Mapping[str, np.ndarray], vcfg: VisionConfig, dtype=jnp.float32
) -> dict:
    """HF ``Gemma3ForConditionalGeneration`` state dict → stacked JAX params.

    Expects the ``model.vision_tower.vision_model.*`` and
    ``model.multi_modal_projector.*`` keys. Encoder layers are stacked on a
    leading L axis for ``lax.scan``. Linear weights are transposed to
    (in, out)."""
    from .convert import _np

    pfx = "model.vision_tower.vision_model."
    get = lambda name: _np(sd[pfx + name])

    def stack(fmt: str, transpose: bool = False):
        ws = [_np(sd[pfx + fmt.format(i=i)]) for i in range(vcfg.num_layers)]
        a = np.stack([w.T if transpose else w for w in ws])
        return jnp.asarray(a, dtype)

    conv_w = get("embeddings.patch_embedding.weight")       # (H, C, P, P)
    layers = {
        "ln1_w": stack("encoder.layers.{i}.layer_norm1.weight"),
        "ln1_b": stack("encoder.layers.{i}.layer_norm1.bias"),
        "wq": stack("encoder.layers.{i}.self_attn.q_proj.weight", True),
        "bq": stack("encoder.layers.{i}.self_attn.q_proj.bias"),
        "wk": stack("encoder.layers.{i}.self_attn.k_proj.weight", True),
        "bk": stack("encoder.layers.{i}.self_attn.k_proj.bias"),
        "wv": stack("encoder.layers.{i}.self_attn.v_proj.weight", True),
        "bv": stack("encoder.layers.{i}.self_attn.v_proj.bias"),
        "wo": stack("encoder.layers.{i}.self_attn.out_proj.weight", True),
        "bo": stack("encoder.layers.{i}.self_attn.out_proj.bias"),
        "ln2_w": stack("encoder.layers.{i}.layer_norm2.weight"),
        "ln2_b": stack("encoder.layers.{i}.layer_norm2.bias"),
        "w1": stack("encoder.layers.{i}.mlp.fc1.weight", True),
        "b1": stack("encoder.layers.{i}.mlp.fc1.bias"),
        "w2": stack("encoder.layers.{i}.mlp.fc2.weight", True),
        "b2": stack("encoder.layers.{i}.mlp.fc2.bias"),
    }
    return {
        "patch_w": jnp.asarray(
            conv_w.reshape(conv_w.shape[0], -1).T, dtype),   # (C·P², H)
        "patch_b": jnp.asarray(get("embeddings.patch_embedding.bias"), dtype),
        "pos": jnp.asarray(get("embeddings.position_embedding.weight"), dtype),
        "layers": layers,
        "post_ln_w": jnp.asarray(get("post_layernorm.weight"), dtype),
        "post_ln_b": jnp.asarray(get("post_layernorm.bias"), dtype),
        "mm_norm": jnp.asarray(
            _np(sd["model.multi_modal_projector.mm_soft_emb_norm.weight"]),
            dtype),
        "mm_proj": jnp.asarray(
            _np(sd["model.multi_modal_projector.mm_input_projection_weight"]),
            dtype),                                          # (H, E_text)
    }


def _layer_norm(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


@partial(jax.jit, static_argnames=("vcfg",))
def encode_images(vparams: dict, pixel_values, *, vcfg: VisionConfig):
    """(B, C, I, I) pixels → (B, mm_tokens_per_image, E_text) features.

    Jittable end to end; numerically matches HF ``get_image_features``
    (parity-tested in tests/test_model_parity.py). Feed the result to
    ``models.convert.multimodal_embeds`` to scatter into the text embedding.
    """
    x = jnp.asarray(pixel_values)
    B = x.shape[0]
    P, g, H = vcfg.patch_size, vcfg.grid, vcfg.hidden_size
    nh = vcfg.num_heads
    d = H // nh

    # Non-overlapping patch conv == patch extraction + one matmul. The conv
    # weight was flattened over (C, kh, kw); match that order here.
    x = x.reshape(B, vcfg.num_channels, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, -1)
    x = x.astype(vparams["patch_w"].dtype)
    x = x @ vparams["patch_w"] + vparams["patch_b"]
    x = x + vparams["pos"]

    def layer(x, p):
        h = _layer_norm(x, p["ln1_w"], p["ln1_b"], vcfg.layer_norm_eps)
        q = (h @ p["wq"] + p["bq"]).reshape(B, -1, nh, d).transpose(0, 2, 1, 3)
        k = (h @ p["wk"] + p["bk"]).reshape(B, -1, nh, d).transpose(0, 2, 1, 3)
        v = (h @ p["wv"] + p["bv"]).reshape(B, -1, nh, d).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, -1, H)
        x = x + (o @ p["wo"] + p["bo"])
        h = _layer_norm(x, p["ln2_w"], p["ln2_b"], vcfg.layer_norm_eps)
        h = jax.nn.gelu(h @ p["w1"] + p["b1"], approximate=True)
        return x + (h @ p["w2"] + p["b2"]), None

    x, _ = jax.lax.scan(layer, x, vparams["layers"])
    x = _layer_norm(x, vparams["post_ln_w"], vparams["post_ln_b"],
                    vcfg.layer_norm_eps)

    # Gemma3 projector: pool the g×g grid to t×t tokens, Gemma RMSNorm
    # (fp32, x·(1+w), eps = the VISION layer_norm_eps per HF), project.
    t = int(round(vcfg.mm_tokens_per_image ** 0.5))
    k = g // t
    x = x.reshape(B, t, k, t, k, H).mean(axis=(2, 4))
    xf = x.reshape(B, t * t, H).astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + vcfg.layer_norm_eps)
    xf = xf * (1.0 + vparams["mm_norm"].astype(jnp.float32))
    out = xf.astype(x.dtype) @ vparams["mm_proj"]
    return out.astype(x.dtype)
