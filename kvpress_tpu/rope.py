"""Rotary position embeddings: default, Llama-3, and YaRN scaling.

The reference delegates RoPE to ``transformers`` rotary modules and re-derives
cos/sin from ``inv_freq`` where it needs re-rotation
(``kvpress/presses/key_rerotation_press.py:50-98``) and mean rotation matrices
(``kvpress/presses/expected_attention_press.py:88-124``). Here RoPE is a
first-class functional module: everything derives from ``inv_freq`` computed
once per config, in float32 (XLA keeps the trig in fp32 islands).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig


def compute_inv_freq(cfg: ModelConfig) -> tuple[np.ndarray, float]:
    """Return (inv_freq [head_dim//2], attention_scaling) as host constants."""
    dim = cfg.head_dim
    base = cfg.rope_theta
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    scaling = cfg.rope_scaling or {}
    rope_type = scaling.get("rope_type", scaling.get("type", "default"))
    attention_scaling = 1.0

    if rope_type in ("default", None):
        pass
    elif rope_type == "linear":
        inv_freq = inv_freq / scaling["factor"]
    elif rope_type == "llama3":
        factor = scaling["factor"]
        low_factor = scaling["low_freq_factor"]
        high_factor = scaling["high_freq_factor"]
        old_len = scaling["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * math.pi / inv_freq
        inv_freq_llama = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        inv_freq = np.where(is_medium, smoothed, inv_freq_llama)
    elif rope_type == "yarn":
        factor = scaling["factor"]
        original_max = scaling.get(
            "original_max_position_embeddings", cfg.max_position_embeddings
        )
        beta_fast = scaling.get("beta_fast", 32)
        beta_slow = scaling.get("beta_slow", 1)
        mscale = scaling.get("mscale", 1.0)

        def find_dim(num_rot):
            return (dim * math.log(original_max / (num_rot * 2 * math.pi))) / (
                2 * math.log(base)
            )

        low = max(math.floor(find_dim(beta_fast)), 0)
        high = min(math.ceil(find_dim(beta_slow)), dim // 2 - 1)
        rng = max(high - low, 1e-3)
        ramp = np.clip((np.arange(dim // 2, dtype=np.float64) - low) / rng, 0, 1)
        inv_freq_extrapolation_factor = 1 - ramp
        inv_freq_interpolation = inv_freq / factor
        inv_freq = (
            inv_freq_interpolation * ramp
            + inv_freq * inv_freq_extrapolation_factor
        )
        attention_scaling = scaling.get(
            "attention_factor", 0.1 * mscale * math.log(factor) + 1.0
        )
    else:
        raise ValueError(f"Unsupported rope_type: {rope_type}")
    return inv_freq.astype(np.float32), float(attention_scaling)


def rope_cos_sin(
    inv_freq: jax.Array, positions: jax.Array, attention_scaling: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """cos/sin of shape positions.shape + (head_dim,), float32.

    Uses the HF "rotate-half" layout: frequencies concatenated twice."""
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * attention_scaling, jnp.sin(emb) * attention_scaling


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., S, D); cos/sin: broadcastable (..., S, D). fp32 rotation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(dtype)


def mean_rotation_matrix(
    inv_freq: jax.Array, start: jax.Array, n_future: int
) -> jax.Array:
    """Average RoPE rotation matrix over positions [start, start + n_future).

    TPU-native equivalent of the reference's per-position matrix averaging
    (``expected_attention_press.py:88-124``): since the rotation is block
    diagonal in (cos, sin) pairs, the average matrix is determined by the
    per-frequency mean cos/sin, assembled in rotate-half layout.
    Returns (D, D) float32 such that ``rotated = R @ q``.
    """
    d2 = inv_freq.shape[0]
    dim = 2 * d2
    pos = start + jnp.arange(n_future, dtype=jnp.float32)
    freqs = pos[:, None] * inv_freq[None, :]          # (n, d2)
    mcos = jnp.mean(jnp.cos(freqs), axis=0)           # (d2,)
    msin = jnp.mean(jnp.sin(freqs), axis=0)
    cos_diag = jnp.diag(jnp.concatenate([mcos, mcos]))
    # rotate_half pairing: out[i] += -sin[i] * x[i+d2]; out[i+d2] += sin[i] * x[i]
    sin_upper = jnp.diag(msin)
    zeros = jnp.zeros((d2, d2), jnp.float32)
    sin_block = jnp.block([[zeros, -sin_upper], [sin_upper, zeros]])
    return cos_diag + sin_block


@partial(jax.jit, static_argnames=("attention_scaling",))
def rerotate_cos_sin(
    inv_freq: jax.Array,
    old_positions: jax.Array,
    new_positions: jax.Array,
    attention_scaling: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin of the delta rotation taking keys at old_positions to
    new_positions (reference ``key_rerotation_press.py:50-98``), fp32."""
    delta = new_positions.astype(jnp.float32) - old_positions.astype(jnp.float32)
    return rope_cos_sin(inv_freq, delta, attention_scaling)
