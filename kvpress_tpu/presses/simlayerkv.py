"""SimLayerKVPress: per-layer "lazy" detection (reference
simlayerkv_press.py:52-116, arXiv:2410.13846). If the last tokens' attention
mass on sink+recent exceeds ``lazy_threshold``, the layer's cache truncates to
sink+recent; otherwise it is left intact. Per-layer kept lengths differ, which
the stacked cache expresses naturally through per-layer ``length``."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import window_attention_probs
from .base import BasePress, LayerCtx
from .wrappers import compact_by_mask


@dataclasses.dataclass(frozen=True)
class SimLayerKVPress(BasePress):
    lazy_threshold: float = 1.0
    n_last: int = 1
    n_recent: int = 1024
    n_initial: int = 4

    def __post_init__(self):
        assert 0.0 <= self.lazy_threshold <= 1.0

    @property
    def compression_ratio(self):
        return 0.0   # computed observable (per-layer lengths), not a setting

    def is_lazy(self, ctx: LayerCtx, keys) -> jax.Array:
        """() bool — attention of the last n_last queries concentrated on
        sink + recent (reference :60-72)."""
        S = keys.shape[2]
        q_win = ctx.queries[:, :, -self.n_last :]
        prior = jnp.asarray(S - self.n_last, jnp.int32)
        attn = window_attention_probs(q_win, keys, ctx.scale, prior)
        attn = attn.mean(axis=(0, 1, 2))                     # (S,)
        score = attn[: self.n_initial].sum() + attn[-self.n_recent :].sum()
        return score > self.lazy_threshold

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        B, H, S, _ = keys.shape
        min_length = self.n_initial + self.n_recent + self.n_last
        if self.lazy_threshold == 1.0 or S <= min_length:
            return keys, values, length, mask, state
        lazy = self.is_lazy(ctx, keys)
        pos = jnp.arange(S)[None, None]
        keep_region = (pos < self.n_initial) | (pos >= S - (self.n_recent - self.n_last))
        keep = jnp.broadcast_to(
            jnp.where(lazy, keep_region, True), (B, H, S)
        )
        k2, v2, n = compact_by_mask(keys, values, keep)
        return k2, v2, n, jnp.ones((B, H, S), bool), state

    # -- chunked-prefill composition (models/llama._compress_layer) ------- #
    # Lazy detection from the trailing scoring window's last n_last queries
    # against the VALID buffer prefix (traced length); the static-S guard
    # becomes a traced predicate. Exact vs one-shot when n_last fits the
    # scoring window (it is 1 by default).

    def _chunked_keep(self, ctx, keys, length):
        H, S = keys.shape[1], keys.shape[2]
        q_win = ctx.queries[:, :, -self.n_last:]
        prior = (length - self.n_last).astype(jnp.int32)
        attn = window_attention_probs(q_win, keys, ctx.scale, prior)
        # zero out invalid slots (their probs are already ~0 via the causal
        # bias versus prior, but padded slots beyond length must not count)
        pos1 = jnp.arange(S)
        attn = jnp.where((pos1 < length)[None, None, None], attn, 0.0)
        attn = attn.mean(axis=(0, 1, 2))                     # (S,)
        recent = pos1 >= length - self.n_recent
        score = attn[: self.n_initial].sum() + jnp.where(recent, attn, 0.0).sum()
        min_length = self.n_initial + self.n_recent + self.n_last
        lazy = (score > self.lazy_threshold) & (length > min_length)
        pos = pos1[None, None]
        keep_region = (pos < self.n_initial) | (
            pos >= length - (self.n_recent - self.n_last)
        )
        keep = jnp.where(lazy, keep_region, True) & (pos < length)
        return jnp.broadcast_to(keep, (keys.shape[0], H, S))

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.lazy_threshold == 1.0:
            return keys, values, length, mask
        keep = self._chunked_keep(ctx, keys, length)
        k2, v2, n = compact_by_mask(keys, values, keep)
        return k2, v2, n, jnp.ones_like(mask)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv
        from .wrappers import _compact_order, _gather_seq

        if self.lazy_threshold == 1.0:
            return keys, values, key_scales, value_scales, length, mask
        kd = dequantize_kv(keys, key_scales, bits, ctx.hidden.dtype)
        keep = self._chunked_keep(ctx, kd, length)
        order = _compact_order(keep)
        keys, values, key_scales, value_scales = _gather_seq(
            (keys, values, key_scales, value_scales), order
        )
        n = jnp.min(jnp.sum(keep, axis=-1)).astype(jnp.int32)
        return keys, values, key_scales, value_scales, n, jnp.ones_like(mask)
