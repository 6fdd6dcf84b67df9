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
