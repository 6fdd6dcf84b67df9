"""LUKVPress: per-(layer, head) budgets from a precomputed [99, L, H] curve
(reference lukv_press.py:95-196, arXiv:2602.08585). The reference fetches the
curve over HTTP; here it is a plain array attribute (load from a local .npy
via ``load_budget_curve``), keeping artifact IO out of the jitted path.

Pruning is head-wise via the cache keep-mask (the reference's
masked_key_indices fake eviction)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BasePress, LayerCtx, ScorerPress, content_hash_eq

BIG = jnp.finfo(jnp.float32).max


def load_budget_curve(path: str) -> np.ndarray:
    curve = np.load(path, allow_pickle=False)
    assert curve.ndim == 3 and curve.shape[0] == 99, curve.shape
    return curve


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class LUKVPress(BasePress):
    press: ScorerPress = None
    compression_ratio: float = 0.0
    sink: int = 4
    window: int = 1
    budget_curves: Optional[np.ndarray] = None     # [99, L, H_kv]

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)
        assert 0 <= self.compression_ratio < 1

    def _head_keep_counts(self, layer_idx, S: int, H: int) -> jax.Array:
        """Per-head kept counts via largest-remainder rounding
        (reference :160-182)."""
        target_idx = int(round(self.compression_ratio * 100)) - 1
        target_idx = max(0, min(98, target_idx))
        curves = jnp.asarray(self.budget_curves, jnp.float32)   # (99, L, H)
        prune = curves[target_idx, layer_idx]                    # (H,)
        keep_rates = jnp.clip(1.0 - prune, 0.0, 1.0)
        ideal = keep_rates * S
        total_target = jnp.round(jnp.sum(ideal)).astype(jnp.int32)
        total_target = jnp.clip(total_target, H, H * S)
        base = jnp.floor(ideal).astype(jnp.int32)
        remainder = total_target - jnp.sum(base)
        frac = ideal - base
        # Give +1 to the heads with the largest fractional parts.
        order = jnp.argsort(-frac)
        rank = jnp.argsort(order)
        base = base + (rank < remainder).astype(jnp.int32)
        return jnp.clip(base, 1, S)

    def layer_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        if self.compression_ratio <= 0:
            return keys, values, length, mask, state
        assert self.budget_curves is not None, "LU-KV budget curves are not loaded"
        B, H, S, _ = keys.shape
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        protected = jnp.max(scores) + 1
        pos = jnp.arange(S)[None, None]
        if self.sink > 0:
            scores = jnp.where(pos < min(self.sink, S), protected, scores)
        if self.window > 0:
            scores = jnp.where(pos >= max(0, S - self.window), protected, scores)

        keep_counts = self._head_keep_counts(ctx.layer_idx, S, H)   # (H,)
        order = jnp.argsort(-scores, axis=-1, stable=True)
        rank = jnp.argsort(order, axis=-1)
        keep = rank < keep_counts[None, :, None]
        new_mask = mask & keep
        return keys, values, length, new_mask, state
