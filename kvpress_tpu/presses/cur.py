"""CURPress: CUR-decomposition leverage proxy (reference cur_press.py:34-67)."""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class CURPress(ScorerPress):
    num_sinks: int = 4
    leverage_type: Literal["key", "value", "kv_avg", "kv_product"] = "kv_product"
    use_random_leverage: bool = False
    local_window_size: int = 16
    use_local_approximation: bool = True
    seed: int = 0

    def _local_normalize(self, e: jax.Array, S: int) -> jax.Array:
        B, H, _ = e.shape
        w = self.local_window_size
        pad = (w - S % w) % w
        ep = jnp.pad(e, ((0, 0), (0, 0), (0, pad))).reshape(B, H, -1, w)
        ep = ep / jnp.maximum(ep.sum(axis=-1, keepdims=True), 1e-30)
        return ep.reshape(B, H, -1)[:, :, :S]

    def score(self, ctx: LayerCtx, keys, values, valid=None):
        B, H, S, D = keys.shape
        k = keys.astype(jnp.float32)
        v = values.astype(jnp.float32)
        if self.use_random_leverage:
            r = 20
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), ctx.layer_idx)
            G = jax.random.normal(key, (D, r), jnp.float32) / jnp.sqrt(r * 1.0)
            k = k @ G
            v = v @ G
        k2 = jnp.sum(k * k, axis=-1)
        v2 = jnp.sum(v * v, axis=-1)
        if valid is not None:
            # Bucketed prefill: pad tokens contribute nothing to block or
            # global normalization.
            k2 = jnp.where(valid[None, None], k2, 0.0)
            v2 = jnp.where(valid[None, None], v2, 0.0)
        if self.use_local_approximation:
            k2 = self._local_normalize(k2, S)
            v2 = self._local_normalize(v2, S)
        if self.leverage_type == "key":
            scores = k2
        elif self.leverage_type == "value":
            scores = v2
        elif self.leverage_type == "kv_avg":
            scores = (k2 + v2) / 2
        elif self.leverage_type == "kv_product":
            scores = k2 * v2
        else:
            raise ValueError(f"Unknown leverage type: {self.leverage_type}")
        scores = scores / jnp.maximum(scores.sum(axis=-1, keepdims=True), 1e-30)
        sink = jnp.arange(S)[None, None] < self.num_sinks
        return jnp.where(sink, 1.0, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        S = keys.shape[2]
        valid = jnp.arange(S) < length
        return self.score(ctx, keys, values, valid=valid)
