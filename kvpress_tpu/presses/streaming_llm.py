"""StreamingLLMPress: keep the first n_sink tokens plus the most recent window
(reference streaming_llm_press.py:47-54). Scores: sink and recent get +1,
the middle pruned region 0 — top-k then keeps exactly sink+recent."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class StreamingLLMPress(ScorerPress):
    n_sink: int = 4

    def score(self, ctx: LayerCtx, keys, values):
        B, H, S, _ = keys.shape
        q_len = S
        n_pruned = q_len - self.n_kept(q_len)
        pos = jnp.arange(S, dtype=jnp.int32)
        keep = (pos < self.n_sink) | (pos >= self.n_sink + n_pruned)
        # Tie-break by recency among kept so ordering is deterministic.
        s = jnp.where(keep, 1.0, 0.0) + pos.astype(jnp.float32) * 1e-9
        return jnp.broadcast_to(s[None, None], (B, H, S))

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Decode-time variant against a traced valid length: sinks pinned,
        then recency order — top-k keeps sink + most recent."""
        B, H, S, _ = keys.shape
        pos = jnp.arange(S, dtype=jnp.float32)
        s = jnp.where(pos < self.n_sink, 2.0 * S, pos)
        return jnp.broadcast_to(s[None, None], (B, H, S))
