"""KnormPress: score = -||k||_2 (reference kvpress/presses/knorm_press.py:38)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


def _knorm_chunk_scores(arg, layer_idx, hidden, keys, values):
    """Per-token chunk scoring (prefill_chunked collect protocol): the key
    norm depends only on the token's own key — exact per chunk."""
    return -jnp.linalg.norm(keys.astype(jnp.float32), axis=-1)


@dataclasses.dataclass(frozen=True)
class KnormPress(ScorerPress):
    chunk_score_fn = staticmethod(_knorm_chunk_scores)

    def score(self, ctx: LayerCtx, keys, values):
        return -jnp.linalg.norm(keys.astype(jnp.float32), axis=-1)
