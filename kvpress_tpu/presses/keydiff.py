"""KeyDiffPress: -cos_sim(k, mean normalized key) (reference keydiff_press.py:36-46)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@dataclasses.dataclass(frozen=True)
class KeyDiffPress(ScorerPress):
    supports_padding = False  # anchor = mean over (padded) keys
    def score(self, ctx: LayerCtx, keys, values):
        k = keys.astype(jnp.float32)
        anchor = _l2_normalize(k).mean(axis=2, keepdims=True)
        cos = jnp.sum(_l2_normalize(k) * _l2_normalize(anchor), axis=-1)
        return -cos
