"""KeyDiffPress: -cos_sim(k, mean normalized key) (reference keydiff_press.py:36-46)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@dataclasses.dataclass(frozen=True)
class KeyDiffPress(ScorerPress):
    def score(self, ctx: LayerCtx, keys, values):
        k = keys.astype(jnp.float32)
        anchor = _l2_normalize(k).mean(axis=2, keepdims=True)
        cos = jnp.sum(_l2_normalize(k) * _l2_normalize(anchor), axis=-1)
        return -cos

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill: the anchor is the mean over VALID keys only."""
        k = keys.astype(jnp.float32)
        S = k.shape[2]
        w = (jnp.arange(S) < length).astype(jnp.float32)[None, None, :, None]
        kn = _l2_normalize(k)
        anchor = (kn * w).sum(axis=2, keepdims=True) / jnp.maximum(w.sum(), 1.0)
        cos = jnp.sum(kn * _l2_normalize(anchor), axis=-1)
        return -cos
