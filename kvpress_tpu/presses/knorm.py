"""KnormPress: score = -||k||_2 (reference kvpress/presses/knorm_press.py:38)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class KnormPress(ScorerPress):
    def score(self, ctx: LayerCtx, keys, values):
        return -jnp.linalg.norm(keys.astype(jnp.float32), axis=-1)
