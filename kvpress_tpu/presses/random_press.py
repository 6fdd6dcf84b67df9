"""RandomPress: uniform random scores (reference random_press.py:42-46).

JAX is functionally random: the seed is a press attribute (static), folded with
the layer index so each layer draws independent scores, reproducibly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class RandomPress(ScorerPress):
    seed: int = 0

    def score(self, ctx: LayerCtx, keys, values):
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), ctx.layer_idx)
        return jax.random.uniform(key, keys.shape[:-1], jnp.float32)
