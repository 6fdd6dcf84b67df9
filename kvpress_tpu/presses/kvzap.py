"""KVzapPress: learned surrogate scoring (reference kvzap_press.py,
arXiv:2601.07891). A per-layer Linear or 2-layer-GELU-MLP maps hidden states
to per-kv-head importance scores; designed to be wrapped by DMSPress
(threshold eviction) and usable in both prefill and decoding.

Surrogate weights are a stacked pytree (vmap-friendly: one (L, …) array per
tensor) loaded from a local .npz artifact — the reference downloads
``nvidia/KVzap-{mlp,linear}-<model>`` from the hub."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import LayerCtx, ScorerPress, content_hash_eq


def kvzap_apply(surrogate: dict, layer_idx, hidden: jax.Array) -> jax.Array:
    """hidden (B, S, E) → scores (B, H_kv, S) for one layer."""
    h = hidden.astype(jnp.float32)
    if "w1" in surrogate:
        z = h @ surrogate["w1"][layer_idx] + surrogate["b1"][layer_idx]
        z = jax.nn.gelu(z, approximate=False)
        out = z @ surrogate["w2"][layer_idx] + surrogate["b2"][layer_idx]
    else:
        out = h @ surrogate["w"][layer_idx] + surrogate["b"][layer_idx]
    return jnp.swapaxes(out, 1, 2)


def save_kvzap_model(path: str, surrogate: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in surrogate.items()})


def load_kvzap_model(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _kvzap_chunk_scores(arg, layer_idx, hidden, keys, values):
    """Per-token chunk scoring (prefill_chunked collect protocol): the
    surrogate scores each token from its own hidden state — exact per chunk.
    ``arg`` is the surrogate pytree, a jit argument (never a constant)."""
    return kvzap_apply(arg, layer_idx, hidden)


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class KVzapPress(ScorerPress):
    surrogate: Optional[dict] = None       # stacked params pytree

    chunk_score_fn = staticmethod(_kvzap_chunk_scores)

    @property
    def chunk_score_arg(self):
        return self.surrogate

    def score(self, ctx: LayerCtx, keys, values):
        assert self.surrogate is not None, (
            "KVzap surrogate not loaded; pass surrogate=load_kvzap_model(path)"
        )
        return kvzap_apply(self.surrogate, ctx.layer_idx, ctx.hidden)
