"""DuoAttentionPress (reference duo_attention_press.py, arXiv:2410.10819):
splits kv heads into retrieval heads (full cache) and streaming heads
(sink + recent only) using per-(layer, head) scores.

Scores come from the DuoAttention artifact files (the reference fetches them
over HTTP, :120-141); pass them as an (L, H_kv) array. Streaming-head masking
maps onto the cache keep-mask."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BasePress, LayerCtx


def load_duo_head_scores(path: str) -> tuple[int, int, np.ndarray]:
    """Load (sink_size, recent_size, head_scores (L, H_kv)) from a local copy
    of a DuoAttention ``full_attention_heads.tsv`` (+config) artifact, or an
    .npz with keys sink_size/recent_size/head_scores."""
    if path.endswith(".npz"):
        d = np.load(path)
        return int(d["sink_size"]), int(d["recent_size"]), d["head_scores"]
    scores = np.loadtxt(path, delimiter="\t")
    return 128, 256, scores


@dataclasses.dataclass(frozen=True)
class DuoAttentionPress(BasePress):
    head_compression_ratio: float = 0.0
    sink_size: int = 128
    recent_size: int = 256
    head_scores: Optional[np.ndarray] = None     # (L, H_kv), lower = prunable

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def streaming_mask(self) -> np.ndarray:
        """(L, H_kv) bool — True marks streaming heads (reference :88-94)."""
        assert self.head_scores is not None, (
            "head scores not loaded; pass head_scores=load_duo_head_scores(path)"
        )
        scores = np.asarray(self.head_scores)
        mask = np.zeros(scores.shape, dtype=bool)
        n_pruned = round(scores.size * self.head_compression_ratio)
        if n_pruned > 0:
            idx = np.argsort(scores, axis=None)[:n_pruned]
            mask[np.unravel_index(idx, scores.shape)] = True
        return mask

    @property
    def compression_ratio(self):
        return 0.0   # measured (cache.masked_fraction), not set

    def layer_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        B, H, S, _ = keys.shape
        if S > self.sink_size + self.recent_size:
            streaming = jnp.asarray(self.streaming_mask())[ctx.layer_idx]  # (H,)
            pos = jnp.arange(S)[None, None]
            middle = (pos >= self.sink_size) & (pos < S - self.recent_size)
            pruned = streaming[None, :, None] & middle
            mask = mask & ~jnp.broadcast_to(pruned, (B, H, S))
        return keys, values, length, mask, state
