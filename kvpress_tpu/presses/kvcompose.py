"""KVComposePress (reference kvcompose_press.py, arXiv:2509.05165):
attention-guided composite-token eviction. The context is re-fed once against
its own cache (eager attention), per-head scores are aggregated from that
pass's attention onto the original context columns, and per-layer composite
budgets are allocated by global top-k over descending-sorted score curves.
Structured mode physically rebuilds each layer to its composite budget;
unstructured mode masks per-head (reference :315-357). ~2x context KV during
the scoring pass, as in the reference (:377-379).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import BasePress, LayerCtx


@dataclasses.dataclass(frozen=True)
class KVComposeCollector(BasePress):
    """Scoring-pass collector: aggregates this pass's attention onto the first
    ``context_len`` cache columns (reference forward_hook + compute_scores)."""

    context_len: int = 0
    agg_task: str = "max"
    agg_group: str = "mean"

    needs_attn_probs = True
    compresses_prefill = False
    compresses_decode = True

    def init_state(self, cfg, batch, seq_len, dtype=None):
        return {
            "scores": jnp.zeros(
                (cfg.num_layers, batch, cfg.num_kv_heads, self.context_len),
                jnp.float32,
            )
        }

    def decode_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        B, Hkv, S, _ = keys.shape
        Hq = ctx.attn_probs.shape[1]
        G = Hq // Hkv
        attn = ctx.attn_probs[..., : self.context_len].astype(jnp.float32)
        # per-attention-head aggregation over this pass's queries
        task = attn.max(axis=2) if self.agg_task == "max" else attn.mean(axis=2)
        grouped = task.reshape(B, Hkv, G, self.context_len)
        scores = grouped.max(axis=2) if self.agg_group == "max" else grouped.mean(axis=2)
        return keys, values, length, mask, {"scores": scores}


@dataclasses.dataclass(frozen=True)
class KVComposePress(BasePress):
    structured: bool = True
    compression_ratio: float = 0.0
    agg_task: str = "max"
    agg_group: str = "mean"
    agg_head: str = "mean"
    add_v_norm: bool = False
    add_mean_across_heads: bool = True
    keep_token_lower_bound: int = 0

    multi_pass = "kvcompose"
    compresses_prefill = False

    def __post_init__(self):
        assert 0 <= self.compression_ratio < 1

    def budgets_and_masks(self, scores: np.ndarray, values: Optional[np.ndarray]):
        """scores (L, H, S) → (important_per_layer (L,), keep_mask (L, H, S)).

        Mirrors enhance_scores / compute_composite_scores /
        compute_important_per_layer / prepare_important_masks."""
        L, H, S = scores.shape
        scores = scores.copy()
        if self.add_v_norm and values is not None:
            scores *= np.linalg.norm(values, axis=-1)         # (L, H, S)
        if self.add_mean_across_heads:
            scores += scores.mean(axis=1, keepdims=True)

        desc = -np.sort(-scores, axis=-1)                     # (L, H, S) descending
        per_head = desc.copy()
        per_head[..., : self.keep_token_lower_bound] += 1e9

        if self.agg_head == "max":
            per_layer = desc.max(axis=1)
        else:
            per_layer = desc.mean(axis=1)                     # (L, S)
        per_layer[..., : self.keep_token_lower_bound] += 1e9
        per_layer[0] = per_layer.max(axis=0)                  # first layer largest

        n_kept = int(per_head.size * (1 - self.compression_ratio))
        kept = np.argsort(-per_head.reshape(-1), kind="stable")[:n_kept] // S
        important_per_head = np.bincount(kept, minlength=L * H).reshape(L, H)

        n_kept = int(per_layer.size * (1 - self.compression_ratio))
        kept = np.argsort(-per_layer.reshape(-1), kind="stable")[:n_kept] // S
        important_per_layer = np.bincount(kept, minlength=L)

        keep = np.zeros((L, H, S), dtype=bool)
        for layer in range(L):
            for h in range(H):
                count = (
                    important_per_layer[layer]
                    if self.structured else important_per_head[layer, h]
                )
                idx = np.argsort(-scores[layer, h], kind="stable")[:count]
                keep[layer, h, idx] = True
        return important_per_layer, keep
