"""MergingPress: merge-on-evict wrapper (reference merging_press.py:64-177).
Each evicted token's value folds into its most cosine-similar surviving key's
value, similarity- and value-norm-weighted, fp32 scatter-add accumulation;
keys untouched (RoPE-safe)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import BasePress, ScorerPress
from .keydiff import _l2_normalize
from .wrappers import WrappedScorerMixin

_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class MergingPress(WrappedScorerMixin, BasePress):
    press: ScorerPress = None
    similarity_threshold: float = 0.0
    merge_fraction: float = 1.0

    # NOT a score-then-keep press: evicted values are MERGED into kept ones.
    # The mixin's scorer_like opt-in (chunked prefill via BudgetDecodingPress,
    # bucketed budgets) would silently drop the merge semantics — keep
    # MergingPress out of those paths.
    scorer_like = False
    supports_padding = False

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)
        assert 0.0 <= self.similarity_threshold <= 1.0
        assert 0.0 < self.merge_fraction <= 1.0

    def merge(self, keys, values, indices):
        """indices: (B, H, n_kept) kept positions. Returns values with merged
        content written back at kept positions (keys unchanged)."""
        B, H, S, D = keys.shape
        n_kept = indices.shape[2]
        n_evict = S - n_kept
        if n_evict == 0 or n_kept == 0:
            return keys, values

        evict_keep = jnp.ones((B, H, S), bool)
        evict_keep = jnp.put_along_axis(evict_keep, indices, False, axis=-1, inplace=False)
        # Complement indices in ascending order (nonzero order in reference).
        order = jnp.argsort(jnp.where(evict_keep, 0, 1), axis=-1, stable=True)
        evict_idx = order[..., :n_evict]

        kept_k = jnp.take_along_axis(keys, indices[..., None], axis=2).astype(jnp.float32)
        evict_k = jnp.take_along_axis(keys, evict_idx[..., None], axis=2).astype(jnp.float32)
        kept_v = jnp.take_along_axis(values, indices[..., None], axis=2)
        evict_v = jnp.take_along_axis(values, evict_idx[..., None], axis=2)

        sim = jnp.einsum(
            "bhed,bhkd->bhek", _l2_normalize(evict_k, eps=_EPS), _l2_normalize(kept_k, eps=_EPS)
        )
        max_sim = jnp.max(sim, axis=-1)
        target = jnp.argmax(sim, axis=-1)                  # (B, H, n_evict)

        merge_ok = max_sim >= self.similarity_threshold
        if self.merge_fraction < 1.0:
            filled = jnp.where(merge_ok, max_sim, -jnp.inf)
            threshold = jnp.quantile(
                filled, 1.0 - self.merge_fraction, axis=-1, keepdims=True
            )
            merge_ok = merge_ok & (max_sim >= threshold)

        weights = jnp.maximum(max_sim, 0.0) * merge_ok.astype(jnp.float32)
        kept_v32 = kept_v.astype(jnp.float32)
        target_norm = jnp.take_along_axis(
            jnp.linalg.norm(kept_v32, axis=-1), target, axis=-1
        )
        evict_norm = jnp.linalg.norm(evict_v.astype(jnp.float32), axis=-1)
        weights = weights * evict_norm / (evict_norm + target_norm + _EPS)

        contrib = weights[..., None] * evict_v.astype(jnp.float32)
        value_accum = jnp.zeros((B, H, n_kept, D), jnp.float32)
        bidx = jnp.arange(B)[:, None, None]
        hidx = jnp.arange(H)[None, :, None]
        value_accum = value_accum.at[bidx, hidx, target].add(contrib)
        weight_accum = jnp.zeros((B, H, n_kept), jnp.float32)
        weight_accum = weight_accum.at[bidx, hidx, target].add(weights)

        merged = (kept_v32 + value_accum) / (1.0 + weight_accum)[..., None]
        kept_v_new = jnp.where(
            (weight_accum > 0)[..., None], merged.astype(values.dtype), kept_v
        )
        values = values.at[bidx, hidx, indices].set(kept_v_new)
        return keys, values

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        B, H, S, _ = keys.shape
        n_kept = self.n_kept(S)
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        _, indices = jax.lax.top_k(scores, n_kept)
        keys, values = self.merge(keys, values, indices)
        kept_k = jnp.take_along_axis(keys, indices[..., None], axis=2)
        kept_v = jnp.take_along_axis(values, indices[..., None], axis=2)
        keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
        return (
            keys, values, jnp.asarray(n_kept, jnp.int32),
            jnp.ones((B, H, S), bool), state,
        )
