"""LagKVPress: attention-free lag-relative scoring (reference lagkv_press.py:45-97).

Sequence is partitioned into ``lag_size`` blocks; block *i* tokens are scored
by the min-max-normalized std of K and V against block *i+1* as reference.
All shape arithmetic is static (context length is trace-static), so the
reference's data-dependent reshapes become compile-time Python."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class LagKVPress(ScorerPress):
    n_sink: int = 4
    lag_size: int = 128
    cross_scoring: bool = False

    def _block_scores(self, x: jax.Array) -> jax.Array:
        """x: (B, H, nblocks, lag, D) → (B, H, nblocks-1, lag) scores."""
        ref = x[:, :, 1:]
        v = x[:, :, :-1]
        min_r = ref.min(axis=-2, keepdims=True)
        max_r = ref.max(axis=-2, keepdims=True)
        normed = (v - min_r) / (max_r - min_r)
        std = jnp.std(normed, axis=-1, ddof=1)
        return jax.nn.softmax(std, axis=-1)

    def _block_part(self, keys, values):
        """Static block partition over the (padded) buffer → per-position
        scores for [n_sink, end - lag); callers overlay sink/tail ones."""
        B, H, S, D = keys.shape
        end = self.n_sink + ((S - self.n_sink) // self.lag_size) * self.lag_size
        nb = (end - self.n_sink) // self.lag_size

        def blocks(x):
            return x[:, :, self.n_sink : end].astype(jnp.float32).reshape(
                B, H, nb, self.lag_size, D
            )

        score = (self._block_scores(blocks(keys)) + self._block_scores(blocks(values))) / 2
        if not self.cross_scoring:
            rank = jnp.argsort(jnp.argsort(score, axis=-1), axis=-1)
            score = rank.astype(jnp.float32) / self.lag_size
        return score.reshape(B, H, -1), end

    def score(self, ctx: LayerCtx, keys, values):
        B, H, S, D = keys.shape
        if S < self.n_sink + 2 * self.lag_size:
            pos = jnp.arange(S, dtype=jnp.float32)
            ramp = (pos - self.n_sink) / max(S - self.n_sink, 1)
            s = jnp.where(pos < self.n_sink, 1.0, ramp)
            return jnp.broadcast_to(s[None, None], (B, H, S))

        score, end = self._block_part(keys, values)
        tail_len = self.lag_size + S - end
        ones_sink = jnp.ones((B, H, self.n_sink), score.dtype)
        ones_tail = jnp.ones((B, H, tail_len), score.dtype)
        return jnp.concatenate([ones_sink, score, ones_tail], axis=-1)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill (block-count bucketing): the block partition is
        computed over the STATIC padded buffer — block *i*'s score only reads
        blocks *i* and *i+1*, so it is exact wherever both are fully real —
        and a traced boundary selects between block scores, the all-ones tail
        (last full block + remainder), and the small-context ramp. Positions
        >= length are masked by the caller (base.layer_compress)."""
        B, H, S, D = keys.shape
        n = jnp.asarray(length, jnp.int32)
        pos = jnp.arange(S, dtype=jnp.int32)

        ramp = (pos.astype(jnp.float32) - self.n_sink) / jnp.maximum(
            n.astype(jnp.float32) - self.n_sink, 1.0
        )
        ramp = jnp.broadcast_to(
            jnp.where(pos < self.n_sink, 1.0, ramp)[None, None], (B, H, S)
        )
        if S < self.n_sink + 2 * self.lag_size:
            return ramp

        score, end = self._block_part(keys, values)
        full = jnp.concatenate(
            [
                jnp.ones((B, H, self.n_sink), score.dtype),
                score,
                jnp.ones((B, H, S - (end - self.lag_size)), score.dtype),
            ],
            axis=-1,
        )
        # Real full blocks: nb_n; the last one is reference-only, so scored
        # positions end at n_sink + (nb_n - 1)·lag; everything after is tail.
        nb_n = (n - self.n_sink) // self.lag_size
        scored_upto = self.n_sink + (nb_n - 1) * self.lag_size
        out = jnp.where(
            ((pos >= self.n_sink) & (pos < scored_upto))[None, None], full, 1.0
        )
        return jnp.where(n < self.n_sink + 2 * self.lag_size, ramp, out)
