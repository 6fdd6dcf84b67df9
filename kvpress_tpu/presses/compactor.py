"""Compactor family: NonCausalAttnPress, LeverageScorePress, CompactorPress
(reference non_causal_attention_press.py, leverage_press.py,
compactor_press.py; arXiv:2507.08143). Prefill-only.

Bucketed prefill (traced valid length): the chunked non-causal attention is
block-diagonal, so fully-real chunks are untouched by pad slots and only the
boundary chunk needs the (traced) row/col invalidation the reference applies
to its last chunk; leverage sketches zero pad rows before the Gram matrix;
z-normalization uses masked moments. dynamic_score results are exact vs the
exact-length compile for all valid positions (test_bucketing.py)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import LayerCtx, ScorerPress
from .snapkv import avg_pool_1d


def _z_norm(scores: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """Scalar z-norm over the whole array; with ``valid`` (S,) bool, moments
    are computed over valid positions only (ddof=1, like jnp.std)."""
    if valid is None:
        std = jnp.maximum(jnp.std(scores, ddof=1), 1e-6)
        return (scores - jnp.mean(scores)) / std
    B, H, S = scores.shape
    w = valid.astype(scores.dtype)[None, None, :]
    cnt = B * H * jnp.sum(valid.astype(jnp.float32))
    mean = jnp.sum(scores * w) / cnt
    var = jnp.sum(jnp.where(w > 0, (scores - mean) ** 2, 0.0)) / (cnt - 1.0)
    std = jnp.maximum(jnp.sqrt(var), 1e-6)
    return (scores - mean) / std


@dataclasses.dataclass(frozen=True)
class NonCausalAttnPress(ScorerPress):
    """Non-causal chunked attention column-sums × ||v||, pooled, z-normed
    (reference :46-122)."""

    chunk_size: int = 256

    @staticmethod
    def non_causal_chunked_attn(
        q: jax.Array, k: jax.Array, chunk_size: int,
        valid: Optional[jax.Array] = None,
    ):
        """q/k: (B, H, S, d) → (B, H, S) column sums of chunked softmax(qk^T).
        Unscaled logits, per the reference (:89). ``valid`` (S,) bool marks
        real positions (bucketed prefill); None = all but the internal
        chunk-alignment pad are real."""
        B, H, S, d = k.shape
        S_pad = -(-S // chunk_size) * chunk_size
        pad = S_pad - S
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        nc = S_pad // chunk_size
        qc = qp.reshape(B, H, nc, chunk_size, d)
        kc = kp.reshape(B, H, nc, chunk_size, d)
        dots = jnp.einsum("bhcqd,bhckd->bhcqk", qc, kc)
        # Invalid positions: zero invalid query rows, then -1e-9 invalid key
        # columns (mirrors reference masked_fill order, :92-93). Chunks whose
        # slots are all valid are untouched — the chunking is block-diagonal.
        if valid is None:
            invalid = jnp.arange(S_pad) >= S
        else:
            invalid = ~jnp.pad(valid, (0, pad), constant_values=False)
        inv_c = invalid.reshape(nc, chunk_size)
        dots = jnp.where(inv_c[None, None, :, :, None], 0.0, dots)
        dots = jnp.where(inv_c[None, None, :, None, :], -1e-9, dots)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1)
        return attn.sum(axis=-2).reshape(B, H, S_pad)[..., :S]

    def _score_impl(self, ctx: LayerCtx, keys, values,
                    valid: Optional[jax.Array] = None):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "NonCausalAttnPress only supports prefill"
        Hq = ctx.queries.shape[1]
        G = Hq // Hkv
        k_rep = jnp.broadcast_to(
            keys[:, :, None], (B, Hkv, G, S, d)
        ).reshape(B, Hq, S, d)
        A = self.non_causal_chunked_attn(
            ctx.queries.astype(jnp.float32), k_rep.astype(jnp.float32),
            self.chunk_size, valid=valid,
        )
        A = A.reshape(B, Hkv, G, S).mean(axis=2)
        scores = A * jnp.linalg.norm(values.astype(jnp.float32), axis=-1)
        if valid is not None:
            # avg_pool_1d divides by the fixed kernel (count_include_pad), so
            # zeroing pad scores reproduces the exact-length edge behaviour.
            scores = jnp.where(valid[None, None], scores, 0.0)
        scores = avg_pool_1d(scores, 3)
        return _z_norm(scores, valid)

    def score(self, ctx: LayerCtx, keys, values):
        return self._score_impl(ctx, keys, values)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        valid = jnp.arange(keys.shape[2]) < jnp.asarray(length, jnp.int32)
        return self._score_impl(ctx, keys, values, valid=valid)


@dataclasses.dataclass(frozen=True)
class LeverageScorePress(ScorerPress):
    """Approximate statistical leverage of pre-RoPE keys via right Gaussian
    sketch + Cholesky solve with adaptive jitter (reference :46-110)."""

    sketch_dimension: int = 48
    seed: int = 0

    @staticmethod
    def compute_leverage_scores(
        key_states: jax.Array, phi: jax.Array,
        valid: Optional[jax.Array] = None,
    ) -> jax.Array:
        """key_states (B,H,S,d), phi (B,H,d,k) → leverage scores (B,H,S).
        With ``valid``, pad rows are excluded from the mean and zeroed after
        the sketch so they contribute nothing to the Gram matrix."""
        if valid is None:
            mu = key_states.mean(axis=-2, keepdims=True)
        else:
            w = valid.astype(key_states.dtype)[None, None, :, None]
            mu = (key_states * w).sum(-2, keepdims=True) / w.sum(-2, keepdims=True)
        X = key_states - mu
        X = jnp.matmul(X, phi).astype(jnp.float32)             # (B,H,S,k)
        if valid is not None:
            X = jnp.where(valid[None, None, :, None], X, 0.0)
        XT = jnp.swapaxes(X, -2, -1)
        G = XT @ X
        G = 0.5 * (G + jnp.swapaxes(G, -2, -1))
        eye = jnp.eye(G.shape[-1], dtype=G.dtype)
        # Adaptive jitter (reference chol_with_jitter): keep escalating while
        # the factorization produced non-finite entries.
        L = jnp.linalg.cholesky(G + 1e-2 * eye)
        for jitter in (1e-1, 1.0):
            bad = ~jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
            L = jnp.where(bad, jnp.linalg.cholesky(G + jitter * eye), L)
        inv_Xt = jax.scipy.linalg.cho_solve((L, True), XT)     # (B,H,k,S)
        scores = jnp.maximum(
            jnp.sum(X * jnp.swapaxes(inv_Xt, -2, -1), axis=-1), 0.0
        )
        return scores

    def _score_impl(self, ctx: LayerCtx, keys, values,
                    valid: Optional[jax.Array] = None):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "LeverageScorePress only supports prefill"
        k_pre = ctx.keys_prerope.astype(jnp.float32)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), ctx.layer_idx)
        phi = jax.random.normal(
            key, (B, Hkv, d, self.sketch_dimension), jnp.float32
        ) / jnp.sqrt(self.sketch_dimension * 1.0)
        scores = self.compute_leverage_scores(k_pre, phi, valid=valid)
        return _z_norm(scores, valid)

    def score(self, ctx: LayerCtx, keys, values):
        return self._score_impl(ctx, keys, values)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        valid = jnp.arange(keys.shape[2]) < jnp.asarray(length, jnp.int32)
        return self._score_impl(ctx, keys, values, valid=valid)


@dataclasses.dataclass(frozen=True)
class CompactorPress(ScorerPress):
    """blend·leverage + non_causal_attn with protected sink start/end
    (reference compactor_press.py:87-122)."""

    sink_size_start: int = 8
    sink_size_end: int = 4
    chunk_size: int = 256
    sketch_dimension: int = 48
    blending: Optional[float] = None
    seed: int = 0

    def _children(self):
        lev = LeverageScorePress(
            compression_ratio=self.compression_ratio,
            sketch_dimension=self.sketch_dimension,
            seed=self.seed,
        )
        nca = NonCausalAttnPress(
            compression_ratio=self.compression_ratio, chunk_size=self.chunk_size
        )
        return lev, nca

    def _sub_ctx(self, ctx: LayerCtx, left: int, end: int) -> LayerCtx:
        return dataclasses.replace(
            ctx,
            hidden=ctx.hidden[:, left:end],
            queries=ctx.queries[:, :, left:end],
            queries_prerope=ctx.queries_prerope[:, :, left:end],
            keys_prerope=ctx.keys_prerope[:, :, left:end],
            positions=ctx.positions[:, left:end],
            attn_probs=None,
        )

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "CompactorPress only supports prefill"
        left = min(self.sink_size_start, S)
        right = min(self.sink_size_end, max(0, S - left))
        end = S - right

        sub_ctx = self._sub_ctx(ctx, left, end)
        k_sub = keys[:, :, left:end]
        v_sub = values[:, :, left:end]
        lev, nca = self._children()
        l_scores = lev.score(sub_ctx, k_sub, v_sub)
        a_scores = nca.score(sub_ctx, k_sub, v_sub)
        blending = self.blending if self.blending is not None else self.compression_ratio
        scores = blending * l_scores + a_scores
        maxv = jnp.max(scores)
        scores = jnp.pad(scores, ((0, 0), (0, 0), (left, right)))
        pos = jnp.arange(S)[None, None]
        protected = (pos < left) | (pos >= end)
        return jnp.where(protected, maxv, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill: children score the static [left, S) slice with a
        traced sub-validity (the end sink floats with the real length); the
        protected start/end sinks take the max over valid scores."""
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "CompactorPress only supports prefill"
        n = jnp.asarray(length, jnp.int32)
        left = min(self.sink_size_start, S)
        sub_ctx = self._sub_ctx(ctx, left, S)
        k_sub = keys[:, :, left:]
        v_sub = values[:, :, left:]
        # scoreable sub-positions: [left, n - right) — right clamps like the
        # static path does for short contexts
        right = jnp.minimum(self.sink_size_end, jnp.maximum(n - left, 0))
        n_sub = jnp.maximum(n - right - left, 0)
        sub_valid = jnp.arange(S - left) < n_sub

        lev, nca = self._children()
        l_scores = lev._score_impl(sub_ctx, k_sub, v_sub, valid=sub_valid)
        a_scores = nca._score_impl(sub_ctx, k_sub, v_sub, valid=sub_valid)
        blending = self.blending if self.blending is not None else self.compression_ratio
        scores = blending * l_scores + a_scores
        maxv = jnp.max(jnp.where(sub_valid[None, None], scores, -jnp.inf))
        scores = jnp.pad(scores, ((0, 0), (0, 0), (left, 0)))
        pos = jnp.arange(S)[None, None]
        protected = (pos < left) | ((pos >= n - right) & (pos < n))
        return jnp.where(protected, maxv, scores)
