"""Compactor family: NonCausalAttnPress, LeverageScorePress, CompactorPress
(reference non_causal_attention_press.py, leverage_press.py,
compactor_press.py; arXiv:2507.08143). Prefill-only."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import LayerCtx, ScorerPress
from .snapkv import avg_pool_1d


def _z_norm(scores: jax.Array) -> jax.Array:
    std = jnp.maximum(jnp.std(scores, ddof=1), 1e-6)
    return (scores - jnp.mean(scores)) / std


@dataclasses.dataclass(frozen=True)
class NonCausalAttnPress(ScorerPress):
    supports_padding = False
    """Non-causal chunked attention column-sums × ||v||, pooled, z-normed
    (reference :46-122)."""

    chunk_size: int = 256

    @staticmethod
    def non_causal_chunked_attn(q: jax.Array, k: jax.Array, chunk_size: int):
        """q/k: (B, H, S, d) → (B, H, S) column sums of chunked softmax(qk^T).
        Unscaled logits, per the reference (:89)."""
        B, H, S, d = k.shape
        S_pad = -(-S // chunk_size) * chunk_size
        pad = S_pad - S
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        nc = S_pad // chunk_size
        qc = qp.reshape(B, H, nc, chunk_size, d)
        kc = kp.reshape(B, H, nc, chunk_size, d)
        dots = jnp.einsum("bhcqd,bhckd->bhcqk", qc, kc)
        # Last chunk: zero invalid query rows, then -1e-9 invalid key columns
        # (mirrors reference masked_fill order, :92-93).
        invalid = jnp.arange(S_pad - chunk_size, S_pad) >= S
        last = dots[:, :, -1]
        last = jnp.where(invalid[None, None, :, None], 0.0, last)
        last = jnp.where(invalid[None, None, None, :], -1e-9, last)
        dots = dots.at[:, :, -1].set(last)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1)
        return attn.sum(axis=-2).reshape(B, H, S_pad)[..., :S]

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "NonCausalAttnPress only supports prefill"
        Hq = ctx.queries.shape[1]
        G = Hq // Hkv
        k_rep = jnp.broadcast_to(
            keys[:, :, None], (B, Hkv, G, S, d)
        ).reshape(B, Hq, S, d)
        A = self.non_causal_chunked_attn(
            ctx.queries.astype(jnp.float32), k_rep.astype(jnp.float32), self.chunk_size
        )
        A = A.reshape(B, Hkv, G, S).mean(axis=2)
        scores = A * jnp.linalg.norm(values.astype(jnp.float32), axis=-1)
        scores = avg_pool_1d(scores, 3)
        return _z_norm(scores)


@dataclasses.dataclass(frozen=True)
class LeverageScorePress(ScorerPress):
    supports_padding = False
    """Approximate statistical leverage of pre-RoPE keys via right Gaussian
    sketch + Cholesky solve with adaptive jitter (reference :46-110)."""

    sketch_dimension: int = 48
    seed: int = 0

    @staticmethod
    def compute_leverage_scores(
        key_states: jax.Array, phi: jax.Array
    ) -> jax.Array:
        """key_states (B,H,S,d), phi (B,H,d,k) → leverage scores (B,H,S)."""
        X = key_states - key_states.mean(axis=-2, keepdims=True)
        X = jnp.matmul(X, phi).astype(jnp.float32)             # (B,H,S,k)
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

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "LeverageScorePress only supports prefill"
        k_pre = ctx.keys_prerope.astype(jnp.float32)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), ctx.layer_idx)
        phi = jax.random.normal(
            key, (B, Hkv, d, self.sketch_dimension), jnp.float32
        ) / jnp.sqrt(self.sketch_dimension * 1.0)
        scores = self.compute_leverage_scores(k_pre, phi)
        return _z_norm(scores)


@dataclasses.dataclass(frozen=True)
class CompactorPress(ScorerPress):
    supports_padding = False
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

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, d = keys.shape
        assert ctx.queries.shape[2] == S, "CompactorPress only supports prefill"
        left = min(self.sink_size_start, S)
        right = min(self.sink_size_end, max(0, S - left))
        end = S - right

        sub_ctx = dataclasses.replace(
            ctx,
            hidden=ctx.hidden[:, left:end],
            queries=ctx.queries[:, :, left:end],
            queries_prerope=ctx.queries_prerope[:, :, left:end],
            keys_prerope=ctx.keys_prerope[:, :, left:end],
            positions=ctx.positions[:, left:end],
            attn_probs=None,
        )
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
