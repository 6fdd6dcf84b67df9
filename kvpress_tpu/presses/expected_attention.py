"""ExpectedAttentionPress — the reference's flagship method
(kvpress/presses/expected_attention_press.py:62-165, arXiv:2510.00636).

Scores keys by the attention that *future* queries are expected to pay them,
modeling future queries as Gaussian with the mean/covariance of the observed
pre-RoPE queries, rotated by the average RoPE matrix over the next
``n_future_positions``. The mean rotation matrix is built analytically from
per-frequency mean cos/sin (rope.mean_rotation_matrix) instead of averaging
explicit per-position matrices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..rope import mean_rotation_matrix
from .base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class ExpectedAttentionPress(ScorerPress):
    n_future_positions: int = 512
    n_sink: int = 4
    use_covariance: bool = True
    use_vnorm: bool = True
    epsilon: float = 0.0

    def query_statistics(self, ctx: LayerCtx):
        """mu (B, Hq, D) and cov (B, Hq, D, D) of pre-RoPE queries (sink
        excluded), rotated by the mean future-RoPE matrix."""
        q = ctx.queries_prerope[:, :, self.n_sink :].astype(jnp.float32)
        S_used = q.shape[2]
        mu = q.mean(axis=2)                                    # (B, Hq, D)
        cov = None
        if self.use_covariance:
            centered = q - mu[:, :, None]
            cov = jnp.einsum("bhsi,bhsj->bhij", centered, centered) / S_used
        q_len = ctx.seq_len
        R = mean_rotation_matrix(
            ctx.inv_freq, jnp.asarray(q_len, jnp.float32), self.n_future_positions
        ) * ctx.attention_scaling
        mu = mu @ R.T
        if cov is not None:
            cov = jnp.einsum("ij,bhjk,lk->bhil", R, cov, R)
        return mu, cov

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, D = keys.shape
        assert S > self.n_sink, f"Input should contain more tokens than n_sink={self.n_sink}"
        k = keys[:, :, self.n_sink :].astype(jnp.float32)      # (B, Hkv, S', D)
        v = values[:, :, self.n_sink :].astype(jnp.float32)
        mu, cov = self.query_statistics(ctx)
        G = mu.shape[1] // Hkv
        mug = mu.reshape(B, Hkv, G, D)
        scores = jnp.einsum("bhgd,bhsd->bhgs", mug, k) / jnp.sqrt(D * 1.0)
        if self.use_covariance:
            covg = cov.reshape(B, Hkv, G, D, D)
            scores = scores + jnp.einsum("bhsi,bhgij,bhsj->bhgs", k, covg, k) / D / 2
        scores = jax.nn.softmax(scores, axis=-1)
        scores = scores.mean(axis=2)                           # (B, Hkv, S')
        if self.use_vnorm:
            scores = (scores + self.epsilon) * jnp.linalg.norm(v, axis=-1)
        maxv = jnp.max(scores) + 1.0
        scores = jnp.pad(scores, ((0, 0), (0, 0), (self.n_sink, 0)))
        sink_region = jnp.arange(S)[None, None] < self.n_sink
        return jnp.where(sink_region, maxv, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill: query moments over the VALID (non-pad) rows only,
        the mean future-RoPE rotation starts at the traced valid length, and
        pad keys are excluded from the expected-attention softmax. Matches
        score() exactly when length == S (test_bucketing.py)."""
        B, Hkv, S, D = keys.shape
        L = jnp.asarray(length, jnp.int32)
        idx = jnp.arange(S, dtype=jnp.int32)
        q = ctx.queries_prerope.astype(jnp.float32)            # (B, Hq, S, D)
        w = ((idx >= self.n_sink) & (idx < L)).astype(jnp.float32)
        cnt = jnp.maximum(w.sum(), 1.0)
        mu = (q * w[None, None, :, None]).sum(axis=2) / cnt    # (B, Hq, D)
        cov = None
        if self.use_covariance:
            centered = (q - mu[:, :, None]) * w[None, None, :, None]
            cov = jnp.einsum("bhsi,bhsj->bhij", centered, centered) / cnt
        R = mean_rotation_matrix(
            ctx.inv_freq, L.astype(jnp.float32), self.n_future_positions
        ) * ctx.attention_scaling
        mu = mu @ R.T
        if cov is not None:
            cov = jnp.einsum("ij,bhjk,lk->bhil", R, cov, R)

        k = keys.astype(jnp.float32)
        v = values.astype(jnp.float32)
        G = mu.shape[1] // Hkv
        mug = mu.reshape(B, Hkv, G, D)
        logits = jnp.einsum("bhgd,bhsd->bhgs", mug, k) / jnp.sqrt(D * 1.0)
        if self.use_covariance:
            covg = cov.reshape(B, Hkv, G, D, D)
            logits = logits + jnp.einsum(
                "bhsi,bhgij,bhsj->bhgs", k, covg, k
            ) / D / 2
        valid = (idx >= self.n_sink) & (idx < L)
        logits = jnp.where(valid[None, None, None], logits, -jnp.inf)
        scores = jax.nn.softmax(logits, axis=-1).mean(axis=2)  # (B, Hkv, S)
        if self.use_vnorm:
            scores = (scores + self.epsilon) * jnp.linalg.norm(v, axis=-1)
        scores = jnp.where(valid[None, None], scores, 0.0)
        maxv = jnp.max(scores) + 1.0
        return jnp.where((idx < self.n_sink)[None, None], maxv, scores)
