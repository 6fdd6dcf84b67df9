"""CapPress — CAPKV scoring (reference cap_press.py, arXiv:2604.25975):
query anchor = mean of avg-RoPE-rotated pre-RoPE queries; alignment weights
w_i = exp(tau·cos(k_i, mu_q)); score = w_i · leverage of value vectors
against the capacity matrix I + Σ w_i v_i v_iᵀ via linear solve."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..rope import mean_rotation_matrix
from .base import LayerCtx, ScorerPress
from .keydiff import _l2_normalize


@dataclasses.dataclass(frozen=True)
class CapPress(ScorerPress):
    tau: float = 5.0
    n_future_positions: int = 512
    n_sink: int = 4
    epsilon: float = 1e-6

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, D = keys.shape
        assert S > self.n_sink
        k = keys[:, :, self.n_sink :].astype(jnp.float32)
        v = values[:, :, self.n_sink :].astype(jnp.float32)
        Sp = S - self.n_sink
        Hq = ctx.queries.shape[1]
        G = Hq // Hkv

        # Query anchor: mean of avg-future-RoPE-rotated pre-RoPE queries.
        q_pre = ctx.queries_prerope[:, :, self.n_sink :].astype(jnp.float32)
        R = mean_rotation_matrix(
            ctx.inv_freq, jnp.asarray(ctx.seq_len, jnp.float32),
            self.n_future_positions,
        ) * ctx.attention_scaling
        q_rot = q_pre @ R.T                                   # (B, Hq, S', D)
        anchor = q_rot.mean(axis=2)                           # (B, Hq, D)

        k_rep = jnp.broadcast_to(k[:, :, None], (B, Hkv, G, Sp, D)).reshape(B, Hq, Sp, D)
        v_rep = jnp.broadcast_to(v[:, :, None], (B, Hkv, G, Sp, D)).reshape(B, Hq, Sp, D)

        stat = jnp.einsum(
            "bhd,bhtd->bht", _l2_normalize(anchor), _l2_normalize(k_rep)
        )
        stat = jnp.clip(stat, -1.0, 1.0)
        logits = self.tau * stat
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        weights = jnp.exp(logits)                             # (B, Hq, S')

        sqrt_w = jnp.sqrt(weights + self.epsilon)[..., None]
        scaled = v_rep * sqrt_w
        eye = jnp.eye(D, dtype=jnp.float32)[None, None]
        cap = eye + jnp.einsum("bhtd,bhte->bhde", scaled, scaled)
        vt = jnp.swapaxes(v_rep, 2, 3)                        # (B, Hq, D, S')
        sol = jnp.linalg.solve(cap, vt)
        leverage = jnp.sum(vt * sol, axis=2)                  # (B, Hq, S')
        scores = weights * leverage
        scores = scores.reshape(B, Hkv, G, Sp).mean(axis=2)
        maxv = jnp.max(scores) + 1.0
        scores = jnp.pad(scores, ((0, 0), (0, 0), (self.n_sink, 0)))
        sink = jnp.arange(S)[None, None] < self.n_sink
        return jnp.where(sink, maxv, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill: anchor mean, softmax-style weight max, and the
        capacity matrix all restricted to VALID (non-sink, non-pad) slots;
        the future-RoPE rotation anchors at the traced valid length."""
        B, Hkv, S, D = keys.shape
        L = jnp.asarray(length, jnp.int32)
        idx = jnp.arange(S, dtype=jnp.int32)
        valid = (idx >= self.n_sink) & (idx < L)
        Hq = ctx.queries.shape[1]
        G = Hq // Hkv
        k = keys.astype(jnp.float32)
        v = values.astype(jnp.float32)

        q_pre = ctx.queries_prerope.astype(jnp.float32)
        R = mean_rotation_matrix(
            ctx.inv_freq, L.astype(jnp.float32), self.n_future_positions
        ) * ctx.attention_scaling
        q_rot = q_pre @ R.T
        w = valid.astype(jnp.float32)[None, None, :, None]
        anchor = (q_rot * w).sum(axis=2) / jnp.maximum(w.sum(), 1.0)

        k_rep = jnp.broadcast_to(k[:, :, None], (B, Hkv, G, S, D)).reshape(B, Hq, S, D)
        v_rep = jnp.broadcast_to(v[:, :, None], (B, Hkv, G, S, D)).reshape(B, Hq, S, D)
        stat = jnp.einsum(
            "bhd,bhtd->bht", _l2_normalize(anchor), _l2_normalize(k_rep)
        )
        stat = jnp.clip(stat, -1.0, 1.0)
        logits = jnp.where(valid[None, None], self.tau * stat, -jnp.inf)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        weights = jnp.exp(logits)                             # 0 outside valid

        sqrt_w = jnp.sqrt(weights + self.epsilon)[..., None]
        sqrt_w = sqrt_w * valid.astype(jnp.float32)[None, None, :, None]
        scaled = v_rep * sqrt_w
        eye = jnp.eye(D, dtype=jnp.float32)[None, None]
        cap = eye + jnp.einsum("bhtd,bhte->bhde", scaled, scaled)
        vt = jnp.swapaxes(v_rep, 2, 3)
        sol = jnp.linalg.solve(cap, vt)
        leverage = jnp.sum(vt * sol, axis=2)
        scores = (weights * leverage).reshape(B, Hkv, G, S).mean(axis=2)
        scores = jnp.where(valid[None, None], scores, 0.0)
        maxv = jnp.max(scores) + 1.0
        return jnp.where((idx < self.n_sink)[None, None], maxv, scores)
