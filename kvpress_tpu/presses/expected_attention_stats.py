"""ExpectedAttentionStatsPress (reference expected_attention_with_stats.py):
ExpectedAttention scoring with query mean/covariance precomputed offline on a
calibration corpus instead of the current prefill.

The reference's offline pipeline patches rotary embeddings to capture queries
and fits stats per (layer, head) (:141-289). Here the capture is a collector
press running inside the jitted prefill, and ``collect_query_stats``
aggregates sufficient statistics (Σq, Σqqᵀ) across samples host-side.
Artifacts are local .npz files (the reference uploads to the HF hub)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import BasePress, LayerCtx, content_hash_eq
from .expected_attention import ExpectedAttentionPress
from ..rope import mean_rotation_matrix


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class ExpectedAttentionStatsPress(ExpectedAttentionPress):
    stats: Optional[dict] = None     # {"mu": (L,Hq,D), "cov": (L,Hq,D,D)}

    def query_statistics(self, ctx: LayerCtx):
        assert self.stats is not None, (
            "stats not loaded; pass stats=load_query_stats(path)"
        )
        mu = jnp.asarray(self.stats["mu"], jnp.float32)[ctx.layer_idx]     # (Hq, D)
        cov = jnp.asarray(self.stats["cov"], jnp.float32)[ctx.layer_idx]   # (Hq, D, D)
        R = mean_rotation_matrix(
            ctx.inv_freq, jnp.asarray(ctx.seq_len, jnp.float32),
            self.n_future_positions,
        ) * ctx.attention_scaling
        mu = (mu @ R.T)[None]                                    # (1, Hq, D)
        if self.use_covariance:
            cov = jnp.einsum("ij,hjk,lk->hil", R, cov, R)[None]
        else:
            cov = None
        return mu, cov


def save_query_stats(path: str, stats: dict) -> None:
    np.savez(path, mu=np.asarray(stats["mu"]), cov=np.asarray(stats["cov"]))


def load_query_stats(path: str) -> dict:
    d = np.load(path)
    return {"mu": d["mu"], "cov": d["cov"]}


@dataclasses.dataclass(frozen=True)
class _QueryStatsCollector(BasePress):
    """Accumulates per-layer Σq and Σqqᵀ of pre-RoPE queries (sinks excluded)."""

    n_sink: int = 4

    def init_state(self, cfg, batch, seq_len, dtype=None):
        L, Hq, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
        return {
            "sum": jnp.zeros((L, Hq, D), jnp.float32),
            "sq": jnp.zeros((L, Hq, D, D), jnp.float32),
            "count": jnp.zeros((L,), jnp.int32),
        }

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        q = ctx.queries_prerope[:, :, self.n_sink :].astype(jnp.float32)
        s = q.sum(axis=(0, 2))
        sq = jnp.einsum("bhsi,bhsj->hij", q, q)
        n = q.shape[0] * q.shape[2]
        state = {
            "sum": s,
            "sq": sq,
            "count": jnp.asarray(n, jnp.int32),
        }
        return keys, values, length, mask, state


def collect_query_stats(runner, params, samples, n_sink: int = 4) -> dict:
    """Fit query mean/cov over a list of (1, S) id arrays (the reference's
    booksum calibration, expected_attention_with_stats.py:141-289)."""
    cfg = runner.cfg
    total_sum = np.zeros((cfg.num_layers, cfg.num_heads, cfg.head_dim))
    total_sq = np.zeros(
        (cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.head_dim)
    )
    total_n = 0
    collector = _QueryStatsCollector(n_sink=n_sink)
    for ids in samples:
        _, _, state = runner.prefill(
            params, ids, press=collector, dtype=jnp.float32, compute_logits=False
        )
        total_sum += np.asarray(state["sum"])
        total_sq += np.asarray(state["sq"])
        total_n += int(state["count"][0])
    mu = total_sum / total_n
    cov = total_sq / total_n - np.einsum("lhi,lhj->lhij", mu, mu)
    return {"mu": mu, "cov": cov}
