"""FastKVzipPress (reference fastkvzip_press.py, arXiv:2601.17668): learned
per-layer gates (mini-attention against trained sink keys, sigmoid-style
score) estimate KVzip importance during a *single* prefill; eviction is the
same global/layerwise bottom-k head mask as KVzip.

Gate weights are a stacked pytree loaded from a local .npz (the reference
downloads Jang-Hyun/Fast-KVzip .pt files)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BasePress, LayerCtx, content_hash_eq
from .kvzip import KVzipPress


def gate_scores(gates: dict, layer_idx, hidden: jax.Array, eps: float = 1e-6):
    """One layer's gate forward (reference FastKVzipGate.forward, :54-73).
    hidden (B=1, S, E) → scores (1, H, S)."""
    h = hidden[0].astype(jnp.float32)                       # (S, E)
    S = h.shape[0]
    wq, bq = gates["wq"][layer_idx], gates["bq"][layer_idx]
    wk = gates["wk"][layer_idx]
    dg = gates["q_norm"].shape[-1]
    H = gates["k_base"].shape[1]
    G = (wq.shape[-1] // dg) // H

    def rms(x, w):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + eps) * w

    qg = rms((h @ wq + bq).reshape(S, H, G, dg), gates["q_norm"][layer_idx])
    kg = rms((h @ wk).reshape(S, H, dg), gates["k_norm"][layer_idx])
    d = jnp.sqrt(dg * 1.0)
    # logit[h,s,g] = <k_hs, q_hsg>/d + b_hg (reference :65)
    logit = jnp.einsum("shd,shgd->shg", kg, qg) / d + gates["b"][layer_idx][None, :, 0]
    logit = logit.transpose(1, 0, 2)                        # (H, S, G)
    k_base = gates["k_base"][layer_idx][:, 0]               # (H, sink, dg)
    # base[h,s,k,g] = <k_base_hk, q_hsg>/d (reference :67)
    logit_base = jnp.einsum("hkd,shgd->hskg", k_base, qg) / d
    # score = 1 / (1 + sum_k exp(base_k - logit)), mean over groups (:68-72)
    score = 1.0 / (1.0 + jnp.exp(
        logit_base - logit[:, :, None, :]
    ).sum(axis=2))
    score = score.mean(-1)                                  # (H, S)
    return score[None]                                      # (1, H, S)


def save_fastkvzip_gates(path: str, gates: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in gates.items()})


def load_fastkvzip_gates(path: str) -> dict:
    d = np.load(path)
    return {k: jnp.asarray(d[k]) for k in d.files}


def init_random_gates(key, cfg, output_dim: int = 16, sink: int = 16) -> dict:
    """Random gates (the reference test fixture builds fresh FastKVzipGate
    modules, tests/default_presses.py:58-71)."""
    E, H = cfg.hidden_size, cfg.num_kv_heads
    G = cfg.num_heads // H
    L = cfg.num_layers
    ks = jax.random.split(key, 4)
    s = 0.02
    return {
        "wq": jax.random.normal(ks[0], (L, E, H * G * output_dim)) * s,
        "bq": jnp.zeros((L, H * G * output_dim)),
        "wk": jax.random.normal(ks[1], (L, E, H * output_dim)) * s,
        "q_norm": jnp.ones((L, output_dim)),
        "k_norm": jnp.ones((L, output_dim)),
        "k_base": jax.random.normal(ks[2], (L, H, 1, sink, output_dim)) * s,
        "b": jnp.zeros((L, H, 1, G)),
    }


def _gate_chunk_scores(arg, layer_idx, hidden, keys, values):
    """Per-token chunk scoring (prefill_chunked collect protocol): gate
    scores depend only on the token's own hidden state. ``arg`` = the gates
    pytree, a jit argument (never a closure constant)."""
    return gate_scores(arg, layer_idx, hidden)


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class FastKVzipPress(BasePress):
    compression_ratio: float = 0.0
    layerwise: bool = False
    n_sink: int = 4
    window_size: int = 4096
    window_ratio: float = 0.02
    gates: Optional[dict] = None
    # Head-wise compaction after the post-mask (cache.compact_masked) —
    # same memory-reclaim semantics as KVzipPress.compact / AdaKV compact.
    compact: bool = False

    post_mask = True            # pipeline applies the cross-layer mask after prefill
    compresses_prefill = True   # scores collected during prefill
    chunk_score_fn = staticmethod(_gate_chunk_scores)

    @property
    def host_compact(self) -> bool:
        return self.compact

    @property
    def chunk_score_arg(self):
        return self.gates

    def init_state(self, cfg, batch, seq_len, dtype=None):
        return {
            "scores": jnp.zeros((cfg.num_layers, batch, cfg.num_kv_heads, seq_len),
                                jnp.float32)
        }

    def layer_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        assert self.gates is not None, "gates not loaded"
        S = ctx.hidden.shape[1]
        scores = gate_scores(self.gates, ctx.layer_idx, ctx.hidden)
        protected = self._protected_slots(S)[None, None]
        scores = jnp.where(protected, 1.0, scores)
        return keys, values, length, mask, {"scores": scores}

    def _protected_slots(self, S: int) -> jax.Array:
        """Sink/recent protected window as a 1-D (S,) bool — the single
        home of the <32k window_ratio heuristic (reference
        fastkvzip_press.py:243-247); callers broadcast."""
        pos = jnp.arange(S)
        window = int(S * self.window_ratio) if S < 32000 else self.window_size
        return (pos < self.n_sink) | (pos >= S - window)

    def protect_scores(self, scores: jax.Array, S: int) -> jax.Array:
        """Apply the sink/recent protected window over FULL-context scores
        (L, B, H, S) — the chunked-prefill collector path concatenates raw
        per-chunk gate scores, then protects once here with the same
        semantics as layer_compress (which sees the whole context)."""
        protected = self._protected_slots(S)[None, None, None]
        return jnp.where(protected, 1.0, scores)

    def apply_post_mask(self, cache, state):
        """Cross-layer bottom-k mask from collected scores (reference
        compress_post, :255-280 — identical mechanics to KVzip)."""
        import dataclasses as dc

        score_val = np.asarray(state["scores"])             # (L, B, H, S_ctx)
        helper = KVzipPress(
            compression_ratio=self.compression_ratio, layerwise=self.layerwise,
            n_sink=self.n_sink,
        )
        keep = helper.head_mask_from_scores(score_val)
        L, B, H, S_ctx = keep.shape
        keep_padded = np.ones((L, B, H, cache.max_size), dtype=bool)
        keep_padded[..., :S_ctx] = keep
        mask = cache.mask
        if mask is None:
            mask = jnp.ones((L, B, H, cache.max_size), bool)
        return dc.replace(cache, mask=mask & jnp.asarray(keep_padded))
