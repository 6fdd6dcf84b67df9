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

from .base import BasePress, LayerCtx, content_hash_eq


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
class _MeanQKCollector(BasePress):
    """Captures per-layer mean pre-RoPE queries/keys (post qk-norm)."""

    def init_state(self, cfg, batch, seq_len, dtype=None):
        L = cfg.num_layers
        return {
            "q": jnp.zeros((L, cfg.num_heads, cfg.head_dim), jnp.float32),
            "k": jnp.zeros((L, cfg.num_kv_heads, cfg.head_dim), jnp.float32),
        }

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        state = {
            "q": ctx.queries_prerope.astype(jnp.float32).mean(axis=(0, 2)),
            "k": ctx.keys_prerope.astype(jnp.float32).mean(axis=(0, 2)),
        }
        return keys, values, length, mask, state


def duo_attention_on_the_fly(runner, params, samples, q_len: int = 500) -> np.ndarray:
    """Experimental head scoring (reference duo_attention_on_the_fly,
    :144-210): mean pre-RoPE q/k per layer over calibration samples, repeated
    ``q_len`` times with RoPE, attention of the last query over all keys,
    score = area under the cumulative attention curve, group-averaged.
    Returns (L, H_kv) scores (higher = retrieval head)."""
    from ..rope import apply_rope, rope_cos_sin

    cfg = runner.cfg
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = Hq // Hkv
    inv_freq = runner.inv_freq()
    scores = np.zeros((cfg.num_layers, Hkv), np.float64)
    collector = _MeanQKCollector()

    positions = jnp.arange(q_len, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
    cos, sin = cos[:, None], sin[:, None]                # (1, 1, q_len, D)

    for ids in samples:
        _, _, state = runner.prefill(
            params, ids, press=collector, dtype=jnp.float32, compute_logits=False
        )
        mq = jnp.asarray(state["q"])                     # (L, Hq, D)
        mk = jnp.asarray(state["k"])                     # (L, Hkv, D)
        q = jnp.broadcast_to(mq[:, :, None], mq.shape[:2] + (q_len, D))
        k = jnp.broadcast_to(mk[:, :, None], mk.shape[:2] + (q_len, D))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_rep = jnp.repeat(k, G, axis=1)                 # (L, Hq, q_len, D)
        attn = jnp.einsum("lhd,lhsd->lhs", q[:, :, -1], k_rep) / D**0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        s = jnp.cumsum(attn, axis=-1).mean(axis=-1)      # (L, Hq)
        s = s.reshape(cfg.num_layers, Hkv, G).mean(axis=-1)
        scores += np.asarray(s) / len(samples)
    return scores


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class DuoAttentionPress(BasePress):
    head_compression_ratio: float = 0.0
    sink_size: int = 128
    recent_size: int = 256
    head_scores: Optional[np.ndarray] = None     # (L, H_kv), lower = prunable

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

    # -- chunked-prefill composition (models/llama._compress_layer) ------- #
    # Duo's eviction is position-only (sink/recent windows per streaming
    # head) — no scores, no hidden states — so the chunked form is the
    # one-shot mask with the static S replaced by the traced valid length.

    headwise_mask = True      # the cache must carry a materialized keep-mask

    def _chunked_keep(self, ctx, length, S: int):
        streaming = jnp.asarray(self.streaming_mask())[ctx.layer_idx]   # (H,)
        pos = jnp.arange(S)[None, None]
        middle = (pos >= self.sink_size) & (pos < length - self.recent_size)
        applies = length > self.sink_size + self.recent_size
        return ~(streaming[None, :, None] & middle & applies)

    def chunked_compress(self, ctx, keys, values, length, mask):
        keep = self._chunked_keep(ctx, length, keys.shape[2])
        return keys, values, length, mask & keep

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        keep = self._chunked_keep(ctx, length, keys.shape[2])
        return (keys, values, key_scales, value_scales, length, mask & keep)
