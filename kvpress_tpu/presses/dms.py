"""DMSPress: threshold-based eviction with a sliding protection window
(reference dms_press.py:69-130, arXiv:2506.05345 dense-prefill variant).

Eviction is head-wise and data-dependent (no fixed ratio), so it maps to the
cache keep-mask: a token's bit is cleared once it leaves the protection window
with a score below threshold. The reference's per-layer python dict buffers
become a press-state pytree: a ring of the last ``sliding_window_size`` scores
plus the absolute slot of the oldest buffered score.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import BasePress, ScorerPress


@dataclasses.dataclass(frozen=True)
class DMSPress(BasePress):
    press: ScorerPress = None
    threshold: float = 0.0
    sliding_window_size: int = 128
    decoding: bool = False
    # Head-wise physical compaction of the prefill threshold mask
    # (cache.compact_masked, the KVzip/FastKVzip compact semantics): kept
    # entries move to each head's buffer front and the cache shrinks to the
    # max per-head kept count — a real memory/bandwidth reclaim the
    # reference's fake eviction cannot have. Prefill-only: the decode-time
    # ring state tracks absolute slot indices (first_slot), which
    # compaction remaps — asserted incompatible with decoding=True.
    compact: bool = False

    compresses_prefill = True

    @property
    def host_compact(self) -> bool:
        return self.compact

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)
        assert not (self.compact and self.decoding), (
            "DMSPress(compact=True) is prefill-only: decode-time threshold "
            "eviction tracks absolute slot indices (first_slot), which "
            "compaction remaps"
        )

    @property
    def compresses_decode(self) -> bool:  # type: ignore[override]
        return self.decoding

    @property
    def compression_ratio(self):
        # Measured, not set (reference raises on the setter; the observable is
        # computed from the final cache mask via cache.masked_fraction).
        return 0.0

    def init_state(self, cfg, batch, seq_len, dtype=jnp.float32):
        L, H, W = cfg.num_layers, cfg.num_kv_heads, self.sliding_window_size
        return {
            "scores": jnp.zeros((L, batch, H, W), jnp.float32),
            "count": jnp.zeros((L,), jnp.int32),
            "first_slot": jnp.zeros((L,), jnp.int32),
        }

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        """Prefill: score everything; evict below-threshold tokens outside the
        protection window; buffer the window's scores for decoding."""
        B, H, S, _ = keys.shape
        W = self.sliding_window_size
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        if S > W:
            pos = jnp.arange(S)[None, None]
            evictable = pos < S - W
            keep = ~(evictable & (scores < self.threshold))
            mask = mask & keep
        # Buffer the last min(W, S) scores.
        n_buf = min(W, S)
        buf = jnp.zeros((B, H, W), jnp.float32)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, scores[..., S - n_buf :], W - n_buf, axis=2
        )
        new_state = {
            "scores": buf,
            "count": jnp.asarray(n_buf, jnp.int32),
            "first_slot": jnp.asarray(S - n_buf, jnp.int32),
        }
        return keys, values, length, mask, new_state

    def apply_chunked(self, scores, S: int, mask, sliding):
        """Chunked-prefill finalization (models/llama.prefill_chunked):
        ``scores`` (L, B, H, S) are the per-token scores collected chunk by
        chunk through ``press.chunk_score_fn`` — identical to the one-shot
        ``press.score`` for per-token-local scorers (KVzap/Knorm) — and this
        applies exactly :meth:`layer_compress`'s threshold mask and decode
        ring state, batched over layers. ``mask`` is the materialized cache
        keep-mask (L, B, H, S_buf); ``sliding`` (L,) marks layers that are
        never compressed. Returns (new_mask, state)."""
        L, B, H, _ = scores.shape
        S_buf = mask.shape[-1]
        W = self.sliding_window_size
        if S > W:
            spad = jnp.pad(scores, ((0, 0),) * 3 + ((0, S_buf - S),),
                           constant_values=jnp.inf)      # pads never evict
            pos = jnp.arange(S_buf)[None, None, None]
            evict = (pos < S - W) & (spad < self.threshold)
            evict = evict & ~jnp.asarray(sliding)[:, None, None, None]
            mask = mask & ~evict
        n_buf = min(W, S)
        buf = jnp.zeros((L, B, H, W), jnp.float32)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, scores[..., S - n_buf:], W - n_buf, axis=3
        )
        state = {
            "scores": buf,
            "count": jnp.full((L,), n_buf, jnp.int32),
            "first_slot": jnp.full((L,), S - n_buf, jnp.int32),
        }
        return mask, state

    def decode_compress(self, ctx, keys, values, length, mask, state=None):
        """Decode: score the T new tokens, push into the ring; evict scores
        that fall out of the window if below threshold."""
        B, H, S, _ = keys.shape
        W = self.sliding_window_size
        T = ctx.hidden.shape[1]
        # Scores of the T new tokens (slots length-T .. length-1).
        new_k = jax.lax.dynamic_slice_in_dim(keys, length - T, T, axis=2)
        new_v = jax.lax.dynamic_slice_in_dim(values, length - T, T, axis=2)
        sub_ctx = dataclasses.replace(ctx, attn_probs=None)
        new_scores = self.press.score(sub_ctx, new_k, new_v).astype(jnp.float32)

        buf = state["scores"]
        count = state["count"]
        first = state["first_slot"]

        for t in range(T):
            s_t = new_scores[..., t]
            full = count >= W
            # Oldest buffered score leaves the window when the ring is full.
            oldest = buf[..., 0]
            evict = full & (oldest < self.threshold)
            slot_onehot = jnp.arange(S)[None, None] == first
            mask = jnp.where(evict[..., None] & slot_onehot, False, mask)
            buf = jnp.where(full, jnp.roll(buf, -1, axis=-1), buf)
            write_idx = jnp.where(full, W - 1, count)
            buf = buf.at[:, :, write_idx].set(s_t)
            first = jnp.where(full, first + 1, first)
            count = jnp.minimum(count + 1, W)

        new_state = {"scores": buf, "count": count, "first_slot": first}
        return keys, values, length, mask, new_state
