"""CAMPress: Cache Merging during decoding (reference cam_press.py,
https://openreview.net/forum?id=LCTmppB165).

Extends DecodingPress with a running cumulative-attention buffer; on each
compression, the values of recently-added evicted tokens are Bernoulli-merged
into the ``merge_budget`` kept tokens that follow them, weighted by the ratio
of their cumulative attention to the window mean — then the cache is
physically pruned to ``target_size``.

The reference's dynamic shapes (n_to_evict, per-step candidate count) become
static bounds + traced validity: merge candidates are the top
``compression_interval`` evicted scores (ties → later positions first), with
candidates beyond the actual step count masked out of the Bernoulli draw.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import window_attention_probs
from .decoding import NEG_INF, DecodingPress
from .snapkv import group_mean


@dataclasses.dataclass(frozen=True)
class CAMPress(DecodingPress):
    merge_budget: int = 32
    seed: int = 0

    # CAM accumulates the current token's attention over DENSE keys every
    # step and merges evicted values — it needs the dequantized buffer, so
    # the payload-width decode-compress path does not apply.
    supports_quantized_decode = False

    def __post_init__(self):
        super().__post_init__()
        assert self.merge_budget > 0

    def init_state(self, cfg, batch, seq_len, dtype=jnp.float32):
        state = super().init_state(cfg, batch, seq_len, dtype)
        L, H = cfg.num_layers, cfg.num_kv_heads
        state["attn_sum"] = jnp.zeros((L, batch, H, seq_len), jnp.float32)
        state["rng_step"] = jnp.zeros((L,), jnp.int32)
        return state

    def decode_compress(self, ctx, keys, values, length, mask, state=None):
        B, H, S, D = keys.shape
        T = ctx.hidden.shape[1]
        W = self.merge_budget

        attn_sum = state["attn_sum"]
        if attn_sum.shape[-1] != S:
            # Cache was re-bucketed between prefill and decode: restart the
            # accumulator at the buffer size (prefill never accumulates).
            attn_sum = jnp.zeros((B, H, S), jnp.float32)

        # Accumulate the current (last) token's attention over the cache.
        q_last = ctx.queries[:, :, -1:]
        probs = window_attention_probs(q_last, keys, ctx.scale, length - 1)
        probs = group_mean(probs[:, :, 0], H)                  # (B, Hkv, S)
        valid = jnp.arange(S)[None, None] < length
        attn_sum = attn_sum + jnp.where(valid, probs, 0.0)

        # Ring buffer of hidden states (as DecodingPress).
        buf = state["buffer"]
        buf_size = buf.shape[1]
        if T >= buf_size:
            buf = ctx.hidden[:, -buf_size:].astype(buf.dtype)
        else:
            buf = jnp.concatenate([buf[:, T:], ctx.hidden.astype(buf.dtype)], axis=1)
        buf_len = jnp.minimum(state["buf_len"] + T, buf_size)
        steps = state["steps"] + 1
        rng_step = state["rng_step"] + 1

        target = self.target_size
        n_top = min(target, S)
        do = (steps >= self.compression_interval) & (length > target)

        def compress(args):
            keys, values, mask, attn_sum = args
            last_pos = ctx.positions[:, -1:]
            buf_positions = last_pos - jnp.arange(
                buf_size - 1, -1, -1, dtype=jnp.int32
            )[None]
            dctx = dataclasses.replace(
                ctx, hidden=buf, positions=buf_positions, kv_len=length,
                attn_probs=None,
            )
            scores = self.score_dynamic(dctx, keys, values, length).astype(jnp.float32)
            scores = jnp.where(valid, scores, NEG_INF)
            mean_scores = scores.mean(axis=1)                  # (B, S)

            # Kept set: top target_size (ascending position order).
            _, kept_idx = jax.lax.top_k(mean_scores, n_top)
            kept_idx = jnp.sort(kept_idx, axis=-1)             # (B, n_top)
            is_kept = jnp.zeros((B, S), bool)
            is_kept = jnp.put_along_axis(is_kept, kept_idx, True, axis=-1, inplace=False)
            evicted = valid[:, 0] & ~is_kept                   # (B, S)

            # Merge candidates: top `steps` evicted scores, ties → later pos.
            k_max = self.compression_interval
            cand_key = jnp.where(evicted, mean_scores, -jnp.inf)
            pos = jnp.arange(S, dtype=jnp.float32)[None]
            # strictly-monotone tiebreak toward later positions:
            cand_key = cand_key + pos * 1e-12
            _, merge_idx = jax.lax.top_k(cand_key, min(k_max, S))  # (B, k_max)
            cand_rank = jnp.arange(merge_idx.shape[1])[None]
            cand_ok = (cand_rank < steps) & jnp.take_along_axis(
                evicted, merge_idx, axis=-1
            )

            # Window of merge_budget kept positions after each candidate.
            starts = jax.vmap(
                lambda ki, mi: jnp.searchsorted(ki, mi, side="right")
            )(kept_idx, merge_idx)                             # (B, k_max)
            offs = jnp.arange(W)[None, None]
            widx = starts[..., None] + offs                    # (B, k_max, W)
            w_valid = widx < n_top
            widx = jnp.minimum(widx, n_top - 1)
            targets = jnp.take_along_axis(
                kept_idx[:, None, :].repeat(widx.shape[1], axis=1), widx, axis=-1
            )                                                  # (B, k_max, W)

            budget = jnp.sum(w_valid, axis=-1)                 # (B, k_max)
            # Window mean of cumulative attention, per kv head.
            wa = jnp.take_along_axis(
                attn_sum[:, :, None, :],
                jnp.broadcast_to(targets[:, None], (B, H) + targets.shape[1:]),
                axis=-1,
            )                                                  # (B, H, k_max, W)
            wa = wa * w_valid[:, None]
            mean_attn = wa.sum(-1) / jnp.maximum(budget, 1)[:, None]
            cand_attn = jnp.take_along_axis(
                attn_sum, jnp.broadcast_to(merge_idx[:, None], (B, H, merge_idx.shape[1])),
                axis=-1,
            )
            prob = cand_attn / mean_attn
            prob = jnp.nan_to_num(prob, nan=0.0, posinf=1.0)
            prob = jnp.clip(prob, 0.0, 1.0)
            prob = prob * cand_ok[:, None]

            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(self.seed), ctx.layer_idx),
                rng_step,
            )
            bern = jax.random.bernoulli(key, prob).astype(jnp.float32)

            mv = jnp.take_along_axis(
                values,
                jnp.broadcast_to(
                    merge_idx[:, None, :, None], (B, H, merge_idx.shape[1], D)
                ),
                axis=2,
            ).astype(jnp.float32)
            scale_m = bern / jnp.maximum(budget, 1)[:, None]
            scale_m = jnp.where(budget[:, None] == 0, 0.0, scale_m)
            contrib = mv * scale_m[..., None]                  # (B, H, k_max, D)
            contrib = contrib[:, :, :, None, :] * w_valid[:, None, :, :, None]

            bidx = jnp.arange(B)[:, None, None, None]
            hidx = jnp.arange(H)[None, :, None, None]
            tgt = jnp.broadcast_to(targets[:, None], (B, H) + targets.shape[1:])
            values = values.astype(jnp.float32).at[bidx, hidx, tgt].add(contrib)
            values = values.astype(keys.dtype)

            # Physical prune (token order preserved).
            kept_k = jnp.take_along_axis(
                keys, jnp.broadcast_to(kept_idx[:, None, :, None], (B, H, n_top, D)),
                axis=2,
            )
            kept_v = jnp.take_along_axis(
                values, jnp.broadcast_to(kept_idx[:, None, :, None], (B, H, n_top, D)),
                axis=2,
            )
            keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
            values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
            kept_attn = jnp.take_along_axis(
                attn_sum, jnp.broadcast_to(kept_idx[:, None], (B, H, n_top)), axis=-1
            )
            attn_sum = jax.lax.dynamic_update_slice_in_dim(
                jnp.zeros_like(attn_sum), kept_attn, 0, axis=2
            )
            return (
                keys, values, jnp.asarray(n_top, jnp.int32),
                jnp.ones((B, H, S), bool), attn_sum,
            )

        def skip(args):
            keys, values, mask, attn_sum = args
            return keys, values, length, mask, attn_sum

        keys, values, new_len, mask, attn_sum = jax.lax.cond(
            do, compress, skip, (keys, values, mask, attn_sum)
        )
        steps = jnp.where(do, 0, steps)
        buf_len = jnp.where(do, 0, buf_len)
        new_state = {
            "buffer": buf, "buf_len": buf_len, "steps": steps,
            "attn_sum": attn_sum, "rng_step": rng_step,
        }
        return keys, values, new_len, mask, new_state
