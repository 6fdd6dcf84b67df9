"""Decode-time compression: DecodingPress, CompressionRatioDecodingPress,
PrefillDecodingPress (reference decoding_press.py, compression_ratio_
decoding_press.py, prefill_decoding_press.py).

The reference buffers hidden states in Python dicts on the press object and
mutates the cache from the hook. Here the buffer/step-counters are an explicit
press-state pytree (stacked over layers) threaded through the jitted decode
loop; compression is a `lax.cond` inside the layer body. The reference's
binary-search for "the ratio that ints to target_size"
(decoding_press.py:194-236) disappears entirely: we top-k directly to a
static bound and set the valid length to the (possibly traced) target.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import NEG_INF, BasePress, LayerCtx, ScorerPress, topk_keep



def _buffer_queries(ctx: LayerCtx, hidden: jax.Array, positions: jax.Array):
    """Re-project buffered hidden states to post-RoPE queries, mirroring the
    reference's get_prerope_query_states + RoPE (utils.py:12-63)."""
    from ..models.llama import _project_qkv
    from ..rope import apply_rope, rope_cos_sin

    q_pre, _, _ = _project_qkv(ctx.layer_params, ctx.cfg, hidden)
    cos, sin = rope_cos_sin(ctx.inv_freq, positions, ctx.attention_scaling)
    return apply_rope(q_pre, cos[:, None], sin[:, None])


@dataclasses.dataclass(frozen=True)
class DecodingPress(BasePress):
    """Compress the cache to ``target_size`` every ``compression_interval``
    decode steps, scoring with ``base_press``."""

    base_press: ScorerPress = None
    compression_interval: int = 512
    target_size: int = 2048
    hidden_states_buffer_size: int = 256

    compresses_prefill = False
    compresses_decode = True
    # decode_compress_quantized: compression gathers int8/int4 payloads
    # directly (scales ride the top-k gather) — no per-step dequant buffer.
    supports_quantized_decode = True

    def __post_init__(self):
        assert self.base_press is not None
        assert self.compression_interval > 0
        assert self.target_size > 0

    @property
    def compression_ratio(self):
        return 0.0   # measured, not set (prefill untouched)

    def init_state(self, cfg, batch, seq_len, dtype=jnp.float32):
        L = cfg.num_layers
        buf = max(self.hidden_states_buffer_size, 1)
        return {
            "buffer": jnp.zeros((L, batch, buf, cfg.hidden_size), dtype),
            "buf_len": jnp.zeros((L,), jnp.int32),
            "steps": jnp.zeros((L,), jnp.int32),
        }

    # -- target resolution (static bound + traced value) ------------------- #

    def target_bound(self, ctx: LayerCtx, buf_size: int) -> int:
        return self.target_size

    def target_value(self, ctx: LayerCtx, length) -> jax.Array:
        return jnp.asarray(self.target_size, jnp.int32)

    def target_value_vec(self, last_positions, length) -> jax.Array:
        """Per-slot targets for the serving engine (vectorized target_value):
        ``last_positions``/``length`` are (N,) per request slot."""
        return jnp.full_like(length, self.target_size)

    # ---------------------------------------------------------------------- #

    def _advance(self, ctx, state, length, S):
        """Shared per-step bookkeeping: ring-buffer append of this call's
        hidden states + interval counters. Returns
        (buf, buf_len, steps, do, interval_hit, n_top, target)."""
        T = ctx.hidden.shape[1]
        buf = state["buffer"]
        buf_size = buf.shape[1]
        if T >= buf_size:
            buf = ctx.hidden[:, -buf_size:].astype(buf.dtype)
        else:
            buf = jnp.concatenate(
                [buf[:, T:], ctx.hidden.astype(buf.dtype)], axis=1
            )
        buf_len = jnp.minimum(state["buf_len"] + T, buf_size)
        steps = state["steps"] + 1
        n_top = min(self.target_bound(ctx, buf_size), S)
        target = self.target_value(ctx, length)
        interval_hit = steps >= self.compression_interval
        do = interval_hit & (length > target)
        return buf, buf_len, steps, do, interval_hit, n_top, target

    def _score_buffer(self, ctx, buf, keys, values, length):
        """Score the cache against the buffered hidden window."""
        buf_size = buf.shape[1]
        S = keys.shape[2]
        last_pos = ctx.positions[:, -1:]                      # (B, 1)
        buf_positions = last_pos - jnp.arange(
            buf_size - 1, -1, -1, dtype=jnp.int32
        )[None]
        dctx = dataclasses.replace(
            ctx, hidden=buf, positions=buf_positions, kv_len=length,
            attn_probs=None,
        )
        scores = self.score_dynamic(dctx, keys, values, length).astype(jnp.float32)
        valid = jnp.arange(S)[None, None] < length
        return jnp.where(valid, scores, NEG_INF)

    def _finish_state(self, buf, buf_len, steps, do, interval_hit, sync_state):
        reset = interval_hit if sync_state else do
        steps = jnp.where(reset, 0, steps)
        buf_len = jnp.where(reset, 0, buf_len)
        return {"buffer": buf, "buf_len": buf_len, "steps": steps}

    def decode_compress(self, ctx, keys, values, length, mask, state=None,
                        sync_state=False):
        """``sync_state=True`` (distributed decode, parallel/decode.py) resets
        the step/buffer counters on every interval hit regardless of whether
        THIS shard compressed — state stays bit-identical across shards, so
        it can be carried replicated through the shard_map."""
        S = keys.shape[2]
        buf, buf_len, steps, do, interval_hit, n_top, target = self._advance(
            ctx, state, length, S
        )

        def compress(args):
            keys, values, mask = args
            scores = self._score_buffer(ctx, buf, keys, values, length)
            k2, v2, _ = topk_keep(scores, keys, values, n_top)
            B, H = keys.shape[:2]
            return k2, v2, jnp.minimum(target, n_top), jnp.ones((B, H, S), bool)

        def skip(args):
            keys, values, mask = args
            return keys, values, length, mask

        keys, values, new_len, mask = jax.lax.cond(
            do, compress, skip, (keys, values, mask)
        )
        new_state = self._finish_state(buf, buf_len, steps, do, interval_hit,
                                       sync_state)
        return keys, values, new_len, mask, new_state

    def decode_compress_quantized(self, ctx, keys, values, key_scales,
                                  value_scales, kv_bits, length, mask,
                                  state=None, sync_state=False):
        """Decode-phase compression over int8/packed-int4 payload buffers
        (``cache.quantize_kv`` layout: per-(token, head) scales).

        The key property: compression never round-trips the payload. Scoring
        needs dense keys/values, so they are dequantized ONLY inside the
        interval ``cond`` (amortized over ``compression_interval`` steps);
        the kept entries are then gathered at payload width — the per-token
        scales ride the same top-k gather — so no requantization happens and
        compression adds zero extra quantization error. This is what makes
        decode presses composable with the quantized cache (reference quanto
        interplay, base_press.py:152-157, done without the per-step
        full-buffer dequant)."""
        from ..cache import dequantize_kv

        S = keys.shape[2]
        buf, buf_len, steps, do, interval_hit, n_top, target = self._advance(
            ctx, state, length, S
        )

        def compress(args):
            keys, values, key_scales, value_scales, mask = args
            dt = ctx.hidden.dtype
            k_bf = dequantize_kv(keys, key_scales, kv_bits, dt)
            v_bf = dequantize_kv(values, value_scales, kv_bits, dt)
            scores = self._score_buffer(ctx, buf, k_bf, v_bf, length)
            k2, v2, idx = topk_keep(scores, keys, values, n_top)
            ks2 = jnp.take_along_axis(key_scales, idx[..., None], axis=2)
            vs2 = jnp.take_along_axis(value_scales, idx[..., None], axis=2)
            ks2 = jax.lax.dynamic_update_slice_in_dim(key_scales, ks2, 0, axis=2)
            vs2 = jax.lax.dynamic_update_slice_in_dim(value_scales, vs2, 0, axis=2)
            B, H = keys.shape[:2]
            return (k2, v2, ks2, vs2, jnp.minimum(target, n_top),
                    jnp.ones((B, H, S), bool))

        def skip(args):
            keys, values, key_scales, value_scales, mask = args
            return keys, values, key_scales, value_scales, length, mask

        keys, values, key_scales, value_scales, new_len, mask = jax.lax.cond(
            do, compress, skip, (keys, values, key_scales, value_scales, mask)
        )
        new_state = self._finish_state(buf, buf_len, steps, do, interval_hit,
                                       sync_state)
        return keys, values, key_scales, value_scales, new_len, mask, new_state

    def score_dynamic(self, dctx: LayerCtx, keys, values, length) -> jax.Array:
        """Score with the base press against a traced valid length. Content
        scorers (Knorm/Random/KeyDiff/CUR/QFilter) are position-independent;
        window presses override via their dynamic_score hook if present."""
        fn = getattr(self.base_press, "dynamic_score", None)
        if fn is not None:
            return fn(dctx, keys, values, length)
        return self.base_press.score(dctx, keys, values)


@dataclasses.dataclass(frozen=True)
class CompressionRatioDecodingPress(DecodingPress):
    """Target = fraction of *logical* tokens seen so far (reference
    compression_ratio_decoding_press.py:42-50)."""

    target_compression_ratio: float = 0.5

    def __post_init__(self):
        assert self.base_press is not None
        assert 0 <= self.target_compression_ratio < 1

    def target_bound(self, ctx: LayerCtx, buf_size: int) -> int:
        # Static top-k bound: the whole cache buffer (the caller clamps to S);
        # the traced target below sets the kept length.
        return 2**30

    def target_value(self, ctx: LayerCtx, length) -> jax.Array:
        total_seen = jnp.max(ctx.positions) + 1
        t = (total_seen.astype(jnp.float32)
             * (1 - self.target_compression_ratio)).astype(jnp.int32)
        return jnp.maximum(1, t)

    def target_value_vec(self, last_positions, length) -> jax.Array:
        total_seen = last_positions + 1
        t = (total_seen.astype(jnp.float32)
             * (1 - self.target_compression_ratio)).astype(jnp.int32)
        return jnp.maximum(1, t)


@dataclasses.dataclass(frozen=True)
class BudgetDecodingPress(CompressionRatioDecodingPress):
    """Target = the base press's OWN per-layer budget (dynamic_budget) —
    honors budget-shaping scorers (PyramidKV's beta pyramid) where
    CompressionRatioDecodingPress would silently flatten every layer to a
    uniform (1 - ratio)·total. Used by Runner.prefill_chunked's final
    compression pass."""

    def target_value(self, ctx: LayerCtx, length) -> jax.Array:
        return self.base_press.dynamic_budget(ctx, length)

    def target_value_vec(self, last_positions, length) -> jax.Array:
        raise NotImplementedError(
            "BudgetDecodingPress is a chunked-prefill internal; the serving "
            "engine uses DecodingPress/CompressionRatioDecodingPress"
        )


@dataclasses.dataclass(frozen=True)
class PrefillDecodingPress(BasePress):
    """Phase router (reference prefill_decoding_press.py:45-81)."""

    prefilling_press: Optional[BasePress] = None
    decoding_press: Optional[DecodingPress] = None

    compresses_prefill = True
    compresses_decode = True

    @property
    def compression_ratio(self):
        if self.prefilling_press is not None:
            return self.prefilling_press.compression_ratio
        return 0.0

    def max_kept(self, seq_len, cfg):
        if self.prefilling_press is not None:
            return self.prefilling_press.max_kept(seq_len, cfg)
        return seq_len

    def init_state(self, cfg, batch, seq_len, dtype=jnp.float32):
        if self.decoding_press is not None:
            return self.decoding_press.init_state(cfg, batch, seq_len, dtype)
        return None

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.prefilling_press is None:
            return keys, values, length, mask, state
        k, v, l, m, _ = self.prefilling_press.layer_compress(
            ctx, keys, values, length, mask, None
        )
        return k, v, l, m, state

    def decode_compress(self, ctx, keys, values, length, mask, state=None):
        if self.decoding_press is None:
            return keys, values, length, mask, state
        return self.decoding_press.decode_compress(
            ctx, keys, values, length, mask, state
        )

    @property
    def supports_quantized_decode(self):  # type: ignore[override]
        return (self.decoding_press is None
                or self.decoding_press.supports_quantized_decode)

    def decode_compress_quantized(self, ctx, keys, values, key_scales,
                                  value_scales, kv_bits, length, mask,
                                  state=None, sync_state=False):
        if self.decoding_press is None:
            return (keys, values, key_scales, value_scales, length, mask,
                    state)
        return self.decoding_press.decode_compress_quantized(
            ctx, keys, values, key_scales, value_scales, kv_bits, length,
            mask, state, sync_state=sync_state,
        )
