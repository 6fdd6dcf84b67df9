"""FinchPress: SnapKV-style compression with a *dynamic* observation window
delimited by a separator token between context and question (reference
finch_press.py:56-166).

The reference detects the delimiter inside an embedding-layer forward hook and
strips its embedding mid-forward (finch_press.py:123-137). Here the pipeline
finds the delimiter host-side *before* tracing, strips the token id, and bakes
the resulting window size into the (static) press — no embedding surgery, no
tokenizer resize needed (the model never sees the delimiter).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import BasePress, LayerCtx
from .snapkv import group_mean
from .wrappers import KeyRerotationPress
from ..ops.attention import window_attention_probs


@dataclasses.dataclass(frozen=True)
class FinchPress(BasePress):
    compression_ratio: float = 0.0
    chunk_length: Optional[int] = None
    normalize_scores: bool = True
    rerotate_keys: bool = True
    delimiter_token_id: Optional[int] = None
    window_size: Optional[int] = None     # set by the pipeline per input

    @property
    def rerotates(self):
        return self.rerotate_keys

    def with_window(self, window_size: int) -> "FinchPress":
        return dataclasses.replace(self, window_size=window_size)

    def _kept_spans(self, S: int) -> list[tuple[int, int, int]]:
        """[(start, size, n_kept)] — one global span or per-chunk spans."""
        if self.chunk_length is None:
            return [(0, S, int(S * (1 - self.compression_ratio)))]
        assert self.chunk_length > self.window_size / (1 - self.compression_ratio)
        out = []
        for start in range(0, S, self.chunk_length):
            size = min(self.chunk_length, S - start)
            out.append((start, size, max(1, int(size * (1 - self.compression_ratio)))))
        return out

    def max_kept(self, seq_len: int, cfg) -> int:
        return sum(n for _, _, n in self._kept_spans(seq_len))

    def exact_kept(self, seq_len: int):
        return self.max_kept(seq_len, None)

    def score(self, ctx: LayerCtx, keys, values):
        """SnapKV with a normalization step before window-averaging
        (finch_press.py:56-88): row i of the window is weighted by the number
        of keys it attends to."""
        B, Hkv, S, _ = keys.shape
        W = self.window_size
        assert W is not None and 0 < W < S
        q_win = ctx.queries[:, :, S - W :]
        prior = jnp.asarray(S - W, jnp.int32)
        attn = window_attention_probs(q_win, keys, ctx.scale, prior)[..., : S - W]
        if self.normalize_scores:
            counts = jnp.arange(S - W, S, dtype=jnp.float32)[None, None, :, None]
            attn = attn * counts
        scores = attn.mean(axis=-2)                        # (B, Hq, S-W)
        scores = group_mean(scores, Hkv)
        maxv = jnp.max(scores) + 1.0
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, W)))
        window_region = jnp.arange(S)[None, None] >= S - W
        return jnp.where(window_region, maxv, scores)

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        S = keys.shape[2]
        scores = self.score(ctx, keys, values).astype(jnp.float32)
        idx_parts = []
        for start, size, n_keep in self._kept_spans(S):
            sub = scores[..., start : start + size]
            _, idx = jax.lax.top_k(sub, n_keep)
            idx_parts.append(start + idx)
        idx = jnp.concatenate(idx_parts, axis=-1)
        idx = jnp.sort(idx, axis=-1)
        kept_k = jnp.take_along_axis(keys, idx[..., None], axis=2)
        kept_v = jnp.take_along_axis(values, idx[..., None], axis=2)
        if self.rerotate_keys:
            kept_k = KeyRerotationPress.rerotate(kept_k, idx, ctx.inv_freq)
        n = idx.shape[-1]
        keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
        B, H = keys.shape[:2]
        return (
            keys, values, jnp.asarray(n, jnp.int32),
            jnp.ones((B, H, S), bool), state,
        )

    # -- chunked-prefill composition (models/llama._compress_layer) ------- #
    # The observation window is the question suffix — it lives in the FINAL
    # chunk's scoring window, so Finch composes with chunked prefill exactly
    # when window_size <= the scoring window (asserted); scoring/selection
    # are the one-shot math with the static S replaced by the traced length.

    def _chunked_scores(self, ctx, keys, length):
        W = self.window_size
        assert W is not None and W <= ctx.queries.shape[2], (
            f"FinchPress window ({W}) exceeds the chunked-prefill scoring "
            f"window ({ctx.queries.shape[2]}) — raise score_window/"
            "context_chunk or shorten the question part"
        )
        S = keys.shape[2]
        Hkv = keys.shape[1]
        q_win = ctx.queries[:, :, -W:]
        prior = (length - W).astype(jnp.int32)
        attn = window_attention_probs(q_win, keys, ctx.scale, prior)
        pos = jnp.arange(S)
        attn = jnp.where((pos < length - W)[None, None, None], attn, 0.0)
        if self.normalize_scores:
            counts = (length - W + jnp.arange(W, dtype=jnp.int32)).astype(
                jnp.float32
            )
            attn = attn * counts[None, None, :, None]
        scores = attn.mean(axis=-2)                          # (B, Hq, S)
        scores = group_mean(scores, Hkv)
        maxv = jnp.max(scores) + 1.0
        window_region = (pos >= length - W) & (pos < length)
        scores = jnp.where(window_region[None, None], maxv, scores)
        from .base import NEG_INF

        return jnp.where((pos < length)[None, None], scores, NEG_INF)

    def _chunked_keep(self, ctx, keys, length):
        from .wrappers import _dyn_budget, _rank_desc

        scores = self._chunked_scores(ctx, keys, length)
        S = keys.shape[2]
        if self.chunk_length is None:
            n_kept = _dyn_budget(length, self.compression_ratio)
            return _rank_desc(scores) < n_kept, n_kept
        pieces, total = [], jnp.asarray(0, jnp.int32)
        for start in range(0, S, self.chunk_length):
            size = min(self.chunk_length, S - start)
            valid_c = jnp.clip(length - start, 0, size)
            budget = jnp.where(
                valid_c > 0,
                jnp.maximum(
                    (valid_c.astype(jnp.float32)
                     * (1 - self.compression_ratio)).astype(jnp.int32), 1,
                ),
                0,
            )
            pieces.append(
                _rank_desc(scores[..., start:start + size]) < budget
            )
            total = total + budget
        return jnp.concatenate(pieces, axis=-1), total

    def chunked_compress(self, ctx, keys, values, length, mask):
        from .wrappers import _compact_order, _gather_seq

        if self.compression_ratio == 0.0:
            return keys, values, length, mask
        keep, total = self._chunked_keep(ctx, keys, length)
        order = _compact_order(keep)                   # kept, position order
        k2, v2 = _gather_seq((keys, values), order)
        if self.rerotate_keys:
            k2 = KeyRerotationPress.rerotate(k2, order, ctx.inv_freq)
        return k2, v2, total, jnp.ones_like(mask)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv, quantize_kv
        from .wrappers import _compact_order, _gather_seq

        if self.compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        keep, total = self._chunked_keep(ctx, kd, length)
        order = _compact_order(keep)
        if self.rerotate_keys:
            # rerotated keys change value → requantize (keys only)
            kd2 = jnp.take_along_axis(kd, order[..., None], axis=2)
            kd2 = KeyRerotationPress.rerotate(kd2, order, ctx.inv_freq)
            k2, ks2 = quantize_kv(kd2, bits)
        else:
            k2, ks2 = _gather_seq((keys, key_scales), order)
        v2, vs2 = _gather_seq((values, value_scales), order)
        return k2, v2, ks2, vs2, total, jnp.ones_like(mask)
