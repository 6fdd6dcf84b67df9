"""Observation-window presses: SnapKV, TOVA, ObservedAttention, PyramidKV.

Reference semantics: kvpress/presses/snapkv_press.py, tova_press.py,
observed_attention_press.py, pyramidkv_press.py. Instead of re-projecting
hidden states through module weights (reference ``compute_window_attention``,
snapkv_press.py:41-69), the runner hands post-RoPE queries straight to the
press via LayerCtx, and window attention is a small masked matmul.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import window_attention_probs
from .base import LayerCtx, ScorerPress


def avg_pool_1d(x: jax.Array, kernel: int) -> jax.Array:
    """torch.F.avg_pool1d(stride=1, padding=k//2, count_include_pad=True)."""
    assert kernel % 2 == 1, "kernel_size must be odd"
    pad = kernel // 2
    pads = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, pads)
    window = (1,) * (x.ndim - 1) + (kernel,)
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, window, (1,) * x.ndim, "VALID"
    )
    return summed / kernel


def group_mean(scores: jax.Array, num_kv_heads: int) -> jax.Array:
    """(B, Hq, S) → per-GQA-group mean (B, Hkv, S)."""
    B, Hq, S = scores.shape
    return scores.reshape(B, num_kv_heads, Hq // num_kv_heads, S).mean(axis=2)


@dataclasses.dataclass(frozen=True)
class SnapKVPress(ScorerPress):
    """Mean attention of the last ``window_size`` queries onto earlier keys,
    avg-pooled, group-averaged; window force-kept via max-pad."""

    window_size: int = 64
    kernel_size: int = 5

    def window_scores(self, ctx: LayerCtx, keys, window_size: int) -> jax.Array:
        """(B, Hq, window, S) probs of the last-``window_size`` queries."""
        S = keys.shape[2]
        q_win = ctx.queries[:, :, S - window_size :]
        prior = jnp.asarray(S - window_size, jnp.int32)
        return window_attention_probs(q_win, keys, ctx.scale, prior)

    # Above this length the W×S probs matrix is replaced by a chunked
    # column-mean (O(W·chunk) memory — the 128K enabler): one sweep when the
    # flash prefill's row LSE is available (wants_lse → ctx.attn_lse), two
    # otherwise.
    chunked_threshold = 8192

    def wants_lse(self, q_len: int) -> bool:
        return q_len >= self.chunked_threshold

    def score(self, ctx: LayerCtx, keys, values):
        from ..ops.attention import (
            chunked_window_probs_mean, window_probs_mean_from_lse,
        )

        B, Hkv, S, _ = keys.shape
        W = self.window_size
        assert S > W, f"Query length {S} should be greater than the window size {W}"
        if ctx.attn_probs is not None:
            attn = ctx.attn_probs[..., S - W :, : S - W].astype(jnp.float32)
            scores = attn.mean(axis=-2)                   # (B, Hq, S-W)
        elif ctx.attn_lse is not None:
            scores = window_probs_mean_from_lse(
                ctx.queries[:, :, S - W :], keys,
                ctx.attn_lse[:, :, S - W :], ctx.scale,
                jnp.asarray(S - W, jnp.int32),
                softcap=ctx.cfg.logit_softcap,
            )[..., : S - W]
        elif S >= self.chunked_threshold:
            scores = chunked_window_probs_mean(
                ctx.queries[:, :, S - W :], keys, ctx.scale,
                jnp.asarray(S - W, jnp.int32),
            )[..., : S - W]
        else:
            attn = self.window_scores(ctx, keys, W)[..., : S - W]
            scores = attn.mean(axis=-2)                   # (B, Hq, S-W)
        scores = avg_pool_1d(scores, self.kernel_size)
        scores = group_mean(scores, Hkv)                  # (B, Hkv, S-W)
        maxv = jnp.max(scores) + 1.0
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, W)), constant_values=0.0)
        window_region = jnp.arange(S)[None, None] >= S - W
        return jnp.where(window_region, maxv, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Traced-length variant: the observation window is the last W valid
        slots before ``length``. In bucketed prefill the post-RoPE queries are
        available directly (dynamic slice); in the decode loop they are
        re-projected from the press's hidden-state ring buffer (reference
        DecodingPress passes buffered hidden states to SnapKV.score)."""
        from .decoding import _buffer_queries

        B, Hkv, S, _ = keys.shape
        if ctx.queries.shape[2] == S:
            # Bucketed prefill: queries aligned with cache slots.
            W = min(self.window_size, S)
            q_win = jax.lax.dynamic_slice_in_dim(
                ctx.queries, length - W, W, axis=2
            )
        else:
            W = min(self.window_size, ctx.hidden.shape[1])
            q_win = _buffer_queries(ctx, ctx.hidden[:, -W:], ctx.positions[:, -W:])
        prior = length - W
        attn = window_attention_probs(q_win, keys, ctx.scale, prior)
        scores = attn.mean(axis=-2)                       # (B, Hq, S)
        # Zero the window region before pooling so the boundary sees the same
        # zero-padding as the exact-length path (which pools on [0, S-W)).
        pos = jnp.arange(S)[None, None]
        scores = jnp.where(pos >= length - W, 0.0, scores)
        scores = avg_pool_1d(scores, self.kernel_size)
        scores = group_mean(scores, Hkv)
        maxv = jnp.max(scores) + 1.0
        window_region = (pos >= length - W) & (pos < length)
        return jnp.where(window_region, maxv, scores)


@dataclasses.dataclass(frozen=True)
class TOVAPress(ScorerPress):
    """Attention of the last token, mean over *all* query heads, shared across
    kv heads (reference tova_press.py:44-60)."""

    def score(self, ctx: LayerCtx, keys, values):
        B, Hkv, S, _ = keys.shape
        if ctx.attn_probs is not None:
            attn = ctx.attn_probs[..., -1:, :-1].astype(jnp.float32)
        else:
            q_win = ctx.queries[:, :, -1:]
            prior = jnp.asarray(S - 1, jnp.int32)
            attn = window_attention_probs(q_win, keys, ctx.scale, prior)[..., :-1]
        scores = attn.mean(axis=1)[:, 0]                  # (B, S-1)
        scores = jnp.broadcast_to(scores[:, None], (B, Hkv, S - 1))
        maxv = jnp.max(scores) + 1.0
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, 1)))
        last = jnp.arange(S)[None, None] == S - 1
        return jnp.where(last, maxv, scores)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Traced-length variant for bucketed prefill: attention of the last
        *valid* token."""
        B, Hkv, S, _ = keys.shape
        q_last = jax.lax.dynamic_slice_in_dim(ctx.queries, length - 1, 1, axis=2)
        attn = window_attention_probs(q_last, keys, ctx.scale, length - 1)
        scores = attn.mean(axis=1)[:, 0]                   # (B, S)
        scores = jnp.broadcast_to(scores[:, None], (B, Hkv, S))
        maxv = jnp.max(scores) + 1.0
        last = jnp.arange(S)[None, None] == length - 1
        return jnp.where(last, maxv, scores)


@dataclasses.dataclass(frozen=True)
class ObservedAttentionPress(ScorerPress):
    """Column mean of the actual prefill attention matrix, normalized by the
    number of queries that could see each key (observed_attention_press.py:34-49).

    Below ``chunked_threshold`` tokens the runner materializes probs (the
    eager-equivalent path). Above it — or whenever probs are unavailable, e.g.
    under the flash kernel or inside a wrapper press — the same column sums
    are recomputed from post-RoPE queries in query chunks without the S×S
    matrix (ops/attention.py chunked_observed_colsums): O(Hq·chunk·S) memory,
    which is what makes ObservedAttention usable at 128K."""

    needs_attn_probs = True
    chunked_threshold = 8192

    def wants_probs(self, q_len: int) -> bool:
        return q_len < self.chunked_threshold

    def wants_lse(self, q_len: int) -> bool:
        # Above the probs threshold the flash prefill pass emits row LSE so
        # the colsum kernel skips its own LSE sweep (one MXU pass saved).
        return not self.wants_probs(q_len)

    def score(self, ctx: LayerCtx, keys, values):
        from ..ops.attention import chunked_observed_colsums

        B, Hkv, S, _ = keys.shape
        if ctx.attn_probs is not None:
            # Probs columns span the whole cache BUFFER, which may be larger
            # than the S tokens being compressed (pipeline pre-sizes the
            # buffer for the answer) — keep the first S columns.
            attn = ctx.attn_probs[..., :S].astype(jnp.float32)  # (B, Hq, S, S)
            scores = attn.sum(axis=2)                      # (B, Hq, S)
        elif jax.default_backend() == "tpu":
            # Fused Pallas path: logits never leave VMEM (the XLA chunked
            # sweep is HBM-bound — 11.3s vs 2.1s whole-prefill at 32K/16L).
            # With ctx.attn_lse from the flash prefill pass, only the colsum
            # sweep runs.
            from ..ops.observed_colsum import observed_colsums_flash

            scores = observed_colsums_flash(
                ctx.queries, keys, ctx.attn_lse,
                sm_scale=ctx.scale, softcap=ctx.cfg.logit_softcap,
            )
        else:
            Hq = ctx.queries.shape[1]
            # Cap the chunk so the in-flight logits block stays ≲128 MB f32.
            chunk = max(8, min(128, (32 << 20) // max(1, Hq * S)))
            scores = chunked_observed_colsums(
                ctx.queries, keys, ctx.scale,
                softcap=ctx.cfg.logit_softcap, chunk=chunk,
            )
        n_in_sum = jnp.arange(S, 0, -1, dtype=jnp.float32)
        scores = scores / n_in_sum[None, None]
        return group_mean(scores, Hkv)

    def dynamic_score(self, ctx: LayerCtx, keys, values, length):
        """Bucketed prefill: only the first ``length`` queries are observers
        and the normalizer is the number of VALID queries that could see each
        key (length - j). Pad slots are masked by the caller."""
        from ..ops.attention import chunked_observed_colsums

        B, Hkv, S, _ = keys.shape
        Hq = ctx.queries.shape[1]
        chunk = max(8, min(128, (32 << 20) // max(1, Hq * S)))
        scores = chunked_observed_colsums(
            ctx.queries, keys, ctx.scale,
            softcap=ctx.cfg.logit_softcap, chunk=chunk, valid_len=length,
        )
        n_in_sum = jnp.maximum(
            length.astype(jnp.float32) - jnp.arange(S, dtype=jnp.float32), 1.0
        )
        scores = scores / n_in_sum[None, None]
        return group_mean(scores, Hkv)


@dataclasses.dataclass(frozen=True)
class PyramidKVPress(SnapKVPress):
    """SnapKV scoring + per-layer budget pyramid (pyramidkv_press.py:47-112)."""

    beta: int = 20

    def _budgets(self, q_len: int, num_layers: int) -> list[int]:
        assert self.beta >= 1, "Beta should >= 1"
        max_capacity = self.window_size + q_len * (1 - self.compression_ratio)
        min_num = (max_capacity - self.window_size) / self.beta
        max_num = (max_capacity - self.window_size) * 2 - min_num
        if max_num >= q_len - self.window_size:
            max_num = q_len - self.window_size
            min_num = (max_capacity - self.window_size) * 2 - max_num
        if not (q_len >= max_num >= min_num >= self.window_size):
            fallback = round(q_len * (1 - self.compression_ratio))
            return [fallback] * num_layers
        steps = (max_num - min_num) / (num_layers - 1) if num_layers > 1 else 0.0
        return [round(max_num - i * steps) for i in range(num_layers)]

    def max_kept(self, seq_len: int, cfg) -> int:
        return max(self._budgets(seq_len, cfg.num_layers))

    def exact_kept(self, seq_len: int):
        return None  # layer-dependent budget

    def budget(self, ctx: LayerCtx, seq_len: int) -> jax.Array:
        budgets = jnp.asarray(
            np.asarray(self._budgets(seq_len, ctx.cfg.num_layers), np.int32)
        )
        return budgets[ctx.layer_idx]

    def dynamic_budget(self, ctx: LayerCtx, length) -> jax.Array:
        """Traced-length pyramid (bucketed prefill): the same arithmetic as
        _budgets with the branches as jnp.where selects. Rounding matches
        numpy's round-half-even, like the reference's python round()."""
        L = ctx.cfg.num_layers
        q = length.astype(jnp.float32)
        w = jnp.float32(self.window_size)
        max_capacity = w + q * (1 - self.compression_ratio)
        min_num = (max_capacity - w) / self.beta
        max_num = (max_capacity - w) * 2 - min_num
        clamp = max_num >= q - w
        max_num = jnp.where(clamp, q - w, max_num)
        min_num = jnp.where(clamp, (max_capacity - w) * 2 - max_num, min_num)
        ok = (q >= max_num) & (max_num >= min_num) & (min_num >= w)
        fallback = jnp.round(q * (1 - self.compression_ratio))
        steps = jnp.where(L > 1, (max_num - min_num) / max(L - 1, 1), 0.0)
        i = ctx.layer_idx.astype(jnp.float32)
        pyramid = jnp.round(max_num - i * steps)
        return jnp.maximum(jnp.where(ok, pyramid, fallback), 1).astype(jnp.int32)
