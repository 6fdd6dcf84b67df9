"""Wrapper presses: AdaKV, CriticalKV/CriticalAdaKV, KeyRerotation, Chunk,
ChunkKV, Block, Composed, PerLayerCompression, ThinK.

Reference: kvpress/presses/{adakv,criticalkv,key_rerotation,chunk,chunkkv,
block,composed,per_layer_compression,think}_press.py. Head-wise eviction
(AdaKV family) flips bits in the cache keep-mask consumed by the attention
kernel as additive -inf bias — replacing the reference's fake-key
monkey-patch (attention_patch.py:43-87) with something strictly cheaper.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..rope import rotate_half
from .base import NEG_INF, BasePress, LayerCtx, ScorerPress, topk_keep

BIG = jnp.finfo(jnp.float32).max


# ---------------------------------------------------------------------- #
# Chunked-prefill composition (Runner.prefill_chunked host-loop compression,
# models/llama._compress_layer). Wrapper presses implement
# ``chunked_compress`` / ``chunked_compress_quantized``: one layer's FULL
# buffer with a traced valid ``length``, scored from the trailing-window
# LayerCtx (the decode-press scoring contract — press.dynamic_score against
# window queries re-projected from the hidden window). Selection is
# rank-based (double argsort: traced budgets, no scatters — scatters are
# fine in the per-layer host loop but ranks keep selection identical to the
# one-shot path's tie-breaking). The quantized variants dequantize ONE
# layer as a transient for scoring and gather kept entries at payload
# width (scales ride the same gather); only rerotated keys requantize.
#
# Exactness contract (same as the ScorerPress chunked path,
# models/llama.py prefill_chunked docstring): content scorers score
# identically to the one-shot path; window scorers match when their
# observation window fits the scoring window.


def _rank_desc(scores: jax.Array) -> jax.Array:
    """Per-row rank of each element in descending-score order (rank 0 =
    highest). ``rank < k`` selects the same set as top_k with k traced."""
    return jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)


def _dyn_budget(length: jax.Array, ratio: float) -> jax.Array:
    """Traced kept count, same float32 floor convention as
    ScorerPress.dynamic_budget."""
    return jnp.maximum(
        (length.astype(jnp.float32) * (1.0 - ratio)).astype(jnp.int32), 1
    )


def _window_scores(press: ScorerPress, ctx: LayerCtx, keys, values, length):
    """Scores from the trailing-window ctx with invalid slots at NEG_INF.
    Returns (scores (B,H,S) f32, valid (1,1,S) bool)."""
    S = keys.shape[2]
    dctx = dataclasses.replace(ctx, kv_len=length)
    scores = press.dynamic_score(dctx, keys, values, length).astype(jnp.float32)
    valid = jnp.arange(S)[None, None] < length
    return jnp.where(valid, scores, NEG_INF), valid


def _compact_order(keep: jax.Array) -> jax.Array:
    """Stable front-compaction order for a keep mask (kept entries first,
    original relative order preserved)."""
    return jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)


def _gather_seq(arrs, order):
    """take_along_axis over the sequence axis (2) for each array."""
    return tuple(
        None if a is None else jnp.take_along_axis(a, order[..., None], axis=2)
        for a in arrs
    )


def _slice_seq(ctx: LayerCtx, start: int, size: int) -> LayerCtx:
    """Ctx with hidden/queries/positions sliced to [start, start+size)."""
    return dataclasses.replace(
        ctx,
        hidden=ctx.hidden[:, start : start + size],
        queries=ctx.queries[:, :, start : start + size],
        queries_prerope=ctx.queries_prerope[:, :, start : start + size],
        keys_prerope=ctx.keys_prerope[:, :, start : start + size],
        positions=ctx.positions[:, start : start + size],
        attn_probs=None,
    )


def compact_by_mask(keys, values, keep: jax.Array):
    """Move kept (True) entries to the buffer front via stable argsort.

    keep: (B, H, S) bool. Returns (keys, values, length ()) where length is
    the minimum kept count across heads (uniform for the supported callers).
    """
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    k2 = jnp.take_along_axis(keys, order[..., None], axis=2)
    v2 = jnp.take_along_axis(values, order[..., None], axis=2)
    length = jnp.min(jnp.sum(keep, axis=-1)).astype(jnp.int32)
    return k2, v2, length


def compact_headwise(keys, values, keep: jax.Array):
    """Per-head compaction of a head-wise keep mask: each (batch, head) row's
    kept entries move to the buffer front; the returned mask marks each head's
    valid prefix and ``length`` is the max prefix (so a host-level shrink to
    ``length`` realizes the memory saving that the reference's fake eviction
    never can, attention_patch.py:47). Returns (keys, values, length, mask)."""
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    k2 = jnp.take_along_axis(keys, order[..., None], axis=2)
    v2 = jnp.take_along_axis(values, order[..., None], axis=2)
    counts = jnp.sum(keep, axis=-1)                         # (B, H)
    S = keys.shape[2]
    new_mask = jnp.arange(S)[None, None, :] < counts[..., None]
    length = jnp.max(counts).astype(jnp.int32)
    return k2, v2, length, new_mask


@dataclasses.dataclass(frozen=True)
class AdaKVPress(BasePress):
    """Head-wise budget allocation (reference adakv_press.py:53-78): per-head
    safeguard top-`alpha*n_kept` pinned, then global bottom-k across
    heads×seq flattened scores — pruned slots become mask=False."""

    press: ScorerPress = None
    alpha_safeguard: float = 0.20
    # Per-head compaction after masking: kept entries move to each head's
    # buffer front so the buffer can shrink to the max head budget — a real
    # memory/bandwidth saving unavailable to the reference's fake eviction.
    # Off by default to keep the exact reference-observable mask layout.
    compact: bool = False

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress), "AdaKVPress requires a ScorerPress"
        assert 0 <= self.alpha_safeguard <= 1

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def masked_scores(self, ctx, keys, values) -> jax.Array:
        """Scores after the per-head safeguard pinning.

        Selection is threshold-based (rank via double argsort) instead of
        scatter: XLA scatters inside the layer scan compile pathologically
        slowly on TPU at long context, and ranks are tie-exact."""
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        S = keys.shape[2]
        n_kept = int(S * (1 - self.compression_ratio))
        n_safe = int(n_kept * self.alpha_safeguard)
        if n_safe > 0:
            rank = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
            scores = jnp.where(rank < n_safe, BIG, scores)
        return scores

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        B, H, S, _ = keys.shape
        scores = self.masked_scores(ctx, keys, values)
        n_kept = int(S * (1 - self.compression_ratio))
        # Global keep = top n_kept*H across heads×seq, by flat rank.
        flat = scores.reshape(B, H * S)
        flat_rank = jnp.argsort(jnp.argsort(-flat, axis=-1), axis=-1)
        keep_flat = flat_rank < n_kept * H
        new_mask = mask & keep_flat.reshape(B, H, S)
        if self.compact:
            keys, values, length, new_mask = compact_headwise(
                keys, values, new_mask
            )
        return keys, values, length, new_mask, state

    # -- chunked-prefill composition (traced length, window scoring) ------ #

    headwise_mask = True      # the cache must carry a materialized keep-mask

    def _chunked_keep(self, ctx, keys, values, length, mask):
        """Head-wise keep mask with traced budgets: per-head safeguard pin
        (rank < n_safe), then global top n_kept*H across heads×seq. Invalid
        slots (NEG_INF) can never be pinned or kept: their per-head rank is
        >= length >= n_kept >= n_safe and per-head valid slots alone fill
        the global budget."""
        scores, _ = _window_scores(self.press, ctx, keys, values, length)
        B, H, S, _ = keys.shape
        n_kept = _dyn_budget(length, self.compression_ratio)
        n_safe = (n_kept.astype(jnp.float32)
                  * self.alpha_safeguard).astype(jnp.int32)
        rank = _rank_desc(scores)
        scores = jnp.where(rank < n_safe, BIG, scores)
        flat_rank = _rank_desc(scores.reshape(B, H * S))
        keep = (flat_rank < n_kept * H).reshape(B, H, S)
        return mask & keep

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask
        keep = self._chunked_keep(ctx, keys, values, length, mask)
        if not self.compact:
            return keys, values, length, keep
        k2, v2, nlen, nmask = compact_headwise(keys, values, keep)
        return k2, v2, nlen, nmask

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv

        if self.compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        vd = dequantize_kv(values, value_scales, bits, dt)
        keep = self._chunked_keep(ctx, kd, vd, length, mask)
        if not self.compact:
            return keys, values, key_scales, value_scales, length, keep
        order = _compact_order(keep)
        keys, values, key_scales, value_scales = _gather_seq(
            (keys, values, key_scales, value_scales), order
        )
        counts = jnp.sum(keep, axis=-1)
        S = keep.shape[-1]
        new_mask = jnp.arange(S)[None, None, :] < counts[..., None]
        return (keys, values, key_scales, value_scales,
                jnp.max(counts).astype(jnp.int32), new_mask)


class WrappedScorerMixin:
    """ScorerPress behavior with compression_ratio delegated to the wrapped
    press (reference wrappers expose the same property passthrough).

    ``scorer_like = True`` admits these wrappers to every ScorerPress code
    path that scores-then-keeps (chunked prefill via BudgetDecodingPress,
    bucketed prefill budgets)."""

    scorer_like = True
    supports_padding = True

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def n_kept(self, seq_len: int) -> int:
        return max(1, int(seq_len * (1 - self.compression_ratio)))

    def max_kept(self, seq_len: int, cfg) -> int:
        return self.n_kept(seq_len)

    def exact_kept(self, seq_len: int):
        return self.n_kept(seq_len)

    def budget(self, ctx, seq_len: int):
        return jnp.asarray(self.n_kept(seq_len), jnp.int32)

    def dynamic_budget(self, ctx, length):
        return _dyn_budget(length, self.compression_ratio)

    def dynamic_score(self, ctx, keys, values, length):
        """Traced-length fallback: plain score (sufficient when the wrapped
        scorer is content-based; window scorers come through the wrapped
        press's own dynamic_score in subclass overrides)."""
        return self.score(ctx, keys, values)

    layer_compress = ScorerPress.layer_compress


@dataclasses.dataclass(frozen=True)
class CriticalKVPress(WrappedScorerMixin, BasePress):
    """Two-stage rescale by ||Wo·v||_1 (reference criticalkv_press.py:17-94)."""

    press: ScorerPress = None
    epsilon: float = 1e-4
    first_stage_ratio: float = 0.5

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress), "CriticalKVPress requires a ScorerPress"

    @staticmethod
    def vwl1norm(ctx: LayerCtx, values: jax.Array) -> jax.Array:
        """(B, Hkv, S): group-mean of ||Wo_head · v||_1 (criticalkv:57-76)."""
        B, Hkv, S, D = values.shape
        cfg = ctx.cfg
        Hq = cfg.num_heads
        G = Hq // Hkv
        from ..models.llama import dequant_weight

        Wo = dequant_weight(ctx.layer_params, "wo", jnp.float32).reshape(
            Hq, D, cfg.hidden_size
        )
        v = jnp.broadcast_to(values[:, :, None], (B, Hkv, G, S, D)).reshape(B, Hq, S, D)
        wov = jnp.einsum(
            "bhsd,hde->bhse", v.astype(jnp.float32), Wo.astype(jnp.float32)
        )
        norm = jnp.sum(jnp.abs(wov), axis=-1)            # (B, Hq, S)
        return norm.reshape(B, Hkv, G, S).mean(axis=2)

    def score(self, ctx, keys, values):
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        S = keys.shape[2]
        budget = int((1 - self.compression_ratio) * S * self.first_stage_ratio)
        if budget > 0:
            _, top_idx = jax.lax.top_k(scores, budget)
        projected = self.vwl1norm(ctx, values)
        scores = (scores + self.epsilon) * projected
        if budget > 0:
            scores = jnp.put_along_axis(scores, top_idx, BIG, axis=-1, inplace=False)
        return scores

    def dynamic_score(self, ctx, keys, values, length):
        """Traced-length variant (chunked/bucketed prefill): the first-stage
        pin budget derives from the traced valid length and selection is
        rank-based; invalid slots are NEG_INF-masked BEFORE the pin so pad
        slots never consume stage-1 budget, and re-masked after the rescale
        (zero pad values make ||Wo·v||=0 → NEG_INF·0 = NaN otherwise)."""
        base, valid = _window_scores(self.press, ctx, keys, values, length)
        budget = ((1 - self.compression_ratio) * self.first_stage_ratio
                  * length.astype(jnp.float32)).astype(jnp.int32)
        rank = _rank_desc(base)
        projected = self.vwl1norm(ctx, values)
        scores = (base + self.epsilon) * projected
        scores = jnp.where(rank < budget, BIG, scores)
        return jnp.where(valid, scores, NEG_INF)


@dataclasses.dataclass(frozen=True)
class CriticalAdaKVPress(BasePress):
    """CriticalKV rescoring + AdaKV head-wise budgets
    (reference criticalkv_press.py:137-194)."""

    press: ScorerPress = None
    alpha_safeguard: float = 0.20
    epsilon: float = 1e-4
    first_stage_ratio: float = 0.5
    compact: bool = False     # per-head compaction (see AdaKVPress.compact)

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)
        assert 0 <= self.alpha_safeguard <= 1

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        B, H, S, _ = keys.shape
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        n_kept = int(S * (1 - self.compression_ratio))
        n_safe = int(n_kept * self.alpha_safeguard)
        if n_safe > 0:
            rank0 = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
            scores = jnp.where(rank0 < n_safe, BIG, scores)

        # Head budgets: count of each head's slots in the global top n_kept*H
        # (rank-based — scatters compile pathologically in the layer scan).
        flat = scores.reshape(B, H * S)
        flat_rank = jnp.argsort(jnp.argsort(-flat, axis=-1), axis=-1)
        top_mask = flat_rank < n_kept * H
        head_budgets = jnp.sum(top_mask.reshape(B, H, S), axis=(0, 2))   # (H,)

        # Stage 1: pin per-head top int(budget * first_stage_ratio) by rank.
        desc = jnp.argsort(-scores, axis=-1)
        rank = jnp.argsort(desc, axis=-1)                                # (B,H,S)
        stage1 = (head_budgets.astype(jnp.float32) * self.first_stage_ratio).astype(jnp.int32)
        scores = jnp.where(rank < stage1[None, :, None], BIG, scores)

        # Stage 2: rescale by ||Wo·v||_1, pin per-head top head_budget.
        projected = CriticalKVPress.vwl1norm(ctx, values)
        scores = (scores + self.epsilon) * projected
        desc = jnp.argsort(-scores, axis=-1)
        rank = jnp.argsort(desc, axis=-1)
        scores = jnp.where(rank < head_budgets[None, :, None], BIG, scores)

        # Global keep = top n_kept*H by flat rank.
        flat = scores.reshape(B, H * S)
        flat_rank = jnp.argsort(jnp.argsort(-flat, axis=-1), axis=-1)
        keep_flat = flat_rank < n_kept * H
        new_mask = mask & keep_flat.reshape(B, H, S)
        if self.compact:
            keys, values, length, new_mask = compact_headwise(
                keys, values, new_mask
            )
        return keys, values, length, new_mask, state

    # -- chunked-prefill composition (traced length, window scoring) ------ #

    headwise_mask = True

    def _chunked_keep(self, ctx, keys, values, length, mask):
        """layer_compress's selection with traced budgets: safeguard pin,
        head budgets from the global top, two-stage CriticalKV rescale, then
        the global keep — all rank-based. Invalid slots NEG_INF throughout
        (re-masked after the rescale: zero pad values give ||Wo·v||=0 and
        NEG_INF·0 = NaN)."""
        scores, valid = _window_scores(self.press, ctx, keys, values, length)
        B, H, S, _ = keys.shape
        n_kept = _dyn_budget(length, self.compression_ratio)
        n_safe = (n_kept.astype(jnp.float32)
                  * self.alpha_safeguard).astype(jnp.int32)
        rank0 = _rank_desc(scores)
        scores = jnp.where(rank0 < n_safe, BIG, scores)

        flat_rank = _rank_desc(scores.reshape(B, H * S))
        top_mask = flat_rank < n_kept * H
        head_budgets = jnp.sum(top_mask.reshape(B, H, S), axis=(0, 2))  # (H,)

        rank = _rank_desc(scores)
        stage1 = (head_budgets.astype(jnp.float32)
                  * self.first_stage_ratio).astype(jnp.int32)
        scores = jnp.where(rank < stage1[None, :, None], BIG, scores)

        projected = CriticalKVPress.vwl1norm(ctx, values)
        scores = (scores + self.epsilon) * projected
        scores = jnp.where(valid, scores, NEG_INF)
        rank = _rank_desc(scores)
        scores = jnp.where(rank < head_budgets[None, :, None], BIG, scores)

        flat_rank = _rank_desc(scores.reshape(B, H * S))
        keep = (flat_rank < n_kept * H).reshape(B, H, S)
        return mask & keep

    chunked_compress = AdaKVPress.chunked_compress
    chunked_compress_quantized = AdaKVPress.chunked_compress_quantized


@dataclasses.dataclass(frozen=True)
class KeyRerotationPress(BasePress):
    """Re-rotate kept keys to contiguous RoPE positions
    (reference key_rerotation_press.py:50-152)."""

    press: ScorerPress = None
    rerotates = True

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def max_kept(self, seq_len: int, cfg) -> int:
        return self.press.max_kept(seq_len, cfg)

    def exact_kept(self, seq_len: int):
        return self.press.exact_kept(seq_len)

    @staticmethod
    def rerotate(keys_kept: jax.Array, idx: jax.Array, inv_freq: jax.Array):
        """keys_kept: (B,H,n,D) gathered at sorted idx (B,H,n). Rotate by
        delta = new_pos - old_pos in fp32 (reference :50-98)."""
        n = idx.shape[-1]
        new_pos = jnp.arange(n, dtype=jnp.float32)[None, None]
        delta = new_pos - idx.astype(jnp.float32)           # (B,H,n)
        freqs = delta[..., None] * inv_freq[None, None, None, :]
        emb = jnp.concatenate([freqs, freqs], axis=-1)      # (B,H,n,D)
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        kf = keys_kept.astype(jnp.float32)
        return (kf * cos + rotate_half(kf) * sin).astype(keys_kept.dtype)

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        S = keys.shape[2]
        n_kept = self.press.n_kept(S)
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        _, idx = jax.lax.top_k(scores, n_kept)
        idx = jnp.sort(idx, axis=-1)
        kept_k = jnp.take_along_axis(keys, idx[..., None], axis=2)
        kept_v = jnp.take_along_axis(values, idx[..., None], axis=2)
        kept_k = self.rerotate(kept_k, idx, ctx.inv_freq)
        keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
        B, H = keys.shape[:2]
        new_mask = jnp.ones((B, H, S), bool)
        return keys, values, jnp.asarray(n_kept, jnp.int32), new_mask, state

    # -- chunked-prefill composition (traced length, window scoring) ------ #

    def _chunked_order(self, ctx, keys, values, length):
        """Kept slots (rank < traced budget) compacted to the front in
        POSITION order — exactly the one-shot path's sorted-idx gather.
        Returns (order (B,H,S), n_kept ())."""
        scores, _ = _window_scores(self.press, ctx, keys, values, length)
        S = keys.shape[2]
        n_kept = _dyn_budget(length, self.compression_ratio)
        keep = _rank_desc(scores) < n_kept
        pos = jnp.broadcast_to(jnp.arange(S)[None, None], keep.shape)
        order = jnp.argsort(jnp.where(keep, pos, S + pos), axis=-1)
        return order, n_kept

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask
        order, n_kept = self._chunked_order(ctx, keys, values, length)
        k2, v2 = _gather_seq((keys, values), order)
        # new position of the slot now at j is j itself; garbage beyond
        # n_kept is rerotated too but sits past the valid length.
        k2 = self.rerotate(k2, order, ctx.inv_freq)
        B, H, S = mask.shape
        return k2, v2, n_kept, jnp.ones((B, H, S), bool)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv, quantize_kv

        if self.compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        vd = dequantize_kv(values, value_scales, bits, dt)
        order, n_kept = self._chunked_order(ctx, kd, vd, length)
        # Keys change value under rerotation → requantize (keys only);
        # values gather at payload width.
        kd2 = jnp.take_along_axis(kd, order[..., None], axis=2)
        kd2 = self.rerotate(kd2, order, ctx.inv_freq)
        k2, ks2 = quantize_kv(kd2, bits)
        v2, vs2 = _gather_seq((values, value_scales), order)
        B, H, S = mask.shape
        return k2, v2, ks2, vs2, n_kept, jnp.ones((B, H, S), bool)


@dataclasses.dataclass(frozen=True)
class ChunkPress(BasePress):
    """Score+top-k independently per chunk (reference chunk_press.py:50-87)."""

    press: ScorerPress = None
    chunk_length: int = 1024

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def _kept_per_chunk(self, S: int) -> list[tuple[int, int, int]]:
        out = []
        for start in range(0, S, self.chunk_length):
            size = min(self.chunk_length, S - start)
            out.append((start, size, max(1, int(size * (1 - self.compression_ratio)))))
        return out

    def max_kept(self, seq_len: int, cfg) -> int:
        return sum(n for _, _, n in self._kept_per_chunk(seq_len))

    def exact_kept(self, seq_len: int):
        return self.max_kept(seq_len, None)

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        S = keys.shape[2]
        all_idx = []
        for start, size, n_keep in self._kept_per_chunk(S):
            sub_ctx = _slice_seq(ctx, start, size)
            sub_scores = self.press.score(
                sub_ctx,
                keys[:, :, start : start + size],
                values[:, :, start : start + size],
            ).astype(jnp.float32)
            _, idx = jax.lax.top_k(sub_scores, n_keep)
            all_idx.append(start + idx)
        idx = jnp.concatenate(all_idx, axis=-1)
        kept_k = jnp.take_along_axis(keys, idx[..., None], axis=2)
        kept_v = jnp.take_along_axis(values, idx[..., None], axis=2)
        n = idx.shape[-1]
        keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
        B, H = keys.shape[:2]
        return (
            keys, values, jnp.asarray(n, jnp.int32),
            jnp.ones((B, H, S), bool), state,
        )

    # -- chunked-prefill composition (traced length, window scoring) ------ #
    # Exact for content scorers (per-position scores identical to the
    # one-shot path's per-chunk sliced scoring); window scorers score the
    # whole buffer from the trailing window here, where the one-shot path
    # gives each chunk its own local window — supported but not
    # bit-identical (same contract as prefill_chunked's scorer note).

    def _chunked_keep(self, ctx, keys, values, length):
        """Per-chunk rank selection with traced per-chunk budgets. A chunk
        that starts past ``length`` keeps 0; the partial boundary chunk
        budgets from its traced valid size (one-shot floor convention).
        Returns (keep (B,H,S), total ())."""
        scores, _ = _window_scores(self.press, ctx, keys, values, length)
        S = keys.shape[2]
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
        keep = jnp.concatenate(pieces, axis=-1)
        return keep, total

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask
        keep, total = self._chunked_keep(ctx, keys, values, length)
        order = _compact_order(keep)
        k2, v2 = _gather_seq((keys, values), order)
        B, H, S = mask.shape
        return k2, v2, total, jnp.ones((B, H, S), bool)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv

        if self.compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        vd = dequantize_kv(values, value_scales, bits, dt)
        keep, total = self._chunked_keep(ctx, kd, vd, length)
        order = _compact_order(keep)
        k2, v2, ks2, vs2 = _gather_seq(
            (keys, values, key_scales, value_scales), order
        )
        B, H, S = mask.shape
        return k2, v2, ks2, vs2, total, jnp.ones((B, H, S), bool)


@dataclasses.dataclass(frozen=True)
class ChunkKVPress(BasePress):
    """Keep whole top-scoring chunks (reference chunkkv_press.py:51-125).
    Chunk scores are head-summed global scores averaged within chunks."""

    press: ScorerPress = None
    chunk_length: int = 20

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def max_kept(self, seq_len: int, cfg) -> int:
        n_complete = seq_len // self.chunk_length
        rem = seq_len % self.chunk_length
        if n_complete == 0:
            return self.press.max_kept(seq_len, cfg)
        n_chunks = max(1, int((n_complete + (rem > 0)) * (1 - self.compression_ratio)))
        return min(seq_len, n_chunks * self.chunk_length)

    def exact_kept(self, seq_len: int):
        return None  # depends on whether the partial tail chunk is selected

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        S = keys.shape[2]
        cl = self.chunk_length
        n_complete = S // cl
        rem = S % cl
        if n_complete == 0:
            return self.press.layer_compress(ctx, keys, values, length, mask, state)
        B, H = keys.shape[:2]
        global_scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        main = global_scores[..., : n_complete * cl].sum(axis=1)
        chunk_scores = main.reshape(B, n_complete, cl).mean(axis=-1)     # (B, nc)
        if rem > 0:
            tail = global_scores[..., -rem:].sum(axis=1).mean(axis=-1, keepdims=True)
            chunk_scores = jnp.concatenate([chunk_scores, tail], axis=-1)
        n_chunks_total = n_complete + (1 if rem > 0 else 0)
        n_chunks_kept = max(1, int(n_chunks_total * (1 - self.compression_ratio)))
        _, top_chunks = jax.lax.top_k(chunk_scores, n_chunks_kept)       # (B, nk)

        # Token keep-mask: chunk membership of each position.
        pos_chunk = jnp.minimum(jnp.arange(S) // cl, n_chunks_total - 1)  # (S,)
        keep_b = (pos_chunk[None, :, None] == top_chunks[:, None, :]).any(-1)  # (B,S)
        keep = jnp.broadcast_to(keep_b[:, None], (B, H, S))
        k2, v2, n = compact_by_mask(keys, values, keep)
        return (
            k2, v2, n, jnp.ones((B, H, S), bool), state,
        )

    # -- chunked-prefill composition (models/llama._compress_layer) ------- #
    # Traced-length form of the same selection: per-chunk masked means over
    # the valid prefix (the partial tail chunk's mean over its real count ==
    # the one-shot tail handling), traced chunk budget, rank-based keep
    # (stable argsort tie-break == lax.top_k's lowest-index-wins).

    def _chunked_keep(self, ctx, keys, values, length, mask):
        S = keys.shape[2]
        cl = self.chunk_length
        B, H = keys.shape[:2]
        scores, valid = _window_scores(self.press, ctx, keys, values, length)
        gl = jnp.where(valid, scores, 0.0).sum(axis=1)       # (B, S) head-sum
        N_buf = -(-S // cl)
        pad = N_buf * cl - S
        glp = jnp.pad(gl, ((0, 0), (0, pad)))
        vcount = jnp.pad(valid[0, 0].astype(jnp.float32), ((0, pad),))
        per_chunk = glp.reshape(B, N_buf, cl).sum(-1)
        counts = vcount.reshape(N_buf, cl).sum(-1)           # (N_buf,)
        chunk_scores = jnp.where(
            counts > 0, per_chunk / jnp.maximum(counts, 1.0)[None], NEG_INF
        )
        n_total = -(-length // cl)                           # traced ceil
        n_keep = jnp.maximum(
            (n_total.astype(jnp.float32)
             * (1 - self.compression_ratio)).astype(jnp.int32), 1
        )
        rank = _rank_desc(chunk_scores)                      # (B, N_buf)
        keep_chunk = rank < n_keep                           # (B, N_buf)
        pos_chunk = jnp.arange(S) // cl                      # (S,)
        keep_b = jnp.take_along_axis(
            keep_chunk, jnp.broadcast_to(pos_chunk[None], (B, S)), axis=1
        ) & valid[0]
        keep = jnp.broadcast_to(keep_b[:, None], (B, H, S))
        # Contexts shorter than one chunk: the one-shot path delegates to
        # the wrapped scorer (n_complete == 0) — mirror it with TOKEN-level
        # top-k in SCORE order (topk_keep's layout) instead of keeping the
        # single partial chunk whole.
        keep_tok = (_rank_desc(scores)
                    < _dyn_budget(length, self.compression_ratio)) & (
                        valid if valid.shape == keep.shape
                        else jnp.broadcast_to(valid, keep.shape))
        keep = jnp.where(length < cl, keep_tok, keep)
        order = jnp.where(
            length < cl,
            jnp.argsort(-jnp.where(keep_tok, scores, NEG_INF), axis=-1,
                        stable=True),
            _compact_order(keep),
        )
        return keep, order

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask
        keep, order = self._chunked_keep(ctx, keys, values, length, mask)
        k2, v2 = _gather_seq((keys, values), order)
        n = jnp.min(jnp.sum(keep, axis=-1)).astype(jnp.int32)
        return k2, v2, n, jnp.ones_like(mask)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv

        if self.compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        vd = dequantize_kv(values, value_scales, bits, dt)
        keep, order = self._chunked_keep(ctx, kd, vd, length, mask)
        keys, values, key_scales, value_scales = _gather_seq(
            (keys, values, key_scales, value_scales), order
        )
        n = jnp.min(jnp.sum(keep, axis=-1)).astype(jnp.int32)
        return keys, values, key_scales, value_scales, n, jnp.ones_like(mask)


@dataclasses.dataclass(frozen=True)
class BlockPress(BasePress):
    """Iterative streaming top-k over blocks (reference block_press.py:49-98)."""

    press: ScorerPress = None
    block_size: int = 128

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)

    @property
    def compression_ratio(self):
        return self.press.compression_ratio

    def max_kept(self, seq_len: int, cfg) -> int:
        return self.press.n_kept(seq_len)

    def exact_kept(self, seq_len: int):
        return self.press.n_kept(seq_len)

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        B, H, S, D = keys.shape
        E = ctx.hidden.shape[-1]
        block = min(self.block_size, S)
        n_kept = int(S * (1 - self.compression_ratio))
        kept_idx = jnp.broadcast_to(jnp.arange(n_kept)[None, None], (B, H, n_kept))
        # Per-kv-head hidden split, as the reference does (block_press.py:74).
        states = ctx.hidden.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
        for i in range(n_kept, S, block):
            end = min(i + block, S)
            cur = jnp.broadcast_to(jnp.arange(i, end)[None, None], (B, H, end - i))
            cand = jnp.concatenate([kept_idx, cur], axis=-1)            # (B,H,n+b)
            cand_states = jnp.take_along_axis(states, cand[..., None], axis=2)
            cand_hidden = cand_states.transpose(0, 2, 1, 3).reshape(B, -1, E)
            sub_ctx = dataclasses.replace(ctx, hidden=cand_hidden, attn_probs=None)
            sub_scores = self.press.score(
                sub_ctx,
                jnp.take_along_axis(keys, cand[..., None], axis=2),
                jnp.take_along_axis(values, cand[..., None], axis=2),
            ).astype(jnp.float32)
            _, topk_idx = jax.lax.top_k(sub_scores, n_kept)
            kept_idx = jnp.take_along_axis(cand, topk_idx, axis=-1)
        kept_k = jnp.take_along_axis(keys, kept_idx[..., None], axis=2)
        kept_v = jnp.take_along_axis(values, kept_idx[..., None], axis=2)
        keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
        return (
            keys, values, jnp.asarray(n_kept, jnp.int32),
            jnp.ones((B, H, S), bool), state,
        )


@dataclasses.dataclass(frozen=True)
class ThinKPress(BasePress):
    """Prune key *channels*, zeroed in place (reference think_press.py:74-98)."""

    key_channel_compression_ratio: float = 0.0
    window_size: int = 32

    @property
    def compression_ratio(self):
        return self.key_channel_compression_ratio / 2

    def exact_kept(self, seq_len: int):
        return seq_len

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.key_channel_compression_ratio == 0.0:
            return keys, values, length, mask, state
        B, H, S, D = keys.shape
        W = min(self.window_size, ctx.queries.shape[2])
        q_win = ctx.queries[:, :, -W:].astype(jnp.float32)   # post-RoPE, as ref
        q_norm = jnp.mean(q_win**2, axis=2)                  # (B,Hq,D)
        G = q_norm.shape[1] // H
        q_norm = q_norm.reshape(B, H, G, D).mean(axis=2)
        k_norm = jnp.mean(keys.astype(jnp.float32) ** 2, axis=2)
        channel_scores = q_norm * k_norm                     # (B,H,D)
        n_pruned = int(D * self.key_channel_compression_ratio)
        if n_pruned == 0:
            return keys, values, length, mask, state
        _, pruned = jax.lax.top_k(-channel_scores, n_pruned)
        ch_keep = jnp.ones((B, H, D), bool)
        ch_keep = jnp.put_along_axis(ch_keep, pruned, False, axis=-1, inplace=False)
        keys = jnp.where(ch_keep[:, :, None, :], keys, 0)
        return keys, values, length, mask, state

    # -- chunked-prefill composition (models/llama._compress_layer) ------- #
    # Channel scores = window-query energy x key energy over the VALID
    # buffer prefix (masked mean == the one-shot mean over S == length);
    # the same static top-k then zeroes the channels.

    def _channel_keep(self, ctx, keys, length):
        B, H, S, D = keys.shape
        assert self.window_size <= ctx.queries.shape[2], (
            f"ThinKPress window ({self.window_size}) exceeds the chunked-"
            f"prefill scoring window ({ctx.queries.shape[2]}) — raise "
            "score_window/context_chunk (a silent clamp would diverge from "
            "the one-shot channel selection)"
        )
        W = min(self.window_size, ctx.queries.shape[2])
        q_win = ctx.queries[:, :, -W:].astype(jnp.float32)
        q_norm = jnp.mean(q_win**2, axis=2)                  # (B, Hq, D)
        G = q_norm.shape[1] // H
        q_norm = q_norm.reshape(B, H, G, D).mean(axis=2)
        valid = (jnp.arange(S)[None, None, :, None] < length)
        k_norm = jnp.sum(
            jnp.where(valid, keys.astype(jnp.float32) ** 2, 0.0), axis=2
        ) / jnp.maximum(length, 1).astype(jnp.float32)
        channel_scores = q_norm * k_norm
        n_pruned = int(D * self.key_channel_compression_ratio)
        if n_pruned == 0:
            return None
        _, pruned = jax.lax.top_k(-channel_scores, n_pruned)
        ch_keep = jnp.ones((B, H, D), bool)
        return jnp.put_along_axis(ch_keep, pruned, False, axis=-1,
                                  inplace=False)

    def chunked_compress(self, ctx, keys, values, length, mask):
        if self.key_channel_compression_ratio == 0.0:
            return keys, values, length, mask
        ch_keep = self._channel_keep(ctx, keys, length)
        if ch_keep is not None:
            keys = jnp.where(ch_keep[:, :, None, :], keys, 0)
        return keys, values, length, mask

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv, quantize_kv

        if self.key_channel_compression_ratio == 0.0:
            return keys, values, key_scales, value_scales, length, mask
        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        ch_keep = self._channel_keep(ctx, kd, length)
        if ch_keep is not None:
            # dequant -> zero -> requant: the one-shot quantized path's
            # press machinery does exactly this (compress on dequantized,
            # write back requantized).
            kd = jnp.where(ch_keep[:, :, None, :], kd, 0)
            keys, key_scales = quantize_kv(kd, bits)
        return keys, values, key_scales, value_scales, length, mask


@dataclasses.dataclass(frozen=True)
class ComposedPress(BasePress):
    """Chain presses sequentially (reference composed_press.py:56-62).
    Requires statically-known kept lengths at each stage (all plain
    ScorerPresses + ThinK qualify; AdaKV/KVzip excluded, as in the
    reference)."""

    presses: tuple[BasePress, ...] = ()

    def __post_init__(self):
        assert not any(isinstance(p, (AdaKVPress, CriticalAdaKVPress)) for p in self.presses)

    @property
    def compression_ratio(self):
        retained = 1.0
        for p in self.presses:
            retained *= 1 - p.compression_ratio
        return 1 - retained

    def max_kept(self, seq_len: int, cfg) -> int:
        size = seq_len
        for p in self.presses:
            kept = p.exact_kept(size)
            assert kept is not None, f"{type(p).__name__} not composable"
            size = kept
        return size

    def exact_kept(self, seq_len: int):
        return self.max_kept(seq_len, None)

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        S = keys.shape[2]
        size = S
        cur_k, cur_v = keys[:, :, :S], values[:, :, :S]
        B, H = keys.shape[:2]
        cur_mask = jnp.ones((B, H, size), bool)
        cur_len = length
        for p in self.presses:
            kept = p.exact_kept(size)
            assert kept is not None, f"{type(p).__name__} not composable"
            cur_k, cur_v, cur_len, cur_mask, state = p.layer_compress(
                ctx, cur_k[:, :, :size], cur_v[:, :, :size],
                cur_len, cur_mask[:, :, :size], state,
            )
            size = kept
            cur_len = jnp.asarray(size, jnp.int32)
        keys = jax.lax.dynamic_update_slice_in_dim(keys, cur_k[:, :, :size], 0, axis=2)
        values = jax.lax.dynamic_update_slice_in_dim(values, cur_v[:, :, :size], 0, axis=2)
        return (
            keys, values, jnp.asarray(size, jnp.int32),
            jnp.ones((B, H, S), bool), state,
        )

    # -- chunked-prefill composition (traced length, window scoring) ------ #
    # Rank composition: instead of physically slicing the buffer per stage
    # (static shapes), each scorer stage shrinks an `alive` mask by its
    # traced budget; ThinK stages zero key channels in place with the k-norm
    # statistic restricted to alive slots (matching the one-shot path's
    # sliced buffer). Exact for per-position (content) scorers.

    def _chunked_stages(self, ctx, keys, values, length):
        """Returns (keys (ThinK-modified), alive (B,H,S), count (),
        keys_modified: bool static)."""
        B, H, S, _ = keys.shape
        alive = jnp.broadcast_to(
            jnp.arange(S)[None, None] < length, (B, H, S)
        )
        count = jnp.asarray(length, jnp.int32)
        keys_modified = False
        for p in self.presses:
            if isinstance(p, ThinKPress):
                if p.key_channel_compression_ratio == 0.0:
                    continue
                W = min(p.window_size, ctx.queries.shape[2])
                q_win = ctx.queries[:, :, -W:].astype(jnp.float32)
                q_norm = (q_win ** 2).mean(axis=2)              # (B,Hq,D)
                G = q_norm.shape[1] // H
                q_norm = q_norm.reshape(B, H, G, -1).mean(axis=2)
                kf = keys.astype(jnp.float32) ** 2
                k_norm = (
                    jnp.sum(kf * alive[..., None], axis=2)
                    / jnp.maximum(count.astype(jnp.float32), 1.0)
                )                                               # (B,H,D)
                channel_scores = q_norm * k_norm
                D = keys.shape[-1]
                n_pruned = int(D * p.key_channel_compression_ratio)
                if n_pruned == 0:
                    continue
                _, pruned = jax.lax.top_k(-channel_scores, n_pruned)
                ch_keep = jnp.ones((B, H, D), bool)
                ch_keep = jnp.put_along_axis(
                    ch_keep, pruned, False, axis=-1, inplace=False
                )
                keys = jnp.where(ch_keep[:, :, None, :], keys, 0)
                keys_modified = True
                continue
            assert isinstance(p, ScorerPress), (
                f"{type(p).__name__} is not chunked-composable"
            )
            if p.compression_ratio == 0.0:
                continue
            dctx = dataclasses.replace(ctx, kv_len=length)
            s = p.dynamic_score(dctx, keys, values, length).astype(jnp.float32)
            s = jnp.where(alive, s, NEG_INF)
            budget = _dyn_budget(count, p.compression_ratio)
            alive = _rank_desc(s) < budget
            count = budget
        return keys, alive, count, keys_modified

    def chunked_compress(self, ctx, keys, values, length, mask):
        keys, alive, count, _ = self._chunked_stages(ctx, keys, values, length)
        order = _compact_order(alive)
        k2, v2 = _gather_seq((keys, values), order)
        B, H, S = mask.shape
        return k2, v2, count, jnp.ones((B, H, S), bool)

    def chunked_compress_quantized(self, ctx, keys, values, key_scales,
                                   value_scales, bits, length, mask):
        from ..cache import dequantize_kv, quantize_kv

        dt = ctx.hidden.dtype
        kd = dequantize_kv(keys, key_scales, bits, dt)
        vd = dequantize_kv(values, value_scales, bits, dt)
        kd, alive, count, keys_modified = self._chunked_stages(
            ctx, kd, vd, length
        )
        order = _compact_order(alive)
        if keys_modified:
            # ThinK zeroed key channels → requantize the gathered dense keys.
            kd2 = jnp.take_along_axis(kd, order[..., None], axis=2)
            k2, ks2 = quantize_kv(kd2, bits)
        else:
            k2, ks2 = _gather_seq((keys, key_scales), order)
        v2, vs2 = _gather_seq((values, value_scales), order)
        B, H, S = mask.shape
        return k2, v2, ks2, vs2, count, jnp.ones((B, H, S), bool)


@dataclasses.dataclass(frozen=True)
class PerLayerCompressionPress(BasePress):
    """Layer-specific compression ratios (reference
    per_layer_compression_press.py:56-61), realized through the budget
    mechanism: one top-k to the max budget, per-layer valid length."""

    press: ScorerPress = None
    compression_ratios: tuple[float, ...] = ()

    def __post_init__(self):
        assert isinstance(self.press, ScorerPress)

    @property
    def compression_ratio(self):
        return sum(self.compression_ratios) / len(self.compression_ratios)

    def _budgets(self, S: int) -> list[int]:
        return [max(1, int(S * (1 - r))) for r in self.compression_ratios]

    def max_kept(self, seq_len: int, cfg) -> int:
        return max(self._budgets(seq_len))

    def exact_kept(self, seq_len: int):
        return None

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        S = keys.shape[2]
        n_top = self.max_kept(S, ctx.cfg)
        scores = self.press.score(ctx, keys, values).astype(jnp.float32)
        keys, values, _ = topk_keep(scores, keys, values, n_top)
        budgets = jnp.asarray(np.asarray(self._budgets(S), np.int32))
        new_length = budgets[ctx.layer_idx]
        B, H = keys.shape[:2]
        return (
            keys, values, new_length, jnp.ones((B, H, S), bool), state,
        )

    # -- chunked-prefill composition: rides the ScorerPress path (a
    # BudgetDecodingPress whose per-layer target comes from dynamic_budget).
    scorer_like = True
    supports_padding = True

    def dynamic_budget(self, ctx, length):
        ratios = jnp.asarray(np.asarray(self.compression_ratios, np.float32))
        r = ratios[ctx.layer_idx]
        return jnp.maximum(
            (length.astype(jnp.float32) * (1.0 - r)).astype(jnp.int32), 1
        )

    def dynamic_score(self, ctx, keys, values, length):
        return self.press.dynamic_score(ctx, keys, values, length)
