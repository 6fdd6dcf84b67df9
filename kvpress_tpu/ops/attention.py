"""Reference (pure-XLA) attention with slot-index causal masking.

Causality is enforced in *slot space*: a query that is the ``i``-th new token
of this call may attend cache slot ``s`` iff ``s < prior_length + i + 1``.
Because compression always front-compacts the cache (evicted slots never stay
interleaved), slot order is chronological, so this is exactly causal — and it
makes compressed caches (where original token positions are no longer stored)
attend correctly without any position bookkeeping. Head-wise eviction arrives
as a boolean keep-mask folded into the same additive bias, replacing the
reference's fake-key monkey-patch (``kvpress/attention_patch.py:43-87``).

This path is the semantic reference; the Pallas flash kernel (ops/flash.py)
implements the same contract for long contexts on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.0e38  # -0.7 * f32 max, avoids exp(-inf - -inf) NaNs


def attention_bias(
    prior_length: jax.Array,
    num_new: int,
    buf_size: int,
    sliding_window: Optional[int] = None,
    head_mask: Optional[jax.Array] = None,
    extra_allow: Optional[jax.Array] = None,
) -> jax.Array:
    """Additive bias (…, num_new, buf_size) in f32.

    prior_length: () int32 — valid slots before this call's tokens were added.
    head_mask: optional (B, H_kv, buf_size) bool keep-mask.
    extra_allow: optional (B, num_new, buf_size) bool ORed over the causal/
    window rule BEFORE the keep-mask applies — Gemma3's bidirectional
    image-span attention (HF token_type_ids or_mask_function)."""
    q_slot = prior_length + jnp.arange(num_new, dtype=jnp.int32)[:, None]
    k_slot = jnp.arange(buf_size, dtype=jnp.int32)[None, :]
    allowed = k_slot <= q_slot
    if sliding_window is not None:
        allowed &= k_slot > q_slot - sliding_window
    if extra_allow is not None:
        allowed = allowed[None] | extra_allow                  # (B, T, S)
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]
        if head_mask is not None:
            bias = bias + jnp.where(head_mask, 0.0, NEG_INF)[:, :, None, :]
        return bias
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
    if head_mask is not None:
        bias = bias[None, None] + jnp.where(head_mask, 0.0, NEG_INF)[:, :, None, :]
    return bias


def gqa_attention(
    q: jax.Array,                # (B, Hq, T, D)
    k: jax.Array,                # (B, Hkv, S, D)
    v: jax.Array,                # (B, Hkv, S, D)
    bias: jax.Array,             # (T, S) or (B, Hkv, T, S)
    scale: float,
    softcap: Optional[float] = None,
    return_probs: bool = False,
):
    """Grouped-query attention, fp32 softmax. Returns (out (B,Hq,T,D), probs?)."""
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, T, D)
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    if bias.ndim == 2:
        logits = logits + bias[None, None, None]
    else:
        logits = logits + bias[:, :, None]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs.astype(v.dtype), v)
    out = out.reshape(B, Hq, T, D)
    if return_probs:
        return out, probs.reshape(B, Hq, T, -1)
    return out, None


def quant_gqa_attention(
    q: jax.Array,                # (B, Hq, T, D)
    k_payload: jax.Array,        # (B, Hkv, S, D) int8 | (B, Hkv, S, D//2) u8
    v_payload: jax.Array,
    k_scales: jax.Array,         # (B, Hkv, S, 1) f32
    v_scales: jax.Array,
    bias: jax.Array,             # (T, S) or (B, Hkv, T, S)
    scale: float,
    bits: int,                   # 8 | 4
    softcap: Optional[float] = None,
):
    """GQA attention reading the *quantized* KV payload directly (SURVEY §2
    native dep 2 — the quanto-int4 replacement, done the XLA way).

    The dequantized buffer never exists: the integer payload feeds the dot
    as an elementwise-converted operand (XLA fuses converts/shifts into the
    dot's operand read on TPU, so HBM traffic is payload-width), and the
    per-(token, head) scale is applied algebraically outside the reduction —
    ``q·(k_int·s_k) = (q·k_int)·s_k`` on logit columns and
    ``p·(v_int·s_v) = (p·s_v)·v_int`` on prob rows. int4 payloads pack
    channel c with c+D/2 (cache.quantize_kv concat-halves layout), so the
    logits are two half-width dots on the nibble planes, and the int4 value
    pass computes nibble-plane outputs that concatenate back to D.

    Contrast: the reference gets its int4 decode from quanto's fused CUDA
    kernels (README.md:166-181); round-1 here dequantized the whole buffer
    per step (models/llama.py), *costing* bandwidth instead of saving it.
    """
    B, Hq, T, D = q.shape
    Hkv, S = k_payload.shape[1], k_payload.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G * T, D)
    logits = quant_qk_logits(qg, k_payload, k_scales, bits)
    logits = logits.reshape(B, Hkv, G, T, S) * scale
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    if bias.ndim == 2:
        logits = logits + bias[None, None, None]
    else:
        logits = logits + bias[:, :, None]
    probs = jax.nn.softmax(logits, axis=-1)
    out = quant_pv_out(
        probs.reshape(B, Hkv, G * T, S), v_payload, v_scales, bits, q.dtype
    )
    return out.reshape(B, Hq, T, D)


def quant_qk_logits(
    qg: jax.Array,               # (B, Hkv, R, D) — R = folded (group, time)
    k_payload: jax.Array,        # (B, Hkv, S, D) int8 | (B, Hkv, S, D//2) u8
    k_scales: jax.Array,         # (B, Hkv, S, 1) f32
    bits: int,
) -> jax.Array:
    """q·K logits against the quantized payload, per-token scales applied
    algebraically outside the reduction (``q·(k_int·s) = (q·k_int)·s``) —
    the integer payload feeds the dot as an elementwise-converted operand,
    so HBM traffic is payload-width. Returns (B, Hkv, R, S) f32,
    unscaled by sm_scale. Shared by quant_gqa_attention and the distributed
    split-KV decode (parallel/decode.py)."""
    B, H, R, D = qg.shape
    S = k_payload.shape[2]
    ks_row = k_scales.reshape(B, H, 1, S)
    if bits == 8:
        logits = jnp.einsum(
            "bhrd,bhsd->bhrs", qg, k_payload.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        assert bits == 4
        D2 = D // 2
        p8 = k_payload.astype(jnp.int32) & 0xFF
        k_lo = ((p8 & 0xF) - 8).astype(qg.dtype)
        k_hi = ((p8 >> 4) - 8).astype(qg.dtype)
        logits = jnp.einsum(
            "bhrd,bhsd->bhrs", qg[..., :D2], k_lo,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bhrd,bhsd->bhrs", qg[..., D2:], k_hi,
            preferred_element_type=jnp.float32,
        )
    return logits * ks_row


def quant_pv_out(
    probs: jax.Array,            # (B, Hkv, R, S) f32
    v_payload: jax.Array,
    v_scales: jax.Array,         # (B, Hkv, S, 1) f32
    bits: int,
    dtype,
) -> jax.Array:
    """probs·V against the quantized payload (``p·(v_int·s) = (p·s)·v_int``).
    Returns (B, Hkv, R, D). int4 packs channel c with c+D/2 (concat-halves,
    cache.quantize_kv), so the nibble-plane outputs concatenate back to D."""
    B, H, R, S = probs.shape
    vs_row = v_scales.reshape(B, H, 1, S)
    pv = (probs * vs_row).astype(dtype)
    if bits == 8:
        return jnp.einsum("bhrs,bhsd->bhrd", pv, v_payload.astype(dtype))
    p8v = v_payload.astype(jnp.int32) & 0xFF
    v_lo = ((p8v & 0xF) - 8).astype(dtype)
    v_hi = ((p8v >> 4) - 8).astype(dtype)
    return jnp.concatenate(
        [
            jnp.einsum("bhrs,bhsd->bhrd", pv, v_lo),
            jnp.einsum("bhrs,bhsd->bhrd", pv, v_hi),
        ],
        axis=-1,
    )


def chunked_window_probs_mean(
    q_window: jax.Array,         # (B, Hq, W, D)
    k: jax.Array,                # (B, Hkv, S, D)
    scale: float,
    prior_length: jax.Array,
    chunk: int = 4096,
) -> jax.Array:
    """Column means over the window of softmax probs: (B, Hq, S), computed in
    O(W·chunk) memory via a two-pass online softmax over key chunks — the
    long-context path for observation-window presses (SnapKV at 128K would
    otherwise materialize a W×S float32 matrix per layer)."""
    B, Hq, W, D = q_window.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q_window.reshape(B, Hkv, G, W, D).astype(jnp.float32)
    Sp = -(-S // chunk) * chunk
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0))).astype(jnp.float32)
    n_chunks = Sp // chunk
    kc = kp.reshape(B, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)

    q_slot = prior_length + jnp.arange(W, dtype=jnp.int32)[:, None]

    def logits_of(k_chunk, c):
        s = jnp.einsum("bhgtd,bhsd->bhgts", qg, k_chunk,
                       preferred_element_type=jnp.float32) * scale
        k_slot = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        allowed = (k_slot <= q_slot) & (k_slot < S)
        return jnp.where(allowed[None, None, None], s, NEG_INF)

    # Pass 1: per-row max and sum-exp.
    def pass1(carry, xs):
        m, l = carry
        k_chunk, c = xs
        s = logits_of(k_chunk, c)
        m_new = jnp.maximum(m, s.max(axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.exp(
            s - m_new[..., None]
        ).sum(axis=-1)
        return (m_new, l), None

    m0 = jnp.full((B, Hkv, G, W), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, W), jnp.float32)
    (m, l), _ = jax.lax.scan(pass1, (m0, l0), (kc, jnp.arange(n_chunks)))
    inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)

    # Pass 2: normalized column means per chunk.
    def pass2(_, xs):
        k_chunk, c = xs
        s = logits_of(k_chunk, c)
        p = jnp.exp(s - m[..., None]) * inv_l[..., None]
        return None, p.mean(axis=-2)                      # (B, Hkv, G, chunk)

    _, cols = jax.lax.scan(pass2, None, (kc, jnp.arange(n_chunks)))
    cols = cols.transpose(1, 2, 3, 0, 4).reshape(B, Hkv, G, Sp)[..., :S]
    return cols.reshape(B, Hq, S)


def window_probs_mean_from_lse(
    q_window: jax.Array,         # (B, Hq, W, D) — last-W post-RoPE queries
    k: jax.Array,                # (B, Hkv, S, D)
    lse_window: jax.Array,       # (B, Hq, W) f32 — row logsumexp from the
                                 # flash prefill pass (ctx.attn_lse tail)
    scale: float,
    prior_length: jax.Array,     # () int32 — causal offset of the first row
    softcap: Optional[float] = None,
    chunk: int = 4096,
) -> jax.Array:
    """Column means over the window, (B, Hq, S), in ONE sweep over K.

    ``chunked_window_probs_mean`` needs two passes (running max/sum, then
    normalized columns). When the prefill ran through the flash kernel its
    row logsumexp is already exact — probs are simply ``exp(s·scale − lse)``,
    so the second pass (and the extra K read) disappears. ``softcap`` must
    match the attention that produced the lse (Gemma logit softcap), else the
    recomputed logits would not correspond to it."""
    B, Hq, W, D = q_window.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q_window.reshape(B, Hkv, G, W, D)
    lse = lse_window.reshape(B, Hkv, G, W)
    Sp = -(-S // chunk) * chunk
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    n_chunks = Sp // chunk
    kc = kp.reshape(B, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    q_slot = prior_length + jnp.arange(W, dtype=jnp.int32)[:, None]

    def step(_, xs):
        k_chunk, c = xs
        s = jnp.einsum(
            "bhgtd,bhsd->bhgts", qg, k_chunk.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        k_slot = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        allowed = (k_slot <= q_slot) & (k_slot < S)
        p = jnp.where(
            allowed[None, None, None], jnp.exp(s - lse[..., None]), 0.0
        )
        return None, p.mean(axis=-2)                      # (B, Hkv, G, chunk)

    _, cols = jax.lax.scan(step, None, (kc, jnp.arange(n_chunks)))
    cols = cols.transpose(1, 2, 3, 0, 4).reshape(B, Hkv, G, Sp)[..., :S]
    return cols.reshape(B, Hq, S)


def chunked_observed_colsums(
    queries: jax.Array,          # (B, Hq, S, D) — all post-RoPE prefill queries
    keys: jax.Array,             # (B, Hkv, S, D)
    scale: float,
    softcap: Optional[float] = None,
    chunk: int = 64,
    valid_len: Optional[jax.Array] = None,   # () traced — bucketed prefill
) -> jax.Array:
    """Causal column sums of the full softmax attention matrix, (B, Hq, S),
    without ever materializing it: queries are processed ``chunk`` rows at a
    time, each chunk's rows softmaxed over the whole key axis and column-summed
    into an accumulator. O(Hq·chunk·S) memory, same S²·D FLOPs as attention.

    This is ObservedAttention's score (reference
    observed_attention_press.py:34-49 reads ``attentions`` from eager output)
    made viable at long context and under the flash path, where probs are
    never produced."""
    B, Hq, S, D = queries.shape
    Hkv = keys.shape[1]
    G = Hq // Hkv
    Sp = -(-S // chunk) * chunk
    qp = jnp.pad(queries, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    n_chunks = Sp // chunk
    qc = qp.reshape(B, Hkv, G, n_chunks, chunk, D).transpose(3, 0, 1, 2, 4, 5)
    k_slot = jnp.arange(S, dtype=jnp.int32)[None, :]
    L = jnp.asarray(S if valid_len is None else valid_len, jnp.int32)

    def step(acc, xs):
        q_chunk, c = xs                               # (B, Hkv, G, chunk, D)
        # Native-dtype inputs (bf16 on chip) with f32 accumulation: full MXU
        # rate, same numerics as the attention the scores are meant to mirror.
        s = jnp.einsum(
            "bhgtd,bhsd->bhgts", q_chunk, keys,
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        q_pos = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[:, None]
        allowed = (k_slot <= q_pos) & (k_slot < L)
        s = jnp.where(allowed[None, None, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        # Rows beyond the valid length (bucket padding / chunk padding) are
        # not observers: all-NEG_INF softmax is uniform, zero them.
        row_valid = (q_pos[:, 0] < L)[None, None, None, :, None]
        p = jnp.where(row_valid, p, 0.0)
        return acc + p.sum(axis=-2), None             # (B, Hkv, G, S)

    acc0 = jnp.zeros((B, Hkv, G, S), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (qc, jnp.arange(n_chunks)))
    return acc.reshape(B, Hq, S)


def window_attention_probs(
    q_window: jax.Array,         # (B, Hq, W, D) — last-W queries (post-RoPE)
    k: jax.Array,                # (B, Hkv, S, D)
    scale: float,
    prior_length: jax.Array,     # causal offset of the first window query
) -> jax.Array:
    """Softmax probs of the last W queries over all S keys: (B, Hq, W, S).

    Used by observation-window presses (SnapKV ``compute_window_attention``,
    reference snapkv_press.py:41-69; TOVA, Finch) to rebuild attention without
    the O(S²) full matrix.
    """
    B, Hq, W, D = q_window.shape
    S = k.shape[2]
    bias = attention_bias(prior_length, W, S)
    Hkv = k.shape[1]
    qg = q_window.reshape(B, Hkv, Hq // Hkv, W, D)
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + bias[None, None, None]
    return jax.nn.softmax(logits, axis=-1).reshape(B, Hq, W, S)


def refeed_colagg(
    q: jax.Array,                    # (B, Hq, T, D) re-feed chunk queries
    kb: jax.Array,                   # (B, Hkv, S_buf, D|payload) cache keys
    k_scales,                        # (B, Hkv, S_buf, 1) f32 | None
    bits: int,
    lse: jax.Array,                  # (B, Hq, T) f32 — softmax denominators
                                     # over each query's FULL visible range
    ctx_len: int,
    agg: str,                        # "max" | "sum" over the T query rows
    scale: float,
    softcap=None,
    block: int = 512,
):
    """Blockwise aggregation of softmax probabilities of re-feed queries
    onto the first ``ctx_len`` cache columns (KVCompose chunked scoring
    pass; reference kvcompose_press.py Aggregator streams eager attention —
    :28-99). Every context column precedes every re-feed query, so there is
    no causal mask inside the sweep; ``p = exp(s - lse)`` with the lse from
    the chunk's own attention (flash return_lse / XLA logsumexp) makes each
    block's probabilities exact without materializing the (T, ctx) matrix.
    Returns (B, Hq, ctx_len) f32 — the per-attention-head max or sum over
    this chunk's queries (chunks combine by max / running sum outside)."""
    B, Hq, T, D = q.shape
    Hkv = kb.shape[1]
    G = Hq // Hkv
    block = min(block, max(ctx_len, 1))
    n_blocks = -(-ctx_len // block)
    pad_ctx = n_blocks * block
    # Slice the context columns once (static bounds) and zero-pad to a block
    # multiple: the blockwise dynamic slices can then never run past the
    # buffer regardless of how much append room the caller presized (a
    # fixed-block slice on a small buffer is a trace-time error). The pad
    # copy is ctx_len x payload-width per layer — noise next to the sweep.
    kctx = jax.lax.slice_in_dim(kb, 0, ctx_len, axis=2)
    kctx = jnp.pad(kctx, ((0, 0), (0, 0), (0, pad_ctx - ctx_len), (0, 0)))
    sctx = None
    if k_scales is not None:
        sctx = jax.lax.slice_in_dim(k_scales, 0, ctx_len, axis=2)
        sctx = jnp.pad(sctx, ((0, 0), (0, 0), (0, pad_ctx - ctx_len), (0, 0)))
    qg = q.reshape(B, Hkv, G, T, D)
    lse_g = lse.reshape(B, Hkv, G, T)

    def body(i, out):
        start = i * block
        kblk = jax.lax.dynamic_slice_in_dim(kctx, start, block, axis=2)
        if sctx is not None:
            from ..cache import dequantize_kv

            sblk = jax.lax.dynamic_slice_in_dim(sctx, start, block, axis=2)
            kblk = dequantize_kv(kblk, sblk, bits, q.dtype)
        s = jnp.einsum(
            "bhgtd,bhsd->bhgts", qg, kblk,
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        p = jnp.exp(s - lse_g[..., None])
        cols = start + jnp.arange(block)
        p = jnp.where((cols < ctx_len)[None, None, None, None], p, 0.0)
        part = p.max(axis=3) if agg == "max" else p.sum(axis=3)
        return jax.lax.dynamic_update_slice_in_dim(
            out, part.reshape(B, Hq, block), start, axis=2
        )

    out = jnp.zeros((B, Hq, pad_ctx), jnp.float32)
    out = jax.lax.fori_loop(0, n_blocks, body, out)
    return out[..., :ctx_len]
