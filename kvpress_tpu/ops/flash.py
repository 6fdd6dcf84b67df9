"""Pallas flash attention for TPU — the framework's replacement for the
reference's flash-attn CUDA wheel (SURVEY §2, native dependency 1).

Implements the same slot-index masking contract as ops/attention.py:
  - query i of this call attends cache slot s iff s <= prior_length + i
  - optional per-(batch, kv-head, slot) boolean keep-mask (head-wise eviction,
    replacing the reference's fake-key patch, attention_patch.py:43-87)
  - optional sliding window and logit softcap (Gemma-family)

Performance-shaping choices:
  - online-softmax tiling over KV with fp32 statistics, bf16 MXU passes
  - **GQA folding**: all G query heads of one kv head are processed in one
    grid cell as a (G·bq, bk) matmul, so each K/V tile is DMA'd once per kv
    head instead of once per query head (G× less HBM traffic)
  - head_dim is NOT padded to the 128-lane width when it equals the array
    dim (64-dim heads would otherwise double K/V DMA)
  - prior_length rides in as a scalar-prefetch argument so causal tile
    skipping works with a traced cache length
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e38
LANES = 128


def _kernel(
    prior_ref,                 # scalar prefetch: (1,) int32
    q_ref,                     # (1, 1, G, bq, D)
    k_ref,                     # (1, 1, bk, D)
    v_ref,                     # (1, 1, bk, D)
    mask_ref,                  # (1, 1, 1, bk) bool
    gq_ref,                    # (1, 1, G*bq, 1) int32 rows-column of image-
                               # group ids (pre-expanded host-side) or None
    gk_ref,                    # (1, 1, 1, bk) int32 or None
    o_ref,                     # (1, 1, G, bq, D)
    lse_ref,                   # (1, 1, G*bq, LANES) f32 or None
    m_scr,                     # (G*bq, LANES) f32
    l_scr,                     # (G*bq, LANES) f32
    acc_scr,                   # (G*bq, D) f32
    *,
    G: int,
    bq: int,
    bk: int,
    n_k: int,
    sm_scale: float,
    softcap: Optional[float],
    window: Optional[int],
    or_span: Optional[int],    # max image-span length — bounds how far the
                               # bidirectional or-mask reaches above the
                               # causal diagonal
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    prior = prior_ref[0]

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip KV tiles strictly above the causal diagonal (extended by the
    # image-span bound when the same-image or-mask is active: a token can
    # attend at most or_span-1 slots ahead, all within its own image).
    max_q_slot = prior + (qi + 1) * bq - 1
    reach = 0 if or_span is None else or_span - 1
    should_run = ki * bk <= max_q_slot + reach
    if window is not None:
        min_q_slot = prior + qi * bq
        # The or-mask overrides the window: a same-image key can sit up to
        # `reach` slots behind the query even when that is outside the
        # window, so the lower skip bound must be extended by the same
        # reach as the causal (upper) skip above.
        low = max(window - 1, reach)
        should_run = jnp.logical_and(
            should_run, (ki + 1) * bk - 1 >= min_q_slot - low
        )

    @pl.when(should_run)
    def _run():
        D = q_ref.shape[-1]
        # bf16 MXU passes with fp32 accumulation.
        q = q_ref[0, 0].reshape(G * bq, D)
        k = k_ref[0, 0]                                      # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                          # (G*bq, bk) f32
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        rows = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 0) % bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 1)
        q_slot = prior + qi * bq + rows
        k_slot = ki * bk + cols
        allowed = k_slot <= q_slot
        if window is not None:
            allowed = jnp.logical_and(allowed, k_slot > q_slot - window)
        if or_span is not None:
            # same-image bidirectional or-mask (HF token_type_ids
            # semantics): group ids >= 0 mark image tokens; equal groups
            # attend each other regardless of causality/window. gq arrives
            # as a (G*bq, 1) rows-column (no lanes->sublanes relayout).
            gq = gq_ref[0, 0]                                # (G*bq, 1)
            gk = gk_ref[0, 0, 0][None, :]                    # (1, bk)
            same = jnp.logical_and(gq >= 0, gq == gk)
            allowed = jnp.logical_or(allowed, same)
        allowed = jnp.logical_and(allowed, mask_ref[0, 0, 0][None, :])
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[...]                                   # (G*bq, LANES)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next

        v = v_ref[0, 0]                                       # (bk, D)
        acc_scr[...] = acc_scr[...] * alpha[:, :D] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_k - 1)
    def _store():
        D = o_ref.shape[-1]
        l = l_scr[...][:, :D]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype).reshape(G, bq, D)
        if lse_ref is not None:
            lf = l_scr[...]
            lse_ref[0, 0] = jnp.where(
                lf > 0.0, m_scr[...] + jnp.log(jnp.maximum(lf, 1e-38)), -jnp.inf
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "softcap", "window", "block_q", "block_k", "interpret",
        "return_lse", "or_span",
    ),
)
def flash_attention(
    q: jax.Array,                    # (B, Hq, T, D)
    k: jax.Array,                    # (B, Hkv, S, D)
    v: jax.Array,
    prior_length: jax.Array,         # () int32 — cache slots before this call
    head_mask: Optional[jax.Array] = None,   # (B, Hkv, S) bool keep-mask
    q_groups: Optional[jax.Array] = None,    # (B, T) int32 image-group ids
    k_groups: Optional[jax.Array] = None,    # (B, S) int32 (-1 = not image)
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    or_span: Optional[int] = None,   # static bound on an image span's length
                                     # (mm_tokens_per_image) — enables the
                                     # same-image bidirectional or-mask
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,         # CPU-testable interpreter mode
    return_lse: bool = False,        # also return (B, Hq, T) f32 logsumexp —
                                     # blockwise/ring combination (ring.py)
):
    B, Hq, T, D = q.shape
    _, Hkv, S, _ = k.shape
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    # Pad T/S to block multiples; D stays unpadded when it is the full array
    # dim (Pallas allows full-dim lanes < 128). Zero-padded K columns are
    # causally masked (they sit beyond prior+T).
    bq = min(block_q, up(T, 8))
    bk = min(block_k, up(S, LANES))
    Tp, Sp = up(T, bq), up(S, bk)
    Dp = D if D % LANES == 0 or D in (64,) else up(D, LANES)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D)))
    qp = qp.reshape(B, Hkv, G, Tp, Dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    n_k = Sp // bk

    if head_mask is None:
        head_mask = jnp.ones((B, Hkv, S), bool)
    # Pad columns get mask=False: causality alone ('s sits beyond prior+T')
    # does not cover them when prior > S (ring blocks, ring.py).
    maskp = jnp.pad(
        head_mask, ((0, 0), (0, 0), (0, Sp - S)), constant_values=False
    )[:, :, None, :]                      # (B, Hkv, 1, Sp): legal (1, bk) tiles

    grid = (B, Hkv, Tp // bq, n_k)
    n_q = Tp // bq

    group_inputs, group_specs = [], []
    if or_span is not None:
        assert q_groups is not None and k_groups is not None
        # q side: (qi, g, r) rows-COLUMN (sublane-major — a lanes->sublanes
        # relayout inside the kernel is a Mosaic unsupported-cast)
        qg = jnp.pad(q_groups.astype(jnp.int32), ((0, 0), (0, Tp - T)),
                     constant_values=-1)
        qg = jnp.broadcast_to(
            qg.reshape(B, n_q, 1, bq), (B, n_q, G, bq)
        ).reshape(B, 1, n_q * G * bq, 1)
        kg = jnp.pad(k_groups.astype(jnp.int32), ((0, 0), (0, Sp - S)),
                     constant_values=-1).reshape(B, 1, 1, Sp)
        group_inputs = [qg, kg]
        group_specs = [
            pl.BlockSpec(
                (1, 1, G * bq, 1), lambda b, h, qi, ki, p: (b, 0, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, 1, bk), lambda b, h, qi, ki, p: (b, 0, 0, ki)
            ),
        ]

    def wrapped(prior_ref, q_r, k_r, v_r, m_r, *rest):
        gq_r = gk_r = None
        if or_span is not None:
            gq_r, gk_r = rest[0], rest[1]
            rest = rest[2:]
        if return_lse:
            o_r, lse_r = rest[0], rest[1]
            scr = rest[2:]
        else:
            o_r, lse_r = rest[0], None
            scr = rest[1:]
        _kernel(
            prior_ref, q_r, k_r, v_r, m_r, gq_r, gk_r, o_r, lse_r, *scr,
            G=G, bq=bq, bk=bk, n_k=n_k,
            sm_scale=sm_scale, softcap=softcap, window=window,
            or_span=or_span,
        )

    out_shape = [jax.ShapeDtypeStruct((B, Hkv, G, Tp, Dp), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, G, bq, Dp), lambda b, h, qi, ki, p: (b, h, 0, qi, 0))
    ]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((B, Hkv, n_q * G * bq, LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, G * bq, LANES), lambda b, h, qi, ki, p: (b, h, qi, 0)
            )
        )

    res = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, bq, Dp), lambda b, h, qi, ki, p: (b, h, 0, qi, 0)),
                pl.BlockSpec((1, 1, bk, Dp), lambda b, h, qi, ki, p: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, bk, Dp), lambda b, h, qi, ki, p: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, 1, bk), lambda b, h, qi, ki, p: (b, h, 0, ki)),
            ] + group_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((G * bq, LANES), jnp.float32),
                pltpu.VMEM((G * bq, LANES), jnp.float32),
                pltpu.VMEM((G * bq, Dp), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([prior_length], jnp.int32).reshape(1), qp, kp, vp, maskp,
      *group_inputs)
    out = res[0].reshape(B, Hq, Tp, Dp)[:, :, :T, :D]
    if not return_lse:
        return out
    # lse rows are (qi, g, r) nested; lane 0 carries the value.
    lse = res[1][..., 0].reshape(B, Hkv, n_q, G, bq)
    lse = lse.transpose(0, 1, 3, 2, 4).reshape(B, Hq, Tp)[:, :, :T]
    return out, lse


def _qkernel(
    prior_ref,                 # scalar prefetch: (1,) int32
    q_ref,                     # (1, 1, rows_blk, D) bf16 | int4: (1,1,2,rows_blk,D2)
    k_ref,                     # (1, 1, bk, D) int8 | (1, 1, bk, D2) u8
    v_ref,
    ks_ref,                    # (1, 1, 1, bk) f32 per-token key scales
    vs_ref,
    mask_ref,                  # (1, 1, 1, bk) bool
    o_ref,                     # like q_ref
    lse_ref,                   # (1, 1, rows_blk, LANES) f32 | None
    m_scr, l_scr,              # (rows_blk, LANES) f32
    acc_scr,                   # (rows_blk, D) f32 | int4: (2, rows_blk, D2)
    *,
    bits: int,
    G: int,
    bq: int,
    bk: int,
    n_k: int,
    sm_scale: float,
    softcap: Optional[float],
    window: Optional[int],
):
    """Flash attention over int8/packed-int4 K/V payloads: dequantization is
    fused — per-token scales fold into the logit columns (q·(k_int·s) =
    (q·k_int)·s) and the prob rows, payloads cast in VMEM. Same slot-index
    causality/keep-mask contract as _kernel; same math as
    ops/attention.quant_gqa_attention (int4 = two half-width nibble dots,
    cache concat-halves layout — native-s4 dots miscompile, CLAUDE.md)."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    prior = prior_ref[0]
    rows_blk = G * bq

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    max_q_slot = prior + (qi + 1) * bq - 1
    should_run = ki * bk <= max_q_slot
    if window is not None:
        min_q_slot = prior + qi * bq
        should_run = jnp.logical_and(
            should_run, (ki + 1) * bk - 1 > min_q_slot - window
        )

    @pl.when(should_run)
    def _run():
        if bits == 4:
            D2 = k_ref.shape[-1]
            q_lo = q_ref[0, 0, 0]                          # (rows_blk, D2)
            q_hi = q_ref[0, 0, 1]
            p8 = k_ref[0, 0].astype(jnp.int32) & 0xFF      # (bk, D2)
            k_lo = ((p8 & 0xF) - 8).astype(q_lo.dtype)
            k_hi = ((p8 >> 4) - 8).astype(q_lo.dtype)
            s = jax.lax.dot_general(
                q_lo, k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_hi, k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            q = q_ref[0, 0]                                # (rows_blk, D)
            k = k_ref[0, 0].astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s = s * ks_ref[0, 0, 0][None, :] * sm_scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, bk), 0) % bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, bk), 1)
        q_slot = prior + qi * bq + rows
        k_slot = ki * bk + cols
        allowed = k_slot <= q_slot
        if window is not None:
            allowed = jnp.logical_and(allowed, k_slot > q_slot - window)
        allowed = jnp.logical_and(allowed, mask_ref[0, 0, 0][None, :])
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next

        pv = p * vs_ref[0, 0, 0][None, :]
        if bits == 4:
            p8v = v_ref[0, 0].astype(jnp.int32) & 0xFF
            v_lo = ((p8v & 0xF) - 8).astype(q_lo.dtype)
            v_hi = ((p8v >> 4) - 8).astype(q_lo.dtype)
            pb = pv.astype(q_lo.dtype)
            acc_scr[0] = acc_scr[0] * alpha[:, :D2] + jax.lax.dot(
                pb, v_lo, preferred_element_type=jnp.float32
            )
            acc_scr[1] = acc_scr[1] * alpha[:, :D2] + jax.lax.dot(
                pb, v_hi, preferred_element_type=jnp.float32
            )
        else:
            D = q_ref.shape[-1]
            v = v_ref[0, 0].astype(q_ref.dtype)
            acc_scr[...] = acc_scr[...] * alpha[:, :D] + jax.lax.dot(
                pv.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(ki == n_k - 1)
    def _store():
        if bits == 4:
            D2 = o_ref.shape[-1]
            l = l_scr[...][:, :D2]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0, 0] = (acc_scr[0] * l_inv).astype(o_ref.dtype)
            o_ref[0, 0, 1] = (acc_scr[1] * l_inv).astype(o_ref.dtype)
        else:
            D = o_ref.shape[-1]
            l = l_scr[...][:, :D]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            lf = l_scr[...]
            lse_ref[0, 0] = jnp.where(
                lf > 0.0, m_scr[...] + jnp.log(jnp.maximum(lf, 1e-38)),
                -jnp.inf,
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "sm_scale", "softcap", "window", "block_q", "block_k",
        "interpret", "return_lse",
    ),
)
def flash_attention_quant(
    q: jax.Array,                    # (B, Hq, T, D) bf16
    k: jax.Array,                    # (B, Hkv, S, D) int8 | (…, D//2) u8
    v: jax.Array,
    k_scales: jax.Array,             # (B, Hkv, S, 1) f32
    v_scales: jax.Array,
    prior_length: jax.Array,         # () int32
    head_mask: Optional[jax.Array] = None,
    *,
    bits: int,                       # 8 | 4
    sm_scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
    return_lse: bool = False,        # also return (B, Hq, T) f32 logsumexp
                                     # (KVCompose chunked re-feed sweep)
):
    """Multi-token flash attention reading the quantized cache at payload
    width — the prefill/chunk counterpart of ops/decode.py's fused dequant.
    The dequantized buffer never exists: HBM attention reads are 2x (int8) /
    4x (int4) smaller than bf16, which is also what lets 8B@128K chunked
    prefill fit one 16 GB chip."""
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    bq = min(block_q, up(T, 8))
    bk = min(block_k, up(S, LANES))
    Tp, Sp = up(T, bq), up(S, bk)
    n_k = Sp // bk
    n_q = Tp // bq
    rows_blk = G * bq

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    # flat (g, r) rows like ops/decode.py; causality uses rows % bq
    qf = qp.reshape(B, Hkv, G, Tp, D).transpose(0, 1, 3, 2, 4)  # (B,Hkv,Tp,G,D)
    qf = qf.reshape(B, Hkv, n_q, bq, G, D).transpose(0, 1, 2, 4, 3, 5)
    qf = qf.reshape(B, Hkv, n_q * G * bq, D)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    def scale_row(sc):
        return jnp.pad(
            sc.reshape(B, Hkv, 1, S), ((0, 0), (0, 0), (0, 0), (0, Sp - S)),
            constant_values=1.0,
        )

    if head_mask is None:
        head_mask = jnp.ones((B, Hkv, S), bool)
    maskp = jnp.pad(
        head_mask, ((0, 0), (0, 0), (0, Sp - S)), constant_values=False
    )[:, :, None, :]

    if bits == 4:
        D2 = D // 2
        q_in = jnp.stack([qf[..., :D2], qf[..., D2:]], axis=2)
        q_spec = pl.BlockSpec(
            (1, 1, 2, rows_blk, D2), lambda b, h, qi, ki, p: (b, h, 0, qi, 0)
        )
        out_shape = jax.ShapeDtypeStruct(
            (B, Hkv, 2, n_q * rows_blk, D2), q.dtype
        )
        out_spec = pl.BlockSpec(
            (1, 1, 2, rows_blk, D2), lambda b, h, qi, ki, p: (b, h, 0, qi, 0)
        )
        acc = pltpu.VMEM((2, rows_blk, D2), jnp.float32)
    else:
        q_in = qf
        q_spec = pl.BlockSpec(
            (1, 1, rows_blk, D), lambda b, h, qi, ki, p: (b, h, qi, 0)
        )
        out_shape = jax.ShapeDtypeStruct((B, Hkv, n_q * rows_blk, D), q.dtype)
        out_spec = pl.BlockSpec(
            (1, 1, rows_blk, D), lambda b, h, qi, ki, p: (b, h, qi, 0)
        )
        acc = pltpu.VMEM((rows_blk, D), jnp.float32)

    kv_spec = pl.BlockSpec(
        (1, 1, bk, kp.shape[-1]), lambda b, h, qi, ki, p: (b, h, ki, 0)
    )
    row_spec = pl.BlockSpec(
        (1, 1, 1, bk), lambda b, h, qi, ki, p: (b, h, 0, ki)
    )

    def wrapped(prior_ref, q_r, k_r, v_r, ks_r, vs_r, m_r, *rest):
        if return_lse:
            o_r, lse_r = rest[0], rest[1]
            scr = rest[2:]
        else:
            o_r, lse_r = rest[0], None
            scr = rest[1:]
        _qkernel(
            prior_ref, q_r, k_r, v_r, ks_r, vs_r, m_r, o_r, lse_r, *scr,
            bits=bits, G=G, bq=bq, bk=bk, n_k=n_k,
            sm_scale=sm_scale, softcap=softcap, window=window,
        )

    out_shapes = [out_shape]
    out_specs = [out_spec]
    if return_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, Hkv, n_q * rows_blk, LANES), jnp.float32)
        )
        out_specs.append(pl.BlockSpec(
            (1, 1, rows_blk, LANES), lambda b, h, qi, ki, p: (b, h, qi, 0)
        ))

    res = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, n_q, n_k),
            in_specs=[q_spec, kv_spec, kv_spec, row_spec, row_spec, row_spec],
            out_specs=out_specs if return_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((rows_blk, LANES), jnp.float32),
                pltpu.VMEM((rows_blk, LANES), jnp.float32),
                acc,
            ],
        ),
        out_shape=out_shapes if return_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([prior_length], jnp.int32).reshape(1), q_in, kp, vp,
      scale_row(k_scales), scale_row(v_scales), maskp)

    out = res[0] if return_lse else res
    if bits == 4:
        out = jnp.concatenate([out[:, :, 0], out[:, :, 1]], axis=-1)
    # undo the flat (qi, g, r) row order
    out = out.reshape(B, Hkv, n_q, G, bq, D).transpose(0, 1, 2, 4, 3, 5)
    out = out.reshape(B, Hkv, Tp, G, D).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B, Hq, Tp, D)[:, :, :T]
    if not return_lse:
        return out
    lse = res[1][..., 0].reshape(B, Hkv, n_q, G, bq)
    lse = lse.transpose(0, 1, 3, 2, 4).reshape(B, Hq, Tp)[:, :, :T]
    return out, lse
