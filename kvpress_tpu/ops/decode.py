"""Unified decode attention: few-token queries against a (possibly masked,
possibly quantized) KV cache, reading only live, quantized-width bytes.

This is the kernel that monetizes compression at decode time — the thing the
reference's fake eviction can never do (kvpress/attention_patch.py:47 "does
not reduce peak memory and slightly increases runtime"):

- **Block skipping**: the KV buffer is processed in ``block_k`` tiles; a tiny
  per-(batch, kv-head) table of *live* tiles is built in XLA (any kept slot in
  the tile) and drives the BlockSpec index maps via scalar prefetch. Dead
  tiles map to the previous live tile's index, so Mosaic's pipeline dedups
  the DMA — HBM traffic is proportional to live tiles, not buffer size.
  After per-head compaction (AdaKV ``compact=True``) each head's live set is
  a front prefix plus the decode-append tail: exactly the contiguous pattern
  block skipping exploits (CLAUDE.md: scattered masks defeat paging; compacted
  prefixes don't).
- **Fused dequantization** (SURVEY §2 native dep 2, the quanto replacement):
  int8 payloads are cast in VMEM and the per-token scale is folded into the
  logit columns (q·(k_int·s) = (q·k_int)·s) and the prob rows
  ((p·s_v)·v_int), so the kernel reads 2x/4x fewer KV bytes than bf16 and
  never materializes a dequantized buffer. int4 payloads pack channel c and
  c+D/2 into one byte (cache.quantize_kv); the kernel unpacks nibbles and
  takes two half-width dot products per tile — no lane-interleave relayouts.
- Slot-index causality identical to ops/attention.py: query r of this call
  attends slot s iff s <= (length - T) + r, plus the keep-mask bits and an
  optional slot-space sliding window.

Numerics: f32 logits/softmax statistics, bf16 MXU passes — same contract as
ops/flash.py.
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


def live_block_table(
    mask: Optional[jax.Array],       # (B, H, S) keep-bits or None
    length: jax.Array,               # () int32 — valid slots
    B: int,
    H: int,
    S: int,
    block_k: int,
):
    """(table (B,H,nb) int32 — live tile indices front-compacted,
    count (B,H) int32). nb is small (S/block_k), so the argsort is trivial."""
    nb = S // block_k
    if mask is None:
        count = jnp.broadcast_to((length + block_k - 1) // block_k, (B, H))
        table = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (B, H, nb))
        return table, count.astype(jnp.int32)
    slot_live = mask & (jnp.arange(S, dtype=jnp.int32)[None, None] < length)
    blk_live = slot_live.reshape(B, H, nb, block_k).any(-1)
    table = jnp.argsort(~blk_live, axis=-1, stable=True).astype(jnp.int32)
    count = blk_live.sum(-1).astype(jnp.int32)
    return table, count


def _online_update(s, m_scr, l_scr):
    """One online-softmax block update of the (rows, LANES) m/l scratches.
    Returns (p unnormalized probs (rows, bk), alpha rescale (rows, LANES))."""
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    m_scr[...] = m_next
    return p, alpha


def _kernel(
    # scalar prefetch
    table_ref,                  # (B, H, nb) int32
    count_ref,                  # (B, H) int32
    len_ref,                    # (1,) int32 — valid length incl. new T
    # tensor inputs
    q_ref,                      # (1, 1, rows, D) | int4: (1, 1, 2, rows, D2)
    k_ref,                      # (1, 1, bk, D) bf16/int8 | (1, 1, bk, D2) int4
    v_ref,
    k_scale_ref,                # (1, 1, 1, bk) f32 or None
    v_scale_ref,
    mask_ref,                   # (1, 1, 1, bk) bool or None
    o_ref,                      # (1, 1, rows, D) | int4: (1, 1, 2, rows, D2)
    m_scr, l_scr,               # (rows, LANES) f32
    acc_scr,                    # (rows, D) f32 | int4: (2, rows, D2) f32
    *,
    bits: Optional[int],
    bk: int,
    nb: int,
    T: int,
    sm_scale: float,
    softcap: Optional[float],
    window: Optional[int],
    has_mask: bool,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = ki < count_ref[b, h]

    @pl.when(live)
    def _run():
        kb = table_ref[b, h, ki]
        # Logits of this tile, with the dequant scale folded in.
        if bits == 4:
            D2 = k_ref.shape[-1]
            rows = q_ref.shape[-2]
            q_lo = q_ref[0, 0, 0]                          # (rows, D2) bf16
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
            )                                               # (rows, bk)
        else:
            rows = q_ref.shape[-2]
            q = q_ref[0, 0]                                 # (rows, D)
            k = k_ref[0, 0]
            if bits == 8:
                k = k.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if bits is not None:
            s = s * k_scale_ref[0, 0, 0][None, :]
        s = s * sm_scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        # Slot-space causal + validity + keep-mask.
        length = len_ref[0]
        prior = length - T
        rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0) % T
        cols = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
        q_slot = prior + rowi
        allowed = cols <= q_slot
        if window is not None:
            allowed = jnp.logical_and(allowed, cols > q_slot - window)
        if has_mask:
            allowed = jnp.logical_and(allowed, mask_ref[0, 0, 0][None, :])
        s = jnp.where(allowed, s, NEG_INF)

        p, alpha = _online_update(s, m_scr, l_scr)
        if bits is not None:
            p = p * v_scale_ref[0, 0, 0][None, :]

        if bits == 4:
            p8v = v_ref[0, 0].astype(jnp.int32) & 0xFF
            v_lo = ((p8v & 0xF) - 8).astype(q_lo.dtype)
            v_hi = ((p8v >> 4) - 8).astype(q_lo.dtype)
            pb = p.astype(q_lo.dtype)
            acc_scr[0] = acc_scr[0] * alpha[:, :D2] + jax.lax.dot(
                pb, v_lo, preferred_element_type=jnp.float32
            )
            acc_scr[1] = acc_scr[1] * alpha[:, :D2] + jax.lax.dot(
                pb, v_hi, preferred_element_type=jnp.float32
            )
        else:
            D = q_ref.shape[-1]
            v = v_ref[0, 0]
            if bits == 8:
                v = v.astype(q.dtype)
            acc_scr[...] = acc_scr[...] * alpha[:, :D] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(ki == nb - 1)
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "sm_scale", "softcap", "window", "block_k", "interpret"
    ),
)
def decode_attention(
    q: jax.Array,                     # (B, Hq, T, D) bf16, T small
    k: jax.Array,                     # (B, Hkv, S, D) bf16/int8 | (…, D//2) u8
    v: jax.Array,
    length: jax.Array,                # () int32 — valid slots incl. the new T
    k_scales: Optional[jax.Array] = None,   # (B, Hkv, S, 1) f32 if quantized
    v_scales: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,       # (B, Hkv, S) keep-bits
    *,
    bits: Optional[int] = None,       # None = bf16 payload, 8 / 4 = quantized
    sm_scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    block_k: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    bk = min(block_k, up(S, LANES))
    Sp = up(S, bk)
    nb = Sp // bk
    rows = max(up(G * T, 8), 8)

    qf = q.reshape(B, Hkv, G * T, D)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, rows - G * T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S)) + ((0, 0),) * (k.ndim - 3))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S)) + ((0, 0),) * (v.ndim - 3))

    # Padded slots are causally dead (beyond length), so the table only needs
    # the real mask; scales default 1 on pads.
    maskp = None
    mask_full = None
    if mask is not None:
        mask_full = jnp.pad(
            mask, ((0, 0), (0, 0), (0, Sp - S)), constant_values=False
        )
        maskp = mask_full.reshape(B, Hkv, 1, Sp)
    table, count = live_block_table(mask_full, length, B, Hkv, Sp, bk)

    in_specs = [
        pl.BlockSpec(
            (1, 1, rows, D), lambda b, h, ki, tb, ct, ln: (b, h, 0, 0)
        ),
    ]
    q_in = qf
    if bits == 4:
        D2 = D // 2
        q_in = jnp.stack([qf[..., :D2], qf[..., D2:]], axis=2)  # (B,Hkv,2,rows,D2)
        in_specs = [
            pl.BlockSpec(
                (1, 1, 2, rows, D2), lambda b, h, ki, tb, ct, ln: (b, h, 0, 0, 0)
            ),
        ]

    def kv_index(b, h, ki, tb, ct, ln):
        # Dead grid steps revisit the last live tile: same index ⇒ no new DMA.
        safe = jnp.minimum(ki, jnp.maximum(ct[b, h] - 1, 0))
        return (b, h, tb[b, h, safe], 0)

    kv_block = (1, 1, bk, kp.shape[-1])
    in_specs += [
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
    ]

    inputs = [q_in, kp, vp]
    if bits is not None:
        # (B,H,S,1) f32 → (B,H,1,S): free reshape, puts seq on the lane axis
        # so the scale row broadcasts over logit columns without a relayout.
        def scale_row(sc):
            scp = jnp.pad(
                sc.reshape(B, Hkv, 1, S), ((0, 0), (0, 0), (0, 0), (0, Sp - S)),
                constant_values=1.0,
            )
            return scp
        inputs += [scale_row(k_scales), scale_row(v_scales)]
        in_specs += [
            pl.BlockSpec(
                (1, 1, 1, bk),
                lambda b, h, ki, tb, ct, ln: (
                    b, h, 0, tb[b, h, jnp.minimum(ki, jnp.maximum(ct[b, h] - 1, 0))]
                ),
            )
        ] * 2
    if maskp is not None:
        inputs.append(maskp)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, bk),
                lambda b, h, ki, tb, ct, ln: (
                    b, h, 0, tb[b, h, jnp.minimum(ki, jnp.maximum(ct[b, h] - 1, 0))]
                ),
            )
        )

    def wrapped(table_ref, count_ref, len_ref, *refs):
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        i = 3
        ks_ref = vs_ref = m_ref = None
        if bits is not None:
            ks_ref, vs_ref = refs[i], refs[i + 1]
            i += 2
        if maskp is not None:
            m_ref = refs[i]
            i += 1
        o_ref = refs[i]
        scr = refs[i + 1:]
        _kernel(
            table_ref, count_ref, len_ref,
            q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref, o_ref, *scr,
            bits=bits, bk=bk, nb=nb, T=T, sm_scale=sm_scale,
            softcap=softcap, window=window, has_mask=maskp is not None,
        )

    if bits == 4:
        out_shape = jax.ShapeDtypeStruct((B, Hkv, 2, rows, D // 2), q.dtype)
        out_spec = pl.BlockSpec(
            (1, 1, 2, rows, D // 2), lambda b, h, ki, tb, ct, ln: (b, h, 0, 0, 0)
        )
        acc = pltpu.VMEM((2, rows, D // 2), jnp.float32)
    else:
        out_shape = jax.ShapeDtypeStruct((B, Hkv, rows, D), q.dtype)
        out_spec = pl.BlockSpec(
            (1, 1, rows, D), lambda b, h, ki, tb, ct, ln: (b, h, 0, 0)
        )
        acc = pltpu.VMEM((rows, D), jnp.float32)

    out = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Hkv, nb),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, LANES), jnp.float32),
                acc,
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(table, count, jnp.asarray([length], jnp.int32).reshape(1), *inputs)

    if bits == 4:
        out = jnp.concatenate([out[:, :, 0], out[:, :, 1]], axis=-1)
    return out[:, :, : G * T].reshape(B, Hq, T, D)
