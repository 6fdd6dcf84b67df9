"""Pallas flash attention for TPU — the framework's replacement for the
reference's flash-attn CUDA wheel (SURVEY §2, native dependency 1).

Implements the same slot-index masking contract as ops/attention.py:
  - query i of this call attends cache slot s iff s <= prior_length + i
  - optional per-(batch, kv-head, slot) boolean keep-mask (head-wise eviction,
    replacing the reference's fake-key patch, attention_patch.py:43-87)
  - optional sliding window and logit softcap (Gemma-family)

Online-softmax tiling over KV with fp32 statistics; GQA handled by indexing
each query head's kv head in the BlockSpec index maps (no K/V repeat in HBM).
prior_length rides in as a scalar-prefetch argument so causal tile skipping
works with a traced cache length.
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
    q_ref,                     # (1, 1, bq, D)
    k_ref,                     # (1, 1, bk, D)
    v_ref,                     # (1, 1, bk, D)
    mask_ref,                  # (1, 1, 1, bk) bool
    o_ref,                     # (1, 1, bq, D)
    m_scr,                     # (bq, LANES) f32
    l_scr,                     # (bq, LANES) f32
    acc_scr,                   # (bq, D) f32
    *,
    bq: int,
    bk: int,
    n_k: int,
    sm_scale: float,
    softcap: Optional[float],
    window: Optional[int],
    has_mask: bool,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    prior = prior_ref[0]

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip KV tiles strictly above the causal diagonal.
    max_q_slot = prior + (qi + 1) * bq - 1
    should_run = ki * bk <= max_q_slot
    if window is not None:
        # ...and tiles entirely outside the sliding window.
        min_q_slot = prior + qi * bq
        should_run = jnp.logical_and(
            should_run, (ki + 1) * bk - 1 > min_q_slot - window
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)                  # (bq, D)
        k = k_ref[0, 0].astype(jnp.float32)                  # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                          # (bq, bk)
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        q_slot = prior + qi * bq + rows
        k_slot = ki * bk + cols
        allowed = k_slot <= q_slot
        if window is not None:
            allowed = jnp.logical_and(allowed, k_slot > q_slot - window)
        if has_mask:
            allowed = jnp.logical_and(allowed, mask_ref[0, 0, 0][None, :])
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[...]                                   # (bq, LANES)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]                  # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)                  # broadcast lanes
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                        # (bq, bk)
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0].astype(jnp.float32)                   # (bk, D)
        acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_scr[...][:, : acc_scr.shape[-1]]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "softcap", "window", "block_q", "block_k"),
)
def flash_attention(
    q: jax.Array,                    # (B, Hq, T, D)
    k: jax.Array,                    # (B, Hkv, S, D)
    v: jax.Array,
    prior_length: jax.Array,         # () int32 — cache slots before this call
    head_mask: Optional[jax.Array] = None,   # (B, Hkv, S) bool keep-mask
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jax.Array:
    B, Hq, T, D = q.shape
    _, Hkv, S, _ = k.shape
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    # Pad T/S to block multiples and D to the 128-lane width. Zero-padding is
    # sound: padded K columns are causally masked (they sit beyond prior+T)
    # and padded D lanes contribute zero to dot products.
    bq = min(block_q, up(T, 8))
    bk = min(block_k, up(S, LANES))
    Tp, Sp = up(T, bq), up(S, bk)
    Dp = up(max(D, LANES), LANES)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    n_k = Sp // bk

    if head_mask is None:
        head_mask = jnp.ones((B, Hkv, S), bool)
    maskp = jnp.pad(
        head_mask, ((0, 0), (0, 0), (0, Sp - S)), constant_values=True
    )[:, :, None, :]                      # (B, Hkv, 1, Sp): legal (1, bk) tiles

    grid = (B, Hq, Tp // bq, n_k)

    def q_map(b, h, qi, ki, prior):
        return (b, h, qi, 0)

    def kv_map(b, h, qi, ki, prior):
        return (b, h // G, ki, 0)

    def mask_map(b, h, qi, ki, prior):
        return (b, h // G, 0, ki)

    kernel = functools.partial(
        _kernel,
        bq=bq,
        bk=bk,
        n_k=n_k,
        sm_scale=sm_scale,
        softcap=softcap,
        window=window,
        has_mask=True,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, Dp), q_map),
                pl.BlockSpec((1, 1, bk, Dp), kv_map),
                pl.BlockSpec((1, 1, bk, Dp), kv_map),
                pl.BlockSpec((1, 1, 1, bk), mask_map),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, Dp), q_map),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Tp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray([prior_length], jnp.int32).reshape(1), qp, kp, vp, maskp)
    return out[:, :, :T, :D]
