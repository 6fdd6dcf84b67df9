"""Fused causal softmax column sums for ObservedAttention scoring.

The XLA fallback (ops/attention.py chunked_observed_colsums) is HBM-bound:
every S×S logit chunk round-trips to HBM for the softmax (measured 11.3s for
16 layers at 32K on v5e vs 2.15s for the whole Knorm prefill). Here the
logits stay in VMEM across two MXU passes:

  pass 1 (lse): flash-style online softmax statistics per query row,
    emitting logsumexp (B, Hkv, G, T) — no V pass, half a flash kernel.
  pass 2 (colsum): re-computes each tile's logits and accumulates the
    normalized probabilities exp(s - lse) column-wise into the output block,
    iterating query blocks innermost so each (b, h, k-block) output tile is
    revisited and accumulated in VMEM.

Prefill-only contract (reference observed_attention_press.py:34-49 reads
eager ``attentions`` — prefill is the only phase it ever sees): queries are
slot-aligned with keys (S == T, prior_length == 0), causal, no head mask.
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


def _lse_kernel(
    q_ref,                     # (1, 1, G, bq, D)
    k_ref,                     # (1, 1, bk, D)
    lse_ref,                   # (1, 1, G*bq, 1) f32 — sublane-laid rows
    m_scr,                     # (G*bq, LANES) f32
    l_scr,                     # (G*bq, LANES) f32
    *,
    G: int,
    bq: int,
    bk: int,
    n_k: int,
    S: int,
    sm_scale: float,
    softcap: Optional[float],
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)

    @pl.when(ki * bk <= qi * bq + bq - 1)
    def _run():
        D = q_ref.shape[-1]
        q = q_ref[0, 0].reshape(G * bq, D)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        rows = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 0) % bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 1)
        q_slot = qi * bq + rows
        k_slot = ki * bk + cols
        s = jnp.where((k_slot <= q_slot) & (k_slot < S), s, NEG_INF)

        m_prev = m_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next

    @pl.when(ki == n_k - 1)
    def _store():
        m = m_scr[...][:, :1]
        l = l_scr[...][:, :1]
        lse_ref[0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))   # (G*bq, 1)


def _colsum_kernel(
    q_ref,                     # (1, 1, G, bq, D)   — indexed by qi
    k_ref,                     # (1, 1, bk, D)      — indexed by ki
    lse_ref,                   # (1, 1, G*bq, 1) f32 — indexed by qi
    o_ref,                     # (1, 1, G, bk) f32  — indexed by ki, revisited
    *,
    G: int,
    bq: int,
    bk: int,
    S: int,
    sm_scale: float,
    softcap: Optional[float],
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(qi * bq + bq - 1 >= ki * bk)
    def _run():
        D = q_ref.shape[-1]
        q = q_ref[0, 0].reshape(G * bq, D)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        rows = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 0) % bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (G * bq, bk), 1)
        q_slot = qi * bq + rows
        k_slot = ki * bk + cols
        # q_slot < S also zeroes padded query rows (their lse is finite).
        allowed = (k_slot <= q_slot) & (k_slot < S) & (q_slot < S)
        s = jnp.where(allowed, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0])                        # (G*bq, bk)
        # Per-group row sums via 2D slices (a 2D→3D reshape+reduce fails
        # Mosaic layout inference: "unsupported shape cast").
        for g in range(G):
            o_ref[0, 0, g : g + 1, :] += p[g * bq : (g + 1) * bq].sum(
                axis=0, keepdims=True
            )


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "softcap", "block_q", "block_k", "interpret"),
)
def observed_colsums_flash(
    q: jax.Array,                    # (B, Hq, S, D) — slot-aligned prefill
    k: jax.Array,                    # (B, Hkv, S, D)
    lse: Optional[jax.Array] = None,  # (B, Hq, S) f32 — reuse the flash
    # prefill pass's row logsumexp (flash_attention return_lse) and skip
    # pass 1 entirely: one MXU sweep instead of two.
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:                      # (B, Hq, S) f32 causal softmax col sums
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    bq = min(block_q, up(S, 8))
    bk = min(block_k, up(S, LANES))
    Tq, Sp = up(S, bq), up(S, bk)
    Dp = D if D % LANES == 0 or D in (64,) else up(D, LANES)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tq - S), (0, Dp - D)))
    qp = qp.reshape(B, Hkv, G, Tq, Dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    n_q, n_k = Tq // bq, Sp // bk

    if lse is not None:
        # Re-lay (B, Hq, S) → the (B, Hkv, n_q*G*bq, 1) row layout pass 2
        # expects (rows nested (qi, g, r)). Padded rows are masked by
        # q_slot < S in the kernel; 0 is a safe filler.
        lse_rows = lse.reshape(B, Hkv, G, S)
        lse_rows = jnp.pad(lse_rows, ((0, 0), (0, 0), (0, 0), (0, Tq - S)))
        lse_rows = lse_rows.reshape(B, Hkv, G, n_q, bq).transpose(0, 1, 3, 2, 4)
        lse = lse_rows.reshape(B, Hkv, n_q * G * bq, 1)
    else:
        lse = pl.pallas_call(
        functools.partial(
            _lse_kernel, G=G, bq=bq, bk=bk, n_k=n_k, S=S,
            sm_scale=sm_scale, softcap=softcap,
        ),
        grid=(B, Hkv, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, G, bq, Dp), lambda b, h, qi, ki: (b, h, 0, qi, 0)),
            pl.BlockSpec((1, 1, bk, Dp), lambda b, h, qi, ki: (b, h, ki, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G * bq, 1), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((G * bq, LANES), jnp.float32),
            pltpu.VMEM((G * bq, LANES), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_q * G * bq, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp)

    cols = pl.pallas_call(
        functools.partial(
            _colsum_kernel, G=G, bq=bq, bk=bk, S=S,
            sm_scale=sm_scale, softcap=softcap,
        ),
        grid=(B, Hkv, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, G, bq, Dp), lambda b, h, ki, qi: (b, h, 0, qi, 0)),
            pl.BlockSpec((1, 1, bk, Dp), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, G * bq, 1), lambda b, h, ki, qi: (b, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, bk), lambda b, h, ki, qi: (b, h, 0, ki)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Sp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, lse)

    return cols[..., :S].reshape(B, Hq, S)
