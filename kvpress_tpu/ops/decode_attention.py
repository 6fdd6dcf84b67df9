"""Paged masked-decode attention: single/few-token attention over a cache
whose keep-mask has evicted entries head-wise (AdaKV/Duo/KVzip/DMS caches).

The reference's head-wise eviction cannot save bandwidth — its fake-key patch
still attends every slot (attention_patch.py:47 'does not reduce peak
memory'). Here the kv buffer is viewed as pages; a page table of
still-live pages per (batch, kv-head) is built on the fly, and the Pallas
kernel walks ONLY live pages (scalar-prefetched indices drive the BlockSpec
index maps, the paged-attention pattern), skipping the DMA and compute of
fully-evicted pages entirely.

STATUS (round 1, v5e-lite measurements at B=1/Hq=32/S=32K/D=64): numerically
exact (3e-4 vs f32 reference on chip), but 1.4 ms/call vs 1.1 ms for the
dense XLA path even at 87.5% masked — per-call page-table construction and
32 KB page DMAs currently outweigh the skipped reads at single-batch decode.
Kept as an experimental op (see CLAUDE.md) pending batch folding, larger
pages with double-buffered manual DMA, and a persistent page table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e38
LANES = 128


def build_page_table(mask: jax.Array, length: jax.Array, page_size: int):
    """mask (B, Hkv, S) keep-bits; length () valid slots.
    Returns (page_idx (B, Hkv, P) int32 — live pages compacted front,
             page_count (B, Hkv) int32)."""
    B, Hkv, S = mask.shape
    P = S // page_size
    slot_valid = jnp.arange(S, dtype=jnp.int32)[None, None] < length
    live = (mask & slot_valid).reshape(B, Hkv, P, page_size).any(-1)
    order = jnp.argsort(jnp.where(live, 0, 1), axis=-1, stable=True)
    count = live.sum(-1).astype(jnp.int32)
    return order.astype(jnp.int32), count


def _kernel(
    page_idx_ref,              # scalar prefetch (B, Hkv, P) int32
    count_ref,                 # scalar prefetch (B, Hkv) int32
    length_ref,                # scalar prefetch (1,) int32
    q_ref,                     # (1, 1, G*T, D)
    k_ref,                     # (1, 1, page, D)   — page selected by index map
    v_ref,                     # (1, 1, page, D)
    mask_ref,                  # (1, 1, 1, 1, page) bool
    o_ref,                     # (1, 1, G*T, D)
    m_scr, l_scr, acc_scr,
    *,
    page: int,
    n_pages: int,
    T: int,
    sm_scale: float,
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
        D = q_ref.shape[-1]
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                      # (G*T, page)

        page_start = page_idx_ref[b, h, ki] * page
        rows = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], page), 0) % T
        cols = page_start + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], page), 1
        )
        prior = length_ref[0] - T
        allowed = cols <= prior + rows                    # causal over new T
        allowed = jnp.logical_and(allowed, mask_ref[0, 0, 0, 0][None, :])
        s = jnp.where(allowed, s, NEG_INF)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha[:, :D] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_pages - 1)
    def _store():
        D = o_ref.shape[-1]
        l = l_scr[...][:, :D]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "page_size", "interpret")
)
def masked_decode_attention(
    q: jax.Array,                     # (B, Hq, T, D), T small (1..8)
    k: jax.Array,                     # (B, Hkv, S, D)
    v: jax.Array,
    mask: jax.Array,                  # (B, Hkv, S) keep-bits
    length: jax.Array,                # () int32 — valid slots incl. the new T
    *,
    sm_scale: float,
    page_size: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, T, D = q.shape
    _, Hkv, S, _ = k.shape
    G = Hq // Hkv

    def up(x, m):
        return -(-x // m) * m

    Sp = up(S, page_size)
    Dp = D if (D % LANES == 0 or D == 64) else up(D, LANES)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    maskp = jnp.pad(mask, ((0, 0), (0, 0), (0, Sp - S)), constant_values=False)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    qp = qp.reshape(B, Hkv, G * T, Dp)
    rows = max(G * T, 8)
    qp = jnp.pad(qp, ((0, 0), (0, 0), (0, rows - G * T), (0, 0)))

    page_idx, count = build_page_table(maskp, length, page_size)
    n_pages = Sp // page_size
    # (B, Hkv, P, 1, page): legal (1, page) tiles for the bool input.
    maskp = maskp.reshape(B, Hkv, n_pages, 1, page_size)

    grid = (B, Hkv, n_pages)
    kernel = functools.partial(
        _kernel, page=page_size, n_pages=n_pages, T=T, sm_scale=sm_scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, rows, Dp),
                    lambda b, h, ki, idx, cnt, ln: (b, h, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, page_size, Dp),
                    lambda b, h, ki, idx, cnt, ln: (b, h, idx[b, h, ki], 0),
                ),
                pl.BlockSpec(
                    (1, 1, page_size, Dp),
                    lambda b, h, ki, idx, cnt, ln: (b, h, idx[b, h, ki], 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, 1, page_size),
                    lambda b, h, ki, idx, cnt, ln: (b, h, idx[b, h, ki], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rows, Dp), lambda b, h, ki, idx, cnt, ln: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rows, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_idx, count, jnp.asarray([length], jnp.int32).reshape(1),
        qp, kp, vp, maskp,
    )
    return out[:, :, : G * T].reshape(B, Hq, T, Dp)[..., :D]
