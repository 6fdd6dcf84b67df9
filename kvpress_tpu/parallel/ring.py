"""Ring attention over a context-sharded sequence axis.

The reference has no sequence/context parallelism (SURVEY §2.8) — this is the
TPU-native mechanism for >single-chip prefill: K/V blocks rotate around the
mesh axis with `jax.lax.ppermute` (point-to-point over the ICI ring) while
each device accumulates online-softmax statistics for its local queries;
communication overlaps with the next block's matmul (scaling-book recipe).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -2.0e38


def _block_attend(q, k, v, scale, q_start, k_start, causal,
                  window=None, window_active=None):
    """One (local-q × remote-k) block: returns (unnormalized acc, m, l)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if causal:
        Sq, Sk = q.shape[2], k.shape[2]
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
        allowed = cols <= rows
        if window is not None:
            # Sliding window over GLOBAL positions; window_active (traced
            # bool, e.g. the layer's sliding flag) gates it at run time.
            in_win = cols > rows - window
            if window_active is not None:
                in_win = in_win | ~window_active
            allowed = allowed & in_win
        s = jnp.where(allowed, s, NEG_INF)
    m = jnp.max(s, axis=-1)                                  # (B,H,Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_self_attention(
    q: jax.Array,                    # (B, Hq, S_local, D) — local query shard
    k: jax.Array,                    # (B, Hkv, S_local, D)
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: float,
    causal: bool = True,
    window: Optional[int] = None,
    window_active: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal self-attention with the sequence sharded over ``axis_name``.

    Call inside shard_map. Each step attends the local queries to the K/V
    block currently resident, then rotates that block to the next device.
    After N-1 rotations every query has seen every key. Total comms =
    one all-gather's worth of K/V bytes, but point-to-point and overlapped.

    ``window`` (static) masks keys older than ``window`` positions behind
    each query (Gemma3-style sliding layers); ``window_active`` (traced ()
    bool) turns the window on/off per call so interleaved local/global
    layers share one compiled scan body.
    """
    N = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Hq, Sl, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Sl, D).reshape(B, Hkv * G, Sl, D)

    q_start = idx * Sl

    def step(carry, step_idx):
        k_blk, v_blk, m, l, acc = carry
        src = (idx - step_idx) % N
        k_start = src * Sl
        k_rep = jnp.repeat(k_blk, G, axis=1)
        v_rep = jnp.repeat(v_blk, G, axis=1)
        blk_acc, blk_m, blk_l = _block_attend(
            qg, k_rep, v_rep, sm_scale, q_start, k_start, causal,
            window=window, window_active=window_active,
        )
        m_new = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(blk_m - m_new)
        l = alpha * l + beta * blk_l
        acc = alpha[..., None] * acc + beta[..., None] * blk_acc
        # Rotate K/V to the next device (skippable on the last step, but a
        # uniform schedule keeps the scan body static).
        perm = [(i, (i + 1) % N) for i in range(N)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, acc), None

    m0 = jnp.full((B, Hq, Sl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hq, Sl), jnp.float32)
    acc0 = jnp.zeros((B, Hq, Sl, D), jnp.float32)
    (k_fin, v_fin, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(N)
    )
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l[..., None]).astype(q.dtype)


def ring_flash_self_attention(
    q: jax.Array,                    # (B, Hq, S_local, D)
    k: jax.Array,                    # (B, Hkv, S_local, D)
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: float,
    causal: bool = True,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    window_active: Optional[jax.Array] = None,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Ring attention with the Pallas flash kernel inside each ring step.

    The naive ``ring_self_attention`` materializes a (B, Hq, Sl, Sl) f32
    logit block per step — ~32 GB/step at the 128K/8-shard north star. Here
    each step runs ``flash_attention(q_local, k_remote, v_remote)`` with
    ``prior_length = q_start - k_start`` (slot-index causality shifts the
    diagonal; blocks wholly in the future are skipped with lax.cond before
    any DMA), returning the block output + per-row LSE; blocks combine by
    convex LSE weighting. Peak per-step memory is the kernel's VMEM tiles
    plus one (B, Hq, Sl, D) f32 accumulator — at 128K/8 shards/Hq=32/D=64
    that is 512 MB vs the naive path's 32 GB.

    GQA is folded inside the kernel, so K/V rotate at Hkv width (G× less ICI
    traffic than the repeat-to-Hq XLA path).

    ``window`` (static) + ``window_active`` (traced () bool — e.g. the
    layer's sliding flag inside a stacked-layer scan) run the kernel with a
    sliding window over global positions. Ring blocks wholly OUTSIDE the
    window (entirely in the past) are skipped exactly like future blocks —
    on a sliding layer only ceil(window/Sl)+1 of the N ring steps do work.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Hq, Sl, D = q.shape

    from ..ops.flash import flash_attention

    q_start = idx * Sl

    def step(carry, step_idx):
        k_blk, v_blk, out, lse = carry
        src = (idx - step_idx) % N
        prior = q_start - src * Sl           # diagonal offset; may be negative

        def _run(win):
            o_blk, lse_blk = flash_attention(
                q, k_blk, v_blk, prior,
                sm_scale=sm_scale, softcap=softcap, window=win,
                block_q=block_q, block_k=block_k,
                interpret=interpret, return_lse=True,
            )
            return o_blk.astype(jnp.float32), lse_blk

        if window is not None:
            active = (
                window_active if window_active is not None else jnp.bool_(True)
            )

            def attend(_):
                return jax.lax.cond(
                    active, lambda: _run(window), lambda: _run(None)
                )
        else:
            active = None

            def attend(_):
                return _run(None)

        def skip(_):
            return (
                jnp.zeros((B, Hq, Sl, D), jnp.float32),
                jnp.full((B, Hq, Sl), -jnp.inf, jnp.float32),
            )

        if causal:
            # Block fully in the future ⇒ nothing attends; skip the kernel.
            run = prior + Sl - 1 >= 0
            if window is not None:
                # Windowed layers also skip blocks wholly beyond the window
                # in the past: newest key (prior offset Sl-1 behind the
                # oldest query) already older than `window`.
                run = run & (~active | (prior <= window + Sl - 2))
            o_blk, lse_blk = jax.lax.cond(run, attend, skip, None)
        else:
            o_blk, lse_blk = attend(None)

        lse_new = jnp.logaddexp(lse, lse_blk)
        w_old = jnp.where(
            lse_new == -jnp.inf, 0.0, jnp.exp(lse - lse_new)
        )
        w_blk = jnp.where(
            lse_new == -jnp.inf, 0.0, jnp.exp(lse_blk - lse_new)
        )
        out = w_old[..., None] * out + w_blk[..., None] * o_blk
        perm = [(i, (i + 1) % N) for i in range(N)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, out, lse_new), None

    out0 = jnp.zeros((B, Hq, Sl, D), jnp.float32)
    lse0 = jnp.full((B, Hq, Sl), -jnp.inf, jnp.float32)
    (_, _, out, _), _ = jax.lax.scan(
        step, (k, v, out0, lse0), jnp.arange(N)
    )
    return out.astype(q.dtype)


def context_parallel_attention(q, k, v, mesh: Mesh, *, axis: str = "seq",
                               sm_scale: Optional[float] = None,
                               impl: str = "xla"):
    """Convenience wrapper: shard (B,H,S,D) tensors over ``axis`` on the
    sequence dimension and run ring attention via shard_map.
    impl="flash" runs the Pallas kernel inside each ring step."""
    from jax import shard_map

    sm_scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5
    ring = ring_flash_self_attention if impl == "flash" else ring_self_attention
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring, axis_name=axis, sm_scale=sm_scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ring_self_attention_lse(
    q: jax.Array,                    # (B, Hq, S_local, D)
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """``ring_self_attention`` that ALSO returns each local query's final
    logsumexp (B, Hq, S_local) over its full visible range — the softmax
    denominators the KVCompose column sweep needs (ops/attention.refeed_
    colagg consumes the single-device analogue)."""
    N = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Hq, Sl, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Sl, D).reshape(B, Hkv * G, Sl, D)
    q_start = idx * Sl

    def step(carry, step_idx):
        k_blk, v_blk, m, l, acc = carry
        src = (idx - step_idx) % N
        k_rep = jnp.repeat(k_blk, G, axis=1)
        v_rep = jnp.repeat(v_blk, G, axis=1)
        blk_acc, blk_m, blk_l = _block_attend(
            qg, k_rep, v_rep, sm_scale, q_start, src * Sl, True,
        )
        m_new = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(blk_m - m_new)
        l = alpha * l + beta * blk_l
        acc = alpha[..., None] * acc + beta[..., None] * blk_acc
        perm = [(i, (i + 1) % N) for i in range(N)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, acc), None

    m0 = jnp.full((B, Hq, Sl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hq, Sl), jnp.float32)
    acc0 = jnp.zeros((B, Hq, Sl, D), jnp.float32)
    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(N)
    )
    lse = m + jnp.log(jnp.maximum(l, 1e-38))
    ls = jnp.where(l == 0.0, 1.0, l)
    return (acc / ls[..., None]).astype(q.dtype), lse


def ring_colagg(
    q: jax.Array,                    # (B, Hq, S_local, D) local queries
    k: jax.Array,                    # (B, Hkv, S_local, D) local keys (fixed)
    lse: jax.Array,                  # (B, Hq, S_local) local queries' lse
    *,
    axis_name: str,
    sm_scale: float,
    ctx_len: int,                    # global split: positions < ctx_len are
                                     # context columns, >= ctx_len are the
                                     # re-fed copy (the scoring queries)
    agg: str,                        # "max" | "sum" over scoring queries
    block: int = 512,
) -> jax.Array:
    """KVCompose column aggregation over a ring (the doubled-sequence form
    of ops/attention.refeed_colagg): QUERIES + their lse rotate around the
    axis while each shard's KEYS stay resident, so after N steps every shard
    holds agg_q exp(q·k - lse) for ITS OWN columns over ALL re-fed queries.
    Only queries at global positions >= ctx_len (the re-fed copy)
    contribute, and only columns < ctx_len are meaningful (callers discard
    the re-fed shards' outputs). Every context column precedes every re-fed
    query, so no causal mask is needed inside a contributing block.
    Communication = one all-gather's worth of Q+lse bytes, point-to-point.
    Returns (B, Hq, S_local) f32."""
    N = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Hq, Sl, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    k_start = idx * Sl
    bk = min(block, Sl)
    n_blocks = -(-Sl // bk)
    pad = n_blocks * bk - Sl
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))

    def step(carry, step_idx):
        q_blk, lse_blk, out = carry
        src = (idx - step_idx) % N
        q_start = src * Sl
        qg = q_blk.reshape(B, Hkv, G, Sl, D)
        # scoring-query rows: global position >= ctx_len (the re-fed copy)
        q_pos = q_start + jnp.arange(Sl)
        is_scoring = (q_pos >= ctx_len)[None, None, None, :]

        def col_block(i, out):
            kblk = jax.lax.dynamic_slice_in_dim(kp, i * bk, bk, axis=2)
            s = jnp.einsum(
                "bhgtd,bhsd->bhgts", qg, kblk,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            p = jnp.exp(s - lse_blk.reshape(B, Hkv, G, Sl)[..., None])
            p = jnp.where(is_scoring[..., None], p, 0.0)
            cols = k_start + i * bk + jnp.arange(bk)
            p = jnp.where((cols < ctx_len)[None, None, None, None], p, 0.0)
            part = p.max(axis=3) if agg == "max" else p.sum(axis=3)
            return jax.lax.dynamic_update_slice_in_dim(
                out, part.reshape(B, Hq, bk), i * bk, axis=2
            )

        blk_out = jax.lax.fori_loop(
            0, n_blocks, col_block,
            jnp.zeros((B, Hq, n_blocks * bk), jnp.float32),
        )[..., :Sl]
        out = jnp.maximum(out, blk_out) if agg == "max" else out + blk_out
        perm = [(i, (i + 1) % N) for i in range(N)]
        q_blk = jax.lax.ppermute(q_blk, axis_name, perm)
        lse_blk = jax.lax.ppermute(lse_blk, axis_name, perm)
        return (q_blk, lse_blk, out), None

    out0 = jnp.zeros((B, Hq, Sl), jnp.float32)
    (_, _, out), _ = jax.lax.scan(
        step, (q, lse, out0), jnp.arange(N)
    )
    return out
