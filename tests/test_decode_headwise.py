"""Per-head-length decode kernel (ops/decode_headwise.py): interpret-mode
equality against dense masked attention, and the mask→(prefix, tail)
derivation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kvpress_tpu.ops.attention import NEG_INF, gqa_attention
from kvpress_tpu.ops.decode_headwise import (
    decode_attention_headwise, prefix_tail_from_mask,
)


def make_case(seed, B=2, Hq=4, Hkv=2, S=96, D=16, T=1, tail=3):
    """Compacted-cache shape: per-head live prefix + shared appended tail."""
    rng = np.random.default_rng(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    prefix = rng.integers(5, 40, (B, Hkv)).astype(np.int32)
    tail_start = int(prefix.max()) + 7          # slack between prefix and tail
    length = tail_start + tail                   # tail includes this call's T
    mask = np.zeros((B, Hkv, S), bool)
    for b in range(B):
        for h in range(Hkv):
            mask[b, h, : prefix[b, h]] = True
    mask[:, :, tail_start:length] = True
    mask[:, :, length:] = rng.random((B, Hkv, S - length)) < 0.5  # stale bits
    return q, k, v, jnp.asarray(prefix), jnp.asarray(mask), tail_start, length


def dense_reference(q, k, v, mask, length, T):
    """gqa_attention with the equivalent bias (stale bits clamped away)."""
    B, Hkv, S = mask.shape
    col = jnp.arange(S)[None, None]
    live = mask & (col < length)
    # causal within the appended tail: row t is global slot length - T + t
    bias = jnp.where(live, 0.0, NEG_INF)[:, :, None, :]     # (B, Hkv, 1, S)
    bias = jnp.broadcast_to(bias, (B, Hkv, T, S)).copy()
    rows = jnp.arange(T)[None, None, :, None]
    causal = col[:, :, None] <= (length - T + rows)
    bias = jnp.where(causal, bias, NEG_INF)
    out, _ = gqa_attention(q, k, v, bias, q.shape[-1] ** -0.5)
    return out


def test_prefix_tail_from_mask():
    q, k, v, prefix, mask, tail_start, length = make_case(0)
    pl_, ts, tl = prefix_tail_from_mask(mask, jnp.asarray(length))
    np.testing.assert_array_equal(np.asarray(pl_), np.asarray(prefix))
    assert int(ts) == tail_start
    assert int(tl) == length - tail_start


def test_prefix_tail_uncompacted_mask():
    """All-True mask (no compaction): prefix = length, empty tail."""
    mask = jnp.ones((1, 2, 32), bool)
    pl_, ts, tl = prefix_tail_from_mask(mask, jnp.asarray(20))
    assert (np.asarray(pl_) == 20).all()
    assert int(tl) == 0


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("T", [1, 4])
def test_headwise_kernel_matches_dense(seed, T):
    q, k, v, prefix, mask, tail_start, length = make_case(seed, T=T, tail=6)
    pl_, ts, tl = prefix_tail_from_mask(mask, jnp.asarray(length))
    got = decode_attention_headwise(
        q, k, v, pl_, ts, tl, sm_scale=q.shape[-1] ** -0.5,
        block_k=32, interpret=True,
    )
    want = dense_reference(q, k, v, mask, length, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_headwise_kernel_empty_head():
    """A head with zero live slots must produce zeros, not NaNs."""
    q, k, v, prefix, mask, tail_start, length = make_case(2)
    prefix = prefix.at[0, 0].set(0)
    mask = mask.at[0, 0, :tail_start].set(False)
    pl_, ts, tl = prefix_tail_from_mask(mask, jnp.asarray(length))
    got = decode_attention_headwise(
        q, k, v, pl_, ts, tl, sm_scale=q.shape[-1] ** -0.5,
        block_k=32, interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()


def test_headwise_kernel_softcap():
    q, k, v, prefix, mask, tail_start, length = make_case(3)
    pl_, ts, tl = prefix_tail_from_mask(mask, jnp.asarray(length))
    got = decode_attention_headwise(
        q, k, v, pl_, ts, tl, sm_scale=q.shape[-1] ** -0.5, softcap=30.0,
        block_k=32, interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()
