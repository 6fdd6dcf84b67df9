"""Unified decode-attention kernel (ops/decode.py) correctness on CPU via
interpret mode: dense, masked, sliding-window, int8 and int4 fused-dequant
paths, all against the XLA reference (attention_bias + gqa_attention on the
dequantized buffer). tools/verify_decode_kernel.py re-validates on chip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kvpress_tpu.cache import dequantize_kv, quantize_kv
from kvpress_tpu.ops.attention import attention_bias, gqa_attention
from kvpress_tpu.ops.decode import decode_attention, live_block_table


def _ref(q, k, v, length, mask, window=None, softcap=None):
    """Dense reference over the padded buffer with validity+mask bias."""
    S = k.shape[2]
    T = q.shape[2]
    prior = length - T
    bias = attention_bias(prior, T, S, sliding_window=window, head_mask=mask)
    # validity: slots >= length are dead
    dead = jnp.arange(S) >= length
    bias = jnp.where(dead[None, None, None, :] if bias.ndim == 4 else dead,
                     -2.0e38, bias)
    out, _ = gqa_attention(q, k, v, bias, q.shape[-1] ** -0.5, softcap=softcap)
    return out


CASES = [
    # B, Hq, Hkv, T, S, length, D, window, softcap, masked
    (1, 4, 2, 1, 512, 300, 64, None, None, False),
    (2, 8, 2, 1, 512, 512, 64, None, None, True),
    (1, 4, 2, 4, 640, 500, 64, None, None, True),     # multi-token decode
    (1, 4, 4, 1, 512, 400, 64, 128, None, False),     # sliding window
    (1, 4, 2, 1, 512, 333, 64, None, 30.0, True),     # softcap
    (1, 2, 2, 2, 384, 200, 128, None, None, True),    # D=128
]


@pytest.mark.parametrize(
    "case", CASES, ids=[f"T{c[3]}S{c[4]}L{c[5]}D{c[6]}m{c[9]}" for c in CASES]
)
def test_dense_bf16_matches_reference(case):
    B, Hq, Hkv, T, S, length, D, window, softcap, masked = case
    ks = jax.random.split(jax.random.PRNGKey(hash(case) % 2**31), 4)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    mask = None
    if masked:
        mask = (jax.random.uniform(ks[3], (B, Hkv, S)) > 0.4).at[:, :, :4].set(True)
        # ensure the last T slots (the new tokens) stay attendable
        mask = mask.at[:, :, length - T : length].set(True)
    L = jnp.asarray(length, jnp.int32)

    ref = _ref(q, k, v, L, mask, window, softcap)
    got = decode_attention(
        q, k, v, L, mask=mask, sm_scale=D**-0.5, window=window,
        softcap=softcap, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("masked", [False, True])
def test_quantized_matches_dequant_reference(bits, masked):
    B, Hq, Hkv, T, S, length, D = 2, 8, 2, 1, 512, 400, 64
    ks = jax.random.split(jax.random.PRNGKey(bits + masked), 4)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    mask = None
    if masked:
        mask = (jax.random.uniform(ks[3], (B, Hkv, S)) > 0.4).at[:, :, :4].set(True)
        mask = mask.at[:, :, length - T : length].set(True)
    L = jnp.asarray(length, jnp.int32)

    kq, kscale = quantize_kv(k, bits)
    vq, vscale = quantize_kv(v, bits)
    k_deq = dequantize_kv(kq, kscale, bits, jnp.float32)
    v_deq = dequantize_kv(vq, vscale, bits, jnp.float32)

    ref = _ref(q, k_deq, v_deq, L, mask)
    got = decode_attention(
        q, kq, vq, L, k_scales=kscale, v_scales=vscale, mask=mask,
        bits=bits, sm_scale=D**-0.5, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_block_table_skips_dead_blocks():
    """Compacted-cache pattern: per-head live prefix + appended tail; the
    table must contain exactly the overlapping tiles."""
    B, H, S, bk = 1, 2, 512, 128
    length = jnp.asarray(450, jnp.int32)
    mask = jnp.zeros((B, H, S), bool)
    # head 0: prefix of 100 live + appended [440, 450)
    mask = mask.at[0, 0, :100].set(True).at[0, 0, 440:450].set(True)
    # head 1: prefix of 300
    mask = mask.at[0, 1, :300].set(True).at[0, 1, 440:450].set(True)
    table, count = jax.jit(
        live_block_table, static_argnums=(2, 3, 4, 5)
    )(mask, length, B, H, S, bk)
    assert int(count[0, 0]) == 2          # tile 0 (prefix) + tile 3 (tail)
    assert sorted(np.asarray(table[0, 0, :2]).tolist()) == [0, 3]
    assert int(count[0, 1]) == 4          # tiles 0,1,2 + tile 3
    assert sorted(np.asarray(table[0, 1, :4]).tolist()) == [0, 1, 2, 3]


def test_compacted_headwise_pattern_exact():
    """Whole-tile eviction (the AdaKV compact=True decode shape): kernel
    result must equal the reference exactly even when most tiles are dead."""
    B, Hq, Hkv, T, S, D = 1, 4, 2, 1, 1024, 64
    length = 1024
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    mask = jnp.zeros((B, Hkv, S), bool)
    mask = mask.at[:, 0, :130].set(True)      # head 0: short prefix
    mask = mask.at[:, 1, :900].set(True)      # head 1: long prefix
    mask = mask.at[:, :, -1:].set(True)       # the new token itself
    L = jnp.asarray(length, jnp.int32)

    ref = _ref(q, k, v, L, mask)
    got = decode_attention(
        q, k, v, L, mask=mask, sm_scale=D**-0.5, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_int4_roundtrip_layout():
    """cache.quantize_kv bits=4 uses concatenated-halves nibble packing."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 16), jnp.float32)
    p, s = quantize_kv(x, 4)
    assert p.shape == (1, 2, 8, 8)
    y = dequantize_kv(p, s, 4, jnp.float32)
    assert jnp.max(jnp.abs(y - x)) < 0.2      # 4-bit quantization error bound
    # byte 0 packs channel 0 (lo nibble) with channel 8 (hi nibble)
    q0 = jnp.clip(jnp.round(x[..., 0] / s[..., 0]), -8, 7) + 8
    q8 = jnp.clip(jnp.round(x[..., 8] / s[..., 0]), -8, 7) + 8
    np.testing.assert_array_equal(
        np.asarray(p[..., 0] & 0xF), np.asarray(q0.astype(jnp.uint8))
    )
    np.testing.assert_array_equal(
        np.asarray(p[..., 0] >> 4), np.asarray(q8.astype(jnp.uint8))
    )
