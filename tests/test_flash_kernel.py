"""Flash-attention kernel correctness on CPU via Pallas interpret mode (the
same kernel runs compiled on TPU; tools/ scripts re-validate on chip)."""


import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kvpress_tpu.ops.attention import attention_bias, gqa_attention
from kvpress_tpu.ops.flash import flash_attention

CASES = [
    # B, Hq, Hkv, T, S, D, prior, window, softcap
    (1, 4, 2, 256, 256, 64, 0, None, None),
    (2, 8, 4, 200, 200, 64, 0, None, None),
    (1, 4, 2, 128, 640, 128, 512, None, None),     # decode-ish: prior cache
    (1, 4, 4, 256, 256, 64, 0, 64, None),          # sliding window
    (1, 4, 2, 130, 130, 64, 0, None, 30.0),        # softcap + ragged T
]


@pytest.mark.parametrize("case", CASES, ids=[f"T{c[3]}S{c[4]}p{c[6]}" for c in CASES])
def test_flash_matches_reference(case):
    B, Hq, Hkv, T, S, D, prior, window, softcap = case
    ks = jax.random.split(jax.random.PRNGKey(T + S + prior), 4)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    mask = (jax.random.uniform(ks[3], (B, Hkv, S)) > 0.2).at[:, :, :8].set(True)

    bias = attention_bias(
        jnp.asarray(prior, jnp.int32), T, S, sliding_window=window, head_mask=mask
    )
    ref, _ = gqa_attention(q, k, v, bias, D**-0.5, softcap=softcap)
    got = flash_attention(
        q, k, v, jnp.asarray(prior, jnp.int32), mask,
        sm_scale=D**-0.5, window=window, softcap=softcap,
        block_q=64, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_chunked_window_probs_mean_matches_dense():
    from kvpress_tpu.ops.attention import (
        chunked_window_probs_mean,
        window_attention_probs,
    )

    B, Hq, Hkv, W, S, D = 1, 4, 2, 16, 640, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    q = jax.random.normal(ks[0], (B, Hq, W, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    prior = jnp.asarray(S - W, jnp.int32)
    dense = window_attention_probs(q, k, D**-0.5, prior).mean(axis=-2)
    chunked = chunked_window_probs_mean(q, k, D**-0.5, prior, chunk=128)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), atol=1e-6)




QUANT_CASES = [
    # bits, B, Hq, Hkv, T, S, D, prior, window, softcap
    (8, 1, 4, 2, 128, 128, 64, 0, None, None),
    (4, 1, 4, 2, 128, 128, 64, 0, None, None),
    (8, 2, 8, 4, 100, 356, 64, 256, None, None),   # prior cache, ragged
    (4, 1, 4, 2, 130, 386, 128, 256, 64, 30.0),    # window + softcap + D128
]


@pytest.mark.parametrize(
    "case", QUANT_CASES, ids=[f"b{c[0]}T{c[4]}S{c[5]}p{c[7]}" for c in QUANT_CASES]
)
def test_flash_quant_matches_xla(case):
    """Fused-dequant flash == quant_gqa_attention (same algebraic scales):
    the payload-width prefill path (chunked 8B@128K) must match the XLA
    quantized reference bit-for-bit up to f32 reduction order."""
    from kvpress_tpu.cache import quantize_kv
    from kvpress_tpu.ops.attention import quant_gqa_attention
    from kvpress_tpu.ops.flash import flash_attention_quant

    bits, B, Hq, Hkv, T, S, D, prior, window, softcap = case
    ks = jax.random.split(jax.random.PRNGKey(bits + T + S), 4)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    mask = (jax.random.uniform(ks[3], (B, Hkv, S)) > 0.2).at[:, :, :8].set(True)
    qk, k_sc = quantize_kv(k, bits)
    qv, v_sc = quantize_kv(v, bits)

    bias = attention_bias(
        jnp.asarray(prior, jnp.int32), T, S, sliding_window=window,
        head_mask=mask,
    )
    ref = quant_gqa_attention(q, qk, qv, k_sc, v_sc, bias, D**-0.5, bits,
                              softcap=softcap)
    got = flash_attention_quant(
        q, qk, qv, k_sc, v_sc, jnp.asarray(prior, jnp.int32), mask,
        bits=bits, sm_scale=D**-0.5, window=window, softcap=softcap,
        block_q=64, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_flash_image_span_or_mask():
    """Same-image bidirectional or-mask (Gemma3 token_type_ids): flash with
    group-id vectors == XLA attention with the extra_allow bias; and it must
    actually differ from pure causal at the image spans."""
    B, Hq, Hkv, T, D = 1, 4, 2, 96, 32
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)

    tt = np.zeros((B, T), np.int64)
    tt[0, 10:14] = 1
    tt[0, 40:44] = 1
    is_img = jnp.asarray(tt == 1)
    new_start = is_img & ~jnp.pad(is_img, ((0, 0), (1, 0)))[:, :-1]
    group = jnp.where(is_img, jnp.cumsum(new_start, axis=1) - 1, -1)

    ea = (group[:, :, None] >= 0) & (group[:, :, None] == group[:, None, :])
    bias = attention_bias(jnp.asarray(0, jnp.int32), T, T, extra_allow=ea)
    ref, _ = gqa_attention(q, k, v, bias, D**-0.5)

    got = flash_attention(
        q, k, v, jnp.asarray(0, jnp.int32), None,
        q_groups=group.astype(jnp.int32), k_groups=group.astype(jnp.int32),
        or_span=4, sm_scale=D**-0.5, block_q=32, block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    causal = flash_attention(q, k, v, jnp.asarray(0, jnp.int32), None,
                             sm_scale=D**-0.5, block_q=32, block_k=32,
                             interpret=True)
    assert np.abs(np.asarray(got) - np.asarray(causal)).max() > 1e-3

def test_flash_image_span_overrides_window():
    """or_span > window: a same-image key farther behind the query than the
    sliding window must still be attended (HF shares mask_kwargs between the
    causal and sliding masks). Regression: the kernel's window block-skip
    once dropped whole KV blocks the or-mask needed (max err 0.497)."""
    B, Hq, Hkv, T, D = 1, 2, 1, 32, 32
    window, span = 8, 16
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)

    tt = np.zeros((B, T), np.int64)
    tt[0, 4:20] = 1                     # one 16-token image span
    is_img = jnp.asarray(tt == 1)
    new_start = is_img & ~jnp.pad(is_img, ((0, 0), (1, 0)))[:, :-1]
    group = jnp.where(is_img, jnp.cumsum(new_start, axis=1) - 1, -1)

    ea = (group[:, :, None] >= 0) & (group[:, :, None] == group[:, None, :])
    bias = attention_bias(jnp.asarray(0, jnp.int32), T, T,
                          sliding_window=window, extra_allow=ea)
    ref, _ = gqa_attention(q, k, v, bias, D**-0.5)

    got = flash_attention(
        q, k, v, jnp.asarray(0, jnp.int32), None,
        q_groups=group.astype(jnp.int32), k_groups=group.astype(jnp.int32),
        window=window, or_span=span, sm_scale=D**-0.5,
        block_q=8, block_k=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_flash_quant_return_lse_matches_dense():
    """flash_attention_quant(return_lse=True): output AND logsumexp equal
    the dense reference over int8 payloads (the KVCompose chunked re-feed
    consumes this lse in its blockwise column sweep)."""
    from kvpress_tpu.cache import dequantize_kv, quantize_kv
    from kvpress_tpu.ops.flash import flash_attention_quant

    B, Hq, Hkv, T, S, D, prior = 1, 4, 2, 64, 192, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    qk, k_sc = quantize_kv(k, 8)
    qv, v_sc = quantize_kv(v, 8)
    kd = dequantize_kv(qk, k_sc, 8, jnp.float32)
    vd = dequantize_kv(qv, v_sc, 8, jnp.float32)

    o, lse = flash_attention_quant(
        q, qk, qv, k_sc, v_sc, jnp.asarray(prior, jnp.int32), None,
        bits=8, sm_scale=D**-0.5, block_q=32, block_k=64, interpret=True,
        return_lse=True,
    )
    bias = attention_bias(jnp.asarray(prior, jnp.int32), T, S)
    ref, _ = gqa_attention(q, kd, vd, bias, D**-0.5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)
    # reference lse from the dense logits
    G = Hq // Hkv
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", q.reshape(B, Hkv, G, T, D), kd,
        preferred_element_type=jnp.float32,
    ) * D**-0.5 + bias[None, None, None]
    ref_lse = jax.nn.logsumexp(logits, axis=-1).reshape(B, Hq, T)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-4)


@pytest.mark.parametrize("agg", ["max", "sum"])
@pytest.mark.parametrize("bits", [None, 8, 4])
def test_refeed_colagg_matches_probs(agg, bits):
    """refeed_colagg (KVCompose chunked sweep): blockwise exp(s - lse)
    aggregation onto the context columns equals aggregating the dense
    softmax probs directly, for bf16 and quantized payload buffers."""
    from kvpress_tpu.cache import dequantize_kv, quantize_kv
    from kvpress_tpu.ops.attention import refeed_colagg

    B, Hq, Hkv, T, D = 1, 4, 2, 32, 64
    ctx_len, S_buf = 100, 192
    prior = ctx_len                    # re-feed chunk appended after ctx
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S_buf, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S_buf, D), jnp.float32)
    if bits is not None:
        kb, k_sc = quantize_kv(k, bits)
        k_eff = dequantize_kv(kb, k_sc, bits, jnp.float32)
    else:
        kb, k_sc, k_eff = k, None, k

    bias = attention_bias(jnp.asarray(prior, jnp.int32), T, S_buf)
    _, probs = gqa_attention(q, k_eff, v, bias, D**-0.5, return_probs=True)
    pc = probs[..., :ctx_len].astype(jnp.float32)
    ref = pc.max(axis=2) if agg == "max" else pc.sum(axis=2)

    G = Hq // Hkv
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", q.reshape(B, Hkv, G, T, D), k_eff,
        preferred_element_type=jnp.float32,
    ) * D**-0.5 + bias[None, None, None]
    lse = jax.nn.logsumexp(logits, axis=-1).reshape(B, Hq, T)

    got = refeed_colagg(q, kb, k_sc, bits or 8, lse, ctx_len, agg,
                        D**-0.5, block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_refeed_colagg_small_buffer_large_block():
    """Regression (round-5 review): a block larger than the context (or a
    buffer barely bigger than ctx_len) must clamp/pad instead of slicing
    past the buffer — the pipeline presizes exactly 2*ctx for KVCompose."""
    from kvpress_tpu.ops.attention import refeed_colagg

    B, Hq, Hkv, T, D = 1, 4, 2, 16, 64
    ctx_len, S_buf = 100, 116            # tight: ctx + one small chunk
    ks = jax.random.split(jax.random.PRNGKey(8), 2)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S_buf, D), jnp.float32)
    bias = attention_bias(jnp.asarray(ctx_len, jnp.int32), T, S_buf)
    _, probs = gqa_attention(q, k, k, bias, D**-0.5, return_probs=True)
    ref = probs[..., :ctx_len].astype(jnp.float32).max(axis=2)
    G = Hq // Hkv
    logits = jnp.einsum(
        "bhgtd,bhsd->bhgts", q.reshape(B, Hkv, G, T, D), k,
        preferred_element_type=jnp.float32,
    ) * D**-0.5 + bias[None, None, None]
    lse = jax.nn.logsumexp(logits, axis=-1).reshape(B, Hq, T)
    got = refeed_colagg(q, k, None, 8, lse, ctx_len, "max", D**-0.5,
                        block=512)        # default block >> ctx
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
