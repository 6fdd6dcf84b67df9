"""Decode-time compression semantics (reference
tests/test_decoding_compression.py:52-417): after generation the cache length
lands in [target, target + interval), prefill+decode combos work, and the
decoding press is rejected for multiple questions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvpress_tpu import KnormPress, Runner, StreamingLLMPress, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from kvpress_tpu.presses import (
    CompressionRatioDecodingPress,
    DecodingPress,
    PrefillDecodingPress,
    SnapKVPress,
)
from toy_tokenizer import ToyTokenizer

CONTEXT = " ".join(f"tok{i}" for i in range(48))


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))


def _final_lengths(pipe, press, max_new=24, context=CONTEXT, **kw):
    """Run generation, return per-layer final cache lengths via a probe."""
    import kvpress_tpu.pipeline as P

    captured = {}
    orig = P._generate_answer

    def probe(*args, **kwargs):
        out, n, cache = orig(*args, **kwargs)
        captured["len"] = np.asarray(cache.length)
        captured["n"] = int(n)
        return out, n, cache

    P._generate_answer = probe
    try:
        captured["out"] = pipe(
            context, question="what ?", press=press, max_new_tokens=max_new,
            **kw,
        )
    finally:
        P._generate_answer = orig
    return captured


def test_decoding_press_compresses_to_target(pipe):
    press = DecodingPress(
        base_press=KnormPress(), compression_interval=4, target_size=20,
        hidden_states_buffer_size=8,
    )
    got = _final_lengths(pipe, press, max_new=24)
    n_generated = got["n"]
    assert n_generated >= 8  # enough steps to trigger compression
    for l in got["len"]:
        assert 20 <= l <= 20 + 4 + 2, l   # [target, target+interval) + q slack


def test_compression_ratio_decoding_press(pipe):
    press = CompressionRatioDecodingPress(
        base_press=KnormPress(), compression_interval=4,
        target_compression_ratio=0.5, hidden_states_buffer_size=8,
    )
    got = _final_lengths(pipe, press, max_new=24)
    # total logical tokens ~= 48 ctx + q + generated; kept ≈ half of that.
    for l in got["len"]:
        assert l < 48 + 30, l
        assert l >= 20, l


def test_prefill_decoding_combo(pipe):
    press = PrefillDecodingPress(
        prefilling_press=KnormPress(compression_ratio=0.5),
        decoding_press=DecodingPress(
            base_press=KnormPress(), compression_interval=4, target_size=20,
            hidden_states_buffer_size=4,
        ),
    )
    got = _final_lengths(pipe, press, max_new=16)
    for l in got["len"]:
        assert l <= 26, l


def test_decoding_press_with_snapkv_base(pipe):
    press = DecodingPress(
        base_press=SnapKVPress(window_size=4, kernel_size=3),
        compression_interval=6, target_size=24, hidden_states_buffer_size=8,
    )
    got = _final_lengths(pipe, press, max_new=20)
    for l in got["len"]:
        assert 24 <= l <= 24 + 6 + 2, l


def test_decoding_press_rejects_multiple_questions(pipe):
    press = DecodingPress(base_press=KnormPress(), target_size=16)
    with pytest.raises(ValueError):
        pipe(CONTEXT, questions=["a ?", "b ?"], press=press)


def test_streaming_llm_decoding_keeps_sink_and_recent(pipe):
    press = DecodingPress(
        base_press=StreamingLLMPress(n_sink=4),
        compression_interval=4, target_size=16, hidden_states_buffer_size=0,
    )
    got = _final_lengths(pipe, press, max_new=16)
    for l in got["len"]:
        assert 16 <= l <= 16 + 4 + 2, l


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_decoding_press_quantized_cache(pipe, kv_bits):
    """DecodingPress over the int8/int4 cache: decode_compress_quantized
    compresses the payload buffers to the target without ever building a
    per-step dense buffer (models/llama.py quant_press_decode path)."""
    press = DecodingPress(
        base_press=KnormPress(), compression_interval=4, target_size=20,
        hidden_states_buffer_size=8,
    )
    got = _final_lengths(pipe, press, max_new=24, quantized=True,
                         kv_bits=kv_bits)
    assert got["n"] >= 8
    for l in got["len"]:
        assert 20 <= l <= 20 + 4 + 2, l
    assert isinstance(got["out"]["answer"], str)


def test_quantized_noop_decoding_press_exact(pipe):
    """A DecodingPress whose target never binds must leave the quantized
    decode bit-identical to pressless quantized decode: the payload path
    touches the buffers only inside the interval cond (the old dense path
    requantized the whole buffer EVERY step, drifting int8→f32→int8)."""
    noop = DecodingPress(
        base_press=KnormPress(), compression_interval=3, target_size=4096,
        hidden_states_buffer_size=4,
    )
    plain = pipe(CONTEXT, question="what ?", max_new_tokens=16, quantized=True)
    pressed = pipe(CONTEXT, question="what ?", press=noop, max_new_tokens=16,
                   quantized=True)
    assert plain["answer"] == pressed["answer"]


def test_decode_compress_quantized_gathers_payload():
    """On an interval hit, decode_compress_quantized must produce EXACTLY the
    payload/scale rows the dense path keeps — a gather, not a requantization
    round-trip."""
    from kvpress_tpu.cache import dequantize_kv, quantize_kv
    from kvpress_tpu.presses.base import LayerCtx

    rng = np.random.default_rng(0)
    B, H, S, D, E = 2, 2, 32, 8, 16
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    kq, ks = quantize_kv(k, 8)
    vq, vs = quantize_kv(v, 8)
    k_bf = dequantize_kv(kq, ks, 8, jnp.float32)
    v_bf = dequantize_kv(vq, vs, 8, jnp.float32)

    press = DecodingPress(
        base_press=KnormPress(), compression_interval=2, target_size=12,
        hidden_states_buffer_size=4,
    )
    ctx = LayerCtx(
        layer_idx=jnp.int32(0),
        hidden=jnp.asarray(rng.normal(size=(B, 1, E)), jnp.float32),
        queries=None, queries_prerope=None, keys_prerope=None,
        positions=jnp.full((B, 1), S, jnp.int32),
        attn_probs=None, layer_params=None, inv_freq=None,
    )
    state0 = {
        "buffer": jnp.zeros((B, 4, E), jnp.float32),
        "buf_len": jnp.int32(0),
        "steps": jnp.int32(1),          # next call hits the interval
    }
    length = jnp.int32(S)
    mask = jnp.ones((B, H, S), bool)

    dk, dv, dlen, _, _ = press.decode_compress(
        ctx, k_bf, v_bf, length, mask, dict(state0)
    )
    qk, qv, qks, qvs, qlen, _, _ = press.decode_compress_quantized(
        ctx, kq, vq, ks, vs, 8, length, mask, dict(state0)
    )
    n = int(dlen)
    assert n == int(qlen) == 12
    np.testing.assert_array_equal(
        np.asarray(dequantize_kv(qk, qks, 8, jnp.float32))[:, :, :n],
        np.asarray(dk)[:, :, :n],
    )
    np.testing.assert_array_equal(
        np.asarray(dequantize_kv(qv, qvs, 8, jnp.float32))[:, :, :n],
        np.asarray(dv)[:, :, :n],
    )


def test_cam_press_compresses_to_target(pipe):
    from kvpress_tpu.presses import CAMPress

    press = CAMPress(
        base_press=KnormPress(), compression_interval=4, target_size=20,
        hidden_states_buffer_size=8, merge_budget=4,
    )
    got = _final_lengths(pipe, press, max_new=24)
    assert got["n"] >= 8
    for l in got["len"]:
        assert 20 <= l <= 20 + 4 + 2, l


def test_cam_merge_preserves_norm_scale(pipe):
    """CAM must not blow up value magnitudes: decode runs to completion and
    produces finite logits (merge weights are clipped to [0,1])."""
    from kvpress_tpu.presses import CAMPress

    press = CAMPress(
        base_press=KnormPress(), compression_interval=3, target_size=16,
        hidden_states_buffer_size=4, merge_budget=2,
    )
    out = pipe(CONTEXT, question="what ?", press=press, max_new_tokens=20)
    assert isinstance(out["answer"], str) and len(out["answer"]) > 0
