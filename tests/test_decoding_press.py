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


def _final_lengths(pipe, press, max_new=24, context=CONTEXT):
    """Run generation, return per-layer final cache lengths via a probe."""
    import kvpress_tpu.pipeline as P

    captured = {}
    orig = P._generate_answer

    def probe(*args, **kw):
        out, n, cache = orig(*args, **kw)
        captured["len"] = np.asarray(cache.length)
        captured["n"] = int(n)
        return out, n, cache

    P._generate_answer = probe
    try:
        pipe(context, question="what ?", press=press, max_new_tokens=max_new)
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
