"""Chunked prefill: bounded-activation prefill + final-chunk compression must
match the exact-length prefill (kept sets and downstream decode) for content
and window scorers. This is the single-chip long-context enabler (8B@128K:
the exact prefill's (S, F) MLP intermediate OOMs a 16 GB chip; per-chunk
activations do not)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu import (
    KnormPress,
    PyramidKVPress,
    Runner,
    SnapKVPress,
    StreamingLLMPress,
    TOVAPress,
    init_params,
    tiny_config,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, kp.Runner.create(cfg)


PRESSES = [
    KnormPress(0.5),
    StreamingLLMPress(0.5),
    TOVAPress(0.5),
    SnapKVPress(0.5, window_size=8, kernel_size=3),   # window <= chunk
    PyramidKVPress(0.5, window_size=8, kernel_size=3),  # per-layer budgets
]


@pytest.mark.parametrize("press", PRESSES, ids=[type(p).__name__ for p in PRESSES])
def test_chunked_matches_exact(tiny, press):
    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)

    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )

    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    assert int(c_chunk.offset) == S
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        for h in range(cfg.num_kv_heads):
            a = np.asarray(c_exact.keys[layer, 0, h, :n])
            b = np.asarray(c_chunk.keys[layer, 0, h, :n])
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (type(press).__name__, layer, h)

    # greedy decode from both caches agrees (positions continue from S)
    def decode(cache, steps=6):
        tok = ids[:, -1:]
        outs = []
        for _ in range(steps):
            logits, cache, _ = runner.forward(
                params, tok, cache, logits_last_only=True
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            outs.append(int(tok[0, 0]))
        return outs

    from kvpress_tpu.cache import grow

    assert decode(grow(c_exact, 8)) == decode(grow(c_chunk, 8))


def test_chunked_quantized_int4(tiny):
    """Chunked prefill over the packed-int4 cache: payload-width compression
    (dequant only inside the final cond), kept counts equal to the exact
    quantized prefill."""
    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, S), 0, cfg.vocab_size)
    press = KnormPress(0.5)

    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=True, kv_bits=4
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32,
        quantized=True, kv_bits=4,
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    # Quantized attention order differs between paths (the one-shot path
    # with a press attends fresh bf16 K/V for the whole context — the press
    # needs dense keys anyway — while lean chunks read payloads for past
    # chunks), so hidden states drift at quantization scale and, on a RANDOM
    # tiny model where Knorm ranks are noise-dominated, kept-set equality vs
    # one-shot is not meaningful. Assert integrity instead — every kept row
    # must be one of the tokens' quantized keys from an identical-semantics
    # pressless chunked run (the payload-width gather never corrupts rows).
    from kvpress_tpu.cache import dequantize_kv

    _, c_full, _ = runner.prefill_chunked(
        params, ids, chunk_size=chunk, dtype=jnp.float32, quantized=True,
        kv_bits=4,
    )
    kf = np.asarray(dequantize_kv(c_full.keys, c_full.key_scales, 4,
                                  jnp.float32))
    kc = np.asarray(dequantize_kv(c_chunk.keys, c_chunk.key_scales, 4,
                                  jnp.float32))
    for layer in range(cfg.num_layers):
        n = int(c_chunk.length[layer])
        for h in range(cfg.num_kv_heads):
            d = np.linalg.norm(kc[layer, 0, h, :n][:, None]
                               - kf[layer, 0, h, :S][None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (layer, h)


def test_chunked_ragged_length(tiny):
    """Non-multiple context lengths: the ragged remainder runs first so the
    compressing final chunk stays full — kept sets still match exact."""
    cfg, params, runner = tiny
    S, chunk = 50, 16
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, S), 0, cfg.vocab_size)
    press = SnapKVPress(0.5, window_size=8, kernel_size=3)
    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    assert int(c_chunk.offset) == S
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        for h in range(cfg.num_kv_heads):
            a = np.asarray(c_exact.keys[layer, 0, h, :n])
            b = np.asarray(c_chunk.keys[layer, 0, h, :n])
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (layer, h)


def test_chunked_rejects_unsupported_presses(tiny):
    """Presses with neither a chunked_compress nor scorer-like contract
    (BlockPress's iterative streaming selection) still need the one-shot
    path."""
    cfg, params, runner = tiny
    from kvpress_tpu.presses import BlockPress

    ids = jnp.zeros((1, 64), jnp.int32)
    with pytest.raises(AssertionError, match="BlockPress cannot run"):
        runner.prefill_chunked(params, ids,
                               press=BlockPress(press=KnormPress(0.5)),
                               chunk_size=16, dtype=jnp.float32)


def test_chunked_single_compile(tiny):
    """All full chunks share one compiled program; a second, longer context
    with the same cache bucket (max_size) reuses both programs — compile
    count is one per (chunk_size, cache bucket), independent of context
    length."""
    cfg, params, runner = tiny
    from kvpress_tpu.models.llama import _chunk_forward_lean, _compress_layer

    press = KnormPress(0.5)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 64), 0, cfg.vocab_size)
    runner.prefill_chunked(params, ids, press=press, chunk_size=16,
                           max_size=128, dtype=jnp.float32)
    n0 = _chunk_forward_lean._cache_size() + _compress_layer._cache_size()
    ids2 = jax.random.randint(jax.random.PRNGKey(4), (1, 128), 0,
                              cfg.vocab_size)
    runner.prefill_chunked(params, ids2, press=press, chunk_size=16,
                           max_size=128, dtype=jnp.float32)
    assert (_chunk_forward_lean._cache_size()
            + _compress_layer._cache_size()) == n0, "zero new compiles"


def test_pipeline_context_chunk(tiny):
    """pipe(..., context_chunk=...) answers identically to the one-shot
    prefill path (greedy, ScorerPress)."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = SnapKVPress(compression_ratio=0.5, window_size=8, kernel_size=3)
    ctx = " ".join(f"w{i}" for i in range(45))
    a_exact = pipe(ctx, question="what ?", press=press, max_new_tokens=5)
    a_chunk = pipe(ctx, question="what ?", press=press, max_new_tokens=5,
                   context_chunk=16)
    assert a_exact["answer"] == a_chunk["answer"]


def test_chunked_sliding_window_model():
    """Gemma3-style interleaved sliding/global layers: chunked prefill
    matches exact prefill (sliding layers keep everything — compression
    skips them; global layers compress via the host loop)."""
    cfg = tiny_config(num_layers=4, sliding_window=8,
                      rope_local_base_freq=500.0,
                      layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, S), 0, cfg.vocab_size)
    press = KnormPress(0.5)
    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    sliding = cfg.sliding_flags()
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        if sliding[layer]:
            assert n == S          # never compressed
        for h in range(cfg.num_kv_heads):
            a = np.asarray(c_exact.keys[layer, 0, h, :n])
            b = np.asarray(c_chunk.keys[layer, 0, h, :n])
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (layer, h)
