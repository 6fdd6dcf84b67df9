"""The press × wrapper cross-product smoke matrix (reference
tests/presses/test_presses.py:64-110 + default_presses.py): every scorer press
under every wrapper must prefill, compress coherently, and decode finitely on
the tiny model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.cache import masked_fraction
from kvpress_tpu.presses import (
    AdaKVPress,
    CapPress,
    ChunkPress,
    ComposedPress,
    CriticalAdaKVPress,
    CriticalKVPress,
    CURPress,
    DMSPress,
    ExpectedAttentionPress,
    KeyDiffPress,
    KeyRerotationPress,
    KnormPress,
    LagKVPress,
    MergingPress,
    NonCausalAttnPress,
    ObservedAttentionPress,
    RandomPress,
    SnapKVPress,
    StreamingLLMPress,
    ThinKPress,
    TOVAPress,
)

S = 48
RATIO = 0.25

SCORERS = [
    KnormPress(RATIO),
    RandomPress(RATIO),
    StreamingLLMPress(RATIO),
    SnapKVPress(RATIO, window_size=8, kernel_size=3),
    TOVAPress(RATIO),
    ExpectedAttentionPress(RATIO, n_future_positions=16),
    KeyDiffPress(RATIO),
    LagKVPress(RATIO, lag_size=8),
    CURPress(RATIO),
    CapPress(RATIO, n_future_positions=16),
    NonCausalAttnPress(RATIO, chunk_size=16),
    ObservedAttentionPress(RATIO),  # chunked colsum path under wrappers
]

WRAPPERS = [
    ("plain", lambda p: p),
    ("adakv", lambda p: AdaKVPress(press=p)),
    ("critical", lambda p: CriticalKVPress(press=p)),
    ("critical_adakv", lambda p: CriticalAdaKVPress(press=p)),
    ("rerotate", lambda p: KeyRerotationPress(press=p)),
    ("chunk", lambda p: ChunkPress(press=p, chunk_length=16)),
    ("merging", lambda p: MergingPress(press=p)),
    ("dms", lambda p: DMSPress(press=p, threshold=-1e9, sliding_window_size=8)),
    ("composed_think", lambda p: ComposedPress(
        presses=(p, ThinKPress(key_channel_compression_ratio=0.5, window_size=8))
    )),
]


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)
    return cfg, params, runner, ids


@pytest.mark.parametrize("wname,wrap", WRAPPERS, ids=[w[0] for w in WRAPPERS])
@pytest.mark.parametrize(
    "scorer", SCORERS, ids=[type(s).__name__ for s in SCORERS]
)
def test_matrix(tiny, wname, wrap, scorer):
    cfg, params, runner, ids = tiny
    press = wrap(scorer)
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)

    lengths = np.asarray(cache.length)
    assert (lengths >= 1).all() and (lengths <= S).all()
    if wname in ("plain", "rerotate", "chunk", "merging"):
        # gather-based: exact kept length
        assert (lengths <= int(S * (1 - RATIO)) + 1).all(), (wname, lengths)
    if wname in ("adakv", "critical_adakv"):
        # mask-based: masked fraction equals the requested ratio
        frac = float(masked_fraction(cache))
        assert abs(frac - RATIO) < 0.05, (wname, frac)

    # one decode step stays finite and appends
    logits, cache2, _ = runner.forward(
        params, ids[:, -1:], cache, logits_last_only=True
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert (np.asarray(cache2.length) == lengths + 1).all()


@pytest.mark.parametrize("wname,wrap", WRAPPERS[:2], ids=["plain", "adakv"])
@pytest.mark.parametrize(
    "scorer", SCORERS, ids=[type(s).__name__ for s in SCORERS]
)
def test_matrix_quantized_int4(tiny, wname, wrap, scorer):
    """The reference integration bar runs every press over QuantizedCache
    too (tests/integration/test_ruler.py): every scorer (+ AdaKV wrapper)
    must compress and decode over the packed-int4 cache — presses score the
    dense values (storage-only quantization), storage stays payload-width."""
    cfg, params, runner, ids = tiny
    press = wrap(scorer)
    _, cache, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=True, kv_bits=4
    )
    assert cache.keys.dtype == jnp.uint8
    lengths = np.asarray(cache.length)
    assert (lengths >= 1).all() and (lengths <= S).all()
    logits, cache2, _ = runner.forward(
        params, ids[:, -1:], cache, logits_last_only=True
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert (np.asarray(cache2.length) == lengths + 1).all()
