"""Bucketed prefill: padded-to-bucket compilation must produce the same
compressed cache and the same answers as exact-length compilation, for the
padding-safe presses (production serving: one compile per bucket)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.presses import (
    CapPress,
    CompactorPress,
    CURPress,
    LagKVPress,
    LeverageScorePress,
    NonCausalAttnPress,
    KeyDiffPress,
    KnormPress,
    PyramidKVPress,
    ObservedAttentionPress,
    SnapKVPress,
    StreamingLLMPress,
    TOVAPress,
    ExpectedAttentionPress,
)
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, kp.Runner.create(cfg)


# RandomPress is padding-safe but draws shape-dependent randomness, so exact
# kept-set equality with the unpadded compile is not meaningful.
PRESSES = [
    KnormPress(0.5),
    StreamingLLMPress(0.5),
    SnapKVPress(0.5, window_size=8, kernel_size=3),
    TOVAPress(0.5),
    ObservedAttentionPress(0.5),  # chunked colsums with traced valid length
    ExpectedAttentionPress(0.5),  # masked query moments + traced-length RoPE
    PyramidKVPress(0.5, window_size=8, kernel_size=3),  # traced budget pyramid
    KeyDiffPress(0.5),            # anchor = masked mean over valid keys
    CapPress(0.5, n_future_positions=16),  # masked anchor/weights/capacity
    CURPress(0.5, local_window_size=8),    # pad-free block/global normalizers
    LagKVPress(0.5, lag_size=8),  # static block partition + traced boundary
    NonCausalAttnPress(0.5, chunk_size=16),  # block-diagonal chunk masking
    LeverageScorePress(0.5, sketch_dimension=8),  # pad rows zeroed pre-Gram
    CompactorPress(0.5, chunk_size=16, sketch_dimension=8),  # floating end sink
]


@pytest.mark.parametrize("press", PRESSES, ids=[type(p).__name__ for p in PRESSES])
@pytest.mark.parametrize("true_len", [40, 57])
def test_bucketed_matches_exact(tiny, press, true_len):
    cfg, params, runner = tiny
    bucket = 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, true_len), 0, cfg.vocab_size)

    lg_exact, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, compute_logits=True
    )

    ids_pad = jnp.pad(ids, ((0, 0), (0, bucket - true_len)))
    lg_buck, c_buck, _ = runner.prefill(
        params, ids_pad, press=press, dtype=jnp.float32, compute_logits=True,
        valid_len=jnp.asarray(true_len, jnp.int32),
    )

    # same kept counts and logical offset
    np.testing.assert_array_equal(np.asarray(c_exact.length), np.asarray(c_buck.length))
    assert int(c_buck.offset) == true_len
    # same last-position logits
    np.testing.assert_allclose(
        np.asarray(lg_exact), np.asarray(lg_buck), atol=1e-4, rtol=1e-4
    )
    # same kept KV sets per layer/head
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        for h in range(cfg.num_kv_heads):
            a = np.asarray(c_exact.keys[layer, 0, h, :n])
            b = np.asarray(c_buck.keys[layer, 0, h, :n])
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (type(press).__name__, layer, h)


def test_all_scorers_padding_safe():
    """Every scorer press is orthogonal to bucketed serving (round 3: LagKV/
    Compactor family gained dynamic_score; no press should regress)."""
    import kvpress_tpu.presses as presses_mod
    from kvpress_tpu.presses.base import ScorerPress

    bad = [
        name for name in dir(presses_mod)
        if isinstance(c := getattr(presses_mod, name), type)
        and issubclass(c, ScorerPress) and not c.supports_padding
    ]
    assert bad == [], bad


def test_pipeline_bucketing_single_compile(tiny):
    """Different context lengths within one bucket hit the same compiled
    prefill (the production property) and still answer correctly."""
    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = KnormPress(compression_ratio=0.5)

    from kvpress_tpu.pipeline import _prefill

    n0 = _prefill._cache_size()
    for n_words in (20, 27, 33):
        ctx = " ".join(f"w{i}" for i in range(n_words))
        out = pipe(ctx, question="what ?", press=press, max_new_tokens=4,
                   context_bucket=64)
        assert isinstance(out["answer"], str)
    assert _prefill._cache_size() == n0 + 1, "expected exactly one new compile"
