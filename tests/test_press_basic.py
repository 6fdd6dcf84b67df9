"""Basic press semantics: compressed lengths, top-k keep invariant, no-op at
ratio 0 (reference tests/test_press_call.py, tests/presses/test_presses.py:143-162)."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvpress_tpu import (
    KnormPress,
    RandomPress,
    Runner,
    StreamingLLMPress,
    init_params,
    tiny_config,
)
from kvpress_tpu.cache import shrink


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, Runner.create(cfg)


@pytest.mark.parametrize(
    "press",
    [
        KnormPress(compression_ratio=0.5),
        RandomPress(compression_ratio=0.25),
        StreamingLLMPress(compression_ratio=0.5),
    ],
)
def test_compressed_length(tiny, press):
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 23), 0, cfg.vocab_size)
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    expected = int(23 * (1 - press.compression_ratio))
    assert all(int(l) == expected for l in cache.length)
    assert int(cache.offset) == 23


def test_ratio_zero_is_noop(tiny):
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, cfg.vocab_size)
    _, c0, _ = runner.prefill(params, ids, dtype=jnp.float32)
    _, c1, _ = runner.prefill(
        params, ids, press=KnormPress(compression_ratio=0.0), dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(c0.keys), np.asarray(c1.keys))
    assert all(int(l) == 16 for l in c1.length)


def test_topk_keeps_highest_scored(tiny):
    """Kept keys are exactly the top-scored ones (reference
    test_presses.py:143-162 with a score-recording press)."""
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    _, c_full, _ = runner.prefill(params, ids, dtype=jnp.float32)
    _, c_comp, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    n_kept = press.n_kept(32)
    for layer in range(cfg.num_layers):
        full_k = np.asarray(c_full.keys[layer, 0])    # (Hkv, 32, D)
        comp_k = np.asarray(c_comp.keys[layer, 0, :, :n_kept])
        norms = np.linalg.norm(full_k, axis=-1)       # (Hkv, 32)
        for h in range(cfg.num_kv_heads):
            order = np.argsort(-(-norms[h]))          # ascending norm
            keep_idx = np.argsort(norms[h])[:n_kept]  # lowest norms kept
            expected = full_k[h][np.sort(keep_idx)]
            got = comp_k[h]
            got_sorted = got[np.lexsort(got.T)]
            exp_sorted = expected[np.lexsort(expected.T)]
            np.testing.assert_allclose(got_sorted, exp_sorted, atol=1e-6)


def test_shrink_preserves_decode(tiny):
    """Compression + host shrink must not change subsequent decode logits
    relative to decoding on the unshrunk compressed cache."""
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 40), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    _, cache, _ = runner.prefill(
        params, ids, press=press, max_size=48, dtype=jnp.float32
    )
    next_tok = jnp.asarray([[7]])
    lg_big, _, _ = runner.forward(params, next_tok, cache, logits_last_only=True)
    small = shrink(cache, press.n_kept(40) + 8)
    lg_small, _, _ = runner.forward(params, next_tok, small, logits_last_only=True)
    np.testing.assert_allclose(
        np.asarray(lg_big), np.asarray(lg_small), atol=1e-5, rtol=1e-5
    )


def test_streaming_llm_keeps_sink_and_recent(tiny):
    cfg, params, runner = tiny
    S = 24
    press = StreamingLLMPress(compression_ratio=0.5, n_sink=4)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, S), 0, cfg.vocab_size)
    _, c_full, _ = runner.prefill(params, ids, dtype=jnp.float32)
    _, c_comp, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    n_kept = press.n_kept(S)
    n_pruned = S - n_kept
    keep_idx = np.array([i for i in range(S) if i < 4 or i >= 4 + n_pruned])
    full_k = np.asarray(c_full.keys[0, 0])
    comp_k = np.asarray(c_comp.keys[0, 0, :, :n_kept])
    for h in range(cfg.num_kv_heads):
        exp = full_k[h][keep_idx]
        got = comp_k[h]
        np.testing.assert_allclose(
            got[np.lexsort(got.T)], exp[np.lexsort(exp.T)], atol=1e-6
        )


def test_decode_overflow_flag():
    """Appending into a full cache raises cache.overflowed (the write clamps
    and overwrites tail slots — single-device analogue of the distributed
    decode overflow flag); growing first keeps it False."""
    import kvpress_tpu as kp
    from kvpress_tpu.cache import grow

    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    _, cache, _ = runner.prefill(params, ids, dtype=jnp.float32)
    assert not bool(cache.overflowed)
    assert cache.max_size == 16

    tok = ids[:, -1:]
    _, full, _ = runner.forward(params, tok, cache, logits_last_only=True)
    assert bool(full.overflowed)                   # no room: flag raised
    _, again, _ = runner.forward(params, tok, full, logits_last_only=True)
    assert bool(again.overflowed)                  # and it sticks

    _, ok, _ = runner.forward(params, tok, grow(cache, 4), logits_last_only=True)
    assert not bool(ok.overflowed)
