"""Split-cache Duo decode (ops/duo_decode.py) must match the dense
masked-decode path EXACTLY in kept-set semantics: same attendable set per
head per step, so teacher-forced logits agree to float tolerance.

Reference contract: duo_attention_press.py:88-118 (streaming heads see
sink + recent + all decode-time tokens; the mask is frozen after prefill).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kvpress_tpu import Runner, init_params, tiny_config
from kvpress_tpu.cache import grow
from kvpress_tpu.ops.duo_decode import build_duo_split, duo_decode_step
from kvpress_tpu.presses.duo import DuoAttentionPress


@pytest.fixture(scope="module")
def duo_setup():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    rng = np.random.default_rng(0)
    L, H = cfg.num_layers, cfg.num_kv_heads
    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=3, recent_size=5,
        head_scores=rng.random((L, H)).astype(np.float32),
    )
    ids = jnp.asarray(
        rng.permutation(cfg.vocab_size)[: 2 * 40].reshape(2, 40)
    ).astype(jnp.int32)
    return cfg, params, runner, press, ids


def test_duo_split_matches_dense_masked_decode(duo_setup):
    cfg, params, runner, press, ids = duo_setup
    n_new = 6

    # dense path: masked cache, greedy decode
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    cache = grow(cache, n_new + 2)
    ds = build_duo_split(cache, press.streaming_mask(), press.sink_size,
                         press.recent_size, room=n_new + 2)

    tok = ids[:, -1:]
    tok_s = ids[:, -1:]
    for step in range(n_new):
        dense_logits, cache, _ = runner.forward(
            params, tok, cache, logits_last_only=True
        )
        tok_split, split_logits, ds = duo_decode_step(
            params, tok_s, ds, runner=runner
        )
        dl = np.asarray(dense_logits[:, -1], np.float32)
        sl = np.asarray(split_logits, np.float32)
        np.testing.assert_allclose(sl, dl, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {step}")
        # teacher-force the dense argmax into both paths
        tok = jnp.argmax(dense_logits, axis=-1).astype(jnp.int32)
        tok_s = tok


def test_duo_split_buffer_sizes(duo_setup):
    """The streaming buffer is sink+recent+room — the bandwidth win."""
    cfg, params, runner, press, ids = duo_setup
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    ds = build_duo_split(cache, press.streaming_mask(), press.sink_size,
                         press.recent_size, room=4)
    S = ids.shape[1]
    assert ds.keys_s.shape[3] == press.sink_size + press.recent_size + 4
    assert ds.keys_s.shape[3] < S
    assert int(jnp.max(ds.len_s)) == press.sink_size + press.recent_size
    # every kv head appears exactly once in the merge permutation
    sm = press.streaming_mask()
    hr = ds.retr_idx.shape[1]
    for l in range(cfg.num_layers):
        n_r = int((~sm[l]).sum())
        srcs = sorted(
            int(ds.retr_idx[l, j]) for j in range(n_r)
        ) + sorted(int(ds.stream_idx[l, j]) for j in range(int(sm[l].sum())))
        assert sorted(srcs) == list(range(cfg.num_kv_heads))
        inv = np.asarray(ds.inv_idx[l])
        assert len(set(inv.tolist())) == cfg.num_kv_heads


def test_duo_split_rejects_sliding_models():
    cfg = tiny_config(sliding_window=8)
    if cfg.sliding_window is None:
        pytest.skip("tiny_config has no sliding_window knob")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    rng = np.random.default_rng(0)
    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=2, recent_size=4,
        head_scores=rng.random((cfg.num_layers, cfg.num_kv_heads)).astype(
            np.float32),
    )
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:32][None]).astype(
        jnp.int32)
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    ds = build_duo_split(cache, press.streaming_mask(), 2, 4, room=4)
    with pytest.raises(AssertionError, match="sliding"):
        duo_decode_step(params, ids[:, -1:], ds, runner=runner)


def test_duo_split_short_context_and_room(duo_setup):
    """Regression (round-3 review): (a) sink <= length < sink+recent must
    keep the MOST RECENT tokens (the old tail slice overlapped the head and
    dropped them); (b) build_duo_split must reserve decode room itself on a
    full prefill cache (no external grow)."""
    cfg, params, runner, press, _ = duo_setup
    rng = np.random.default_rng(3)
    # length 6: sink=3 <= 6 < sink+recent=8
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:12].reshape(2, 6)
                      ).astype(jnp.int32)
    n_new = 4

    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32,
                                 max_size=8 + n_new + 2)
    # no grow: room reservation is build_duo_split's job
    _, cache_full, _ = runner.prefill(params, ids, press=press,
                                      dtype=jnp.float32, max_size=8)
    ds = build_duo_split(cache_full, press.streaming_mask(), press.sink_size,
                         press.recent_size, room=n_new + 2)
    cache = grow(cache, 0)

    tok = tok_s = ids[:, -1:]
    for step in range(n_new):
        dense_logits, cache, _ = runner.forward(
            params, tok, cache, logits_last_only=True
        )
        tok_split, split_logits, ds = duo_decode_step(
            params, tok_s, ds, runner=runner
        )
        np.testing.assert_allclose(
            np.asarray(split_logits, np.float32),
            np.asarray(dense_logits[:, -1], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=f"step {step}",
        )
        nxt = jnp.argmax(dense_logits[:, -1], axis=-1).astype(jnp.int32)
        tok = tok_s = nxt[:, None]


def test_duo_split_composes_with_chunked_prefill():
    """Round 5: Duo now compresses through prefill_chunked — the split-cache
    capacity decode must build from a chunk-prefilled masked cache and
    produce the same tokens as the dense masked decode."""
    import kvpress_tpu as kp
    from kvpress_tpu.presses import DuoAttentionPress

    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    rng = np.random.default_rng(21)
    S = 64
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:S][None], jnp.int32)
    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=4, recent_size=8,
        head_scores=rng.random((cfg.num_layers, cfg.num_kv_heads)),
    )
    _, cache, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=16, max_size=S + 12,
        dtype=jnp.float32,
    )
    ds = build_duo_split(cache, press.streaming_mask(), press.sink_size,
                         press.recent_size, room=10)
    from kvpress_tpu.cache import grow

    dense = grow(cache, 10)
    tok = ids[:, -1:]
    tok_s = ids[:, -1:]
    for step in range(6):
        logits, dense, _ = runner.forward(params, tok, dense,
                                          logits_last_only=True)
        tok_split, split_logits, ds = duo_decode_step(params, tok_s, ds,
                                                      runner=runner)
        np.testing.assert_allclose(
            np.asarray(split_logits, np.float32),
            np.asarray(logits[:, -1], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=f"step {step}",
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok_s = tok
