"""Chunked-prefill composition with wrapper / head-wise / multi-pass presses
(VERDICT r3 items 1-2): AdaKV family, KeyRerotation, Chunk, Composed,
CriticalKV and PerLayerCompression compress through prefill_chunked's
host-loop per-layer pass; KVzip runs its repeat passes and FastKVzip its
gate collection + post-mask over a chunk-prefilled cache. Kept sets / masks
must equal the one-shot path (content scorers score identically; window
scorers match when their window fits the scoring window)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu import KnormPress, SnapKVPress
from kvpress_tpu.presses import (
    AdaKVPress,
    ChunkPress,
    ComposedPress,
    CriticalAdaKVPress,
    CriticalKVPress,
    KeyRerotationPress,
    PerLayerCompressionPress,
    ThinKPress,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, kp.Runner.create(cfg)


WRAPPERS = [
    AdaKVPress(press=KnormPress(0.5)),
    AdaKVPress(press=KnormPress(0.5), compact=True),
    AdaKVPress(press=SnapKVPress(0.5, window_size=8, kernel_size=3)),
    CriticalAdaKVPress(press=KnormPress(0.5)),
    CriticalAdaKVPress(press=KnormPress(0.5), compact=True),
    KeyRerotationPress(press=KnormPress(0.5)),
    ChunkPress(press=KnormPress(0.5), chunk_length=16),
    # NOTE: stage scorers must be per-position for exactness (the one-shot
    # path rescopes pooling scorers like KeyDiff to the stage-1 survivor
    # slice; the chunked rank composition scores the full buffer).
    ComposedPress(presses=(KnormPress(0.25), KnormPress(0.5))),
    ComposedPress(presses=(
        ThinKPress(key_channel_compression_ratio=0.5, window_size=8),
        KnormPress(0.5),
    )),
    CriticalKVPress(press=KnormPress(0.5)),
    PerLayerCompressionPress(
        press=KnormPress(0.5),
        compression_ratios=tuple(
            0.25 + 0.25 * (i % 2) for i in range(kp.tiny_config().num_layers)
        ),
    ),
]
IDS = [
    "adakv", "adakv_compact", "adakv_snapkv", "cadakv", "cadakv_compact",
    "rerotation", "chunk", "composed", "composed_think", "criticalkv",
    "perlayer",
]


def _decode(runner, params, cache, ids, steps=6):
    from kvpress_tpu.cache import grow

    cache = grow(cache, 8)
    tok = ids[:, -1:]
    outs = []
    for _ in range(steps):
        logits, cache, _ = runner.forward(
            params, tok, cache, logits_last_only=True
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(int(tok[0, 0]))
    return outs


@pytest.mark.parametrize("press", WRAPPERS, ids=IDS)
def test_chunked_wrapper_matches_exact(tiny, press):
    """Kept sets (buffer prefixes / keep-mask bits), per-layer lengths and
    greedy continuation equal the one-shot prefill."""
    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)

    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )

    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    if getattr(press, "headwise_mask", False):
        me = np.asarray(
            c_exact.mask if c_exact.mask is not None
            else np.ones((cfg.num_layers, 1, cfg.num_kv_heads, S), bool)
        )
        mc = np.asarray(c_chunk.mask)
        # Per-layer per-head kept-slot COUNTS must agree; compare kept KEY
        # sets below (compact=True reorders slots, so bitwise mask equality
        # only holds for compact=False).
        if not getattr(press, "compact", False):
            np.testing.assert_array_equal(me[..., :S], mc[..., :S])

    # kept keys: every valid (unmasked) row in the chunked cache appears in
    # the exact cache's valid rows
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        for h in range(cfg.num_kv_heads):
            a = np.asarray(c_exact.keys[layer, 0, h, :n])
            b = np.asarray(c_chunk.keys[layer, 0, h, :n])
            if c_exact.mask is not None:
                a = a[np.asarray(c_exact.mask[layer, 0, h, :n])]
            if c_chunk.mask is not None:
                b = b[np.asarray(c_chunk.mask[layer, 0, h, :n])]
            assert a.shape == b.shape, (layer, h, a.shape, b.shape)
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (type(press).__name__, layer, h)

    if getattr(press, "rerotates", False):
        import dataclasses

        c_exact = dataclasses.replace(c_exact, offset=jnp.max(c_exact.length))
        c_chunk = dataclasses.replace(c_chunk, offset=jnp.max(c_chunk.length))
    assert _decode(runner, params, c_exact, ids) == \
        _decode(runner, params, c_chunk, ids)


@pytest.mark.parametrize(
    "press",
    [AdaKVPress(press=KnormPress(0.5), compact=True),
     KeyRerotationPress(press=KnormPress(0.5))],
    ids=["adakv_compact", "rerotation"],
)
def test_chunked_wrapper_quantized(tiny, press):
    """Wrapper compression over the packed-int4 chunked cache: payload-width
    gathers (scales ride along; rerotated keys requantize) — kept lengths
    match the dense chunked run and decode stays sane."""
    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, S), 0, cfg.vocab_size)

    _, c_dense, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    _, c_q, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32,
        quantized=True, kv_bits=4,
    )
    # int4 scoring noise can flip near-tie ranks, moving a slot between
    # heads (which shifts the max-head length AdaKV compaction reports), so
    # assert the BUDGET invariant instead of exact per-layer lengths:
    # total kept slots across heads == H * n_kept for every layer.
    if getattr(press, "headwise_mask", False):
        n_kept = S // 2
        H = cfg.num_kv_heads
        assert int(c_q.max_size) == S
        counts = np.asarray(c_q.mask).sum(axis=(-1, -2, -3))     # per layer
        np.testing.assert_array_equal(
            counts, np.full(cfg.num_layers, H * n_kept)
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(c_dense.length), np.asarray(c_q.length)
        )
    from kvpress_tpu.cache import dequantize_kv

    kq = np.asarray(dequantize_kv(c_q.keys, c_q.key_scales, 4, jnp.float32))
    assert np.isfinite(kq).all()
    if getattr(press, "rerotates", False):
        import dataclasses

        c_q = dataclasses.replace(c_q, offset=jnp.max(c_q.length))
    outs = _decode(runner, params, c_q, ids)
    assert len(outs) == 6


def test_pipeline_context_chunk_wrapper(tiny):
    """pipe(..., context_chunk=...) with an AdaKV wrapper answers identically
    to the one-shot path."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = AdaKVPress(press=KnormPress(0.5), compact=True)
    ctx = " ".join(f"w{i}" for i in range(45))
    a_exact = pipe(ctx, question="what ?", press=press, max_new_tokens=5)
    a_chunk = pipe(ctx, question="what ?", press=press, max_new_tokens=5,
                   context_chunk=16)
    assert a_exact["answer"] == a_chunk["answer"]


def test_kvzip_over_chunked_prefill(tiny):
    """KVzip multi-pass (repeat-chunk scoring) over a chunk-prefilled cache:
    the eviction mask and answers equal the one-shot path (KVzip is natively
    chunked — reference kvzip_press.py:204-264)."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import KVzipPress

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = KVzipPress(compression_ratio=0.5, chunk_size=16)
    ctx = " ".join(f"tok{i}" for i in range(60))
    a_exact = pipe(ctx, questions=["what ?", "again ?"], press=press,
                   max_new_tokens=5)
    a_chunk = pipe(ctx, questions=["what ?", "again ?"], press=press,
                   max_new_tokens=5, context_chunk=16)
    assert a_exact["answers"] == a_chunk["answers"]


def test_fastkvzip_over_chunked_prefill(tiny):
    """FastKVzip gate scores collected per chunk + post-mask: scores and the
    resulting keep-mask match the one-shot collector."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses.fastkvzip import FastKVzipPress, init_random_gates

    cfg, params, runner = tiny
    gates = init_random_gates(jax.random.PRNGKey(7), cfg, output_dim=8,
                              sink=4)
    press = FastKVzipPress(compression_ratio=0.5, n_sink=2,
                           window_ratio=0.1, gates=gates)
    S, chunk = 64, 16
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, S), 0, cfg.vocab_size)

    _, _, st_exact = runner.prefill(params, ids, press=press,
                                    dtype=jnp.float32)
    _, _, st_chunk = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(st_exact["scores"]), np.asarray(st_chunk["scores"]),
        rtol=2e-3, atol=2e-5,
    )

    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"tok{i}" for i in range(60))
    a_exact = pipe(ctx, question="what ?", press=press, max_new_tokens=5)
    a_chunk = pipe(ctx, question="what ?", press=press, max_new_tokens=5,
                   context_chunk=16)
    assert a_exact["answer"] == a_chunk["answer"]


def test_serving_context_chunk_wrapper_admission(tiny):
    """Chunked admission with an AdaKV wrapper press serves the same answers
    as exact-prefill admission."""
    import sys
    sys.path.insert(0, "tests")
    from kvpress_tpu.serving import Request, ServingEngine

    cfg, params, runner = tiny
    press = AdaKVPress(press=KnormPress(0.5), compact=True)
    rng = np.random.default_rng(9)
    reqs = [
        Request(rng.permutation(cfg.vocab_size)[:n].tolist(),
                rng.permutation(cfg.vocab_size)[:q].tolist(),
                max_new_tokens=5)
        for n, q in [(50, 4), (64, 8), (33, 4)]
    ]
    base = ServingEngine(runner, params, n_slots=2, capacity=96, press=press,
                         question_bucket=4, fetch_lag=2)
    chunked = ServingEngine(runner, params, n_slots=2, capacity=96,
                            press=press, question_bucket=4, fetch_lag=2,
                            context_chunk=16)
    assert base.run(reqs) == chunked.run(reqs)


def test_decoding_press_over_chunked_prefill(tiny):
    """DecodingPress (compresses_prefill=False) through context_chunk: the
    chunked prefill must INITIALIZE the press state it defers (a None state
    crashed DecodingPress._advance inside the decode trace — round-4 review
    finding), and the answer must match the one-shot path."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = DecodingPress(base_press=KnormPress(0.5), target_size=24,
                          compression_interval=4, hidden_states_buffer_size=8)
    ctx = " ".join(f"w{i}" for i in range(45))
    a_exact = pipe(ctx, question="what ?", press=press, max_new_tokens=8)
    a_chunk = pipe(ctx, question="what ?", press=press, max_new_tokens=8,
                   context_chunk=16)
    assert a_exact["answer"] == a_chunk["answer"]


def test_merging_press_rejected_by_chunked_prefill(tiny):
    """MergingPress is NOT scorer-like (merge-on-evict would silently turn
    into plain eviction through the BudgetDecodingPress path) — the chunked
    prefill must reject it with the clear assertion, not an AttributeError."""
    from kvpress_tpu.presses import MergingPress

    cfg, params, runner = tiny
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 48)), jnp.int32)
    with pytest.raises(AssertionError, match="ScorerPress"):
        runner.prefill_chunked(
            params, ids, press=MergingPress(press=KnormPress(0.5)),
            chunk_size=16, dtype=jnp.float32,
        )


# ---------------------------------------------------------------------- #
# DMS / Duo through chunked prefill (VERDICT r4 item 2)


def _knorm_threshold(runner, params, cfg, ids, pct=40):
    """A threshold inside the actual knorm score range (-||k||) so the DMS
    tests evict a meaningful fraction regardless of weight init scale."""
    _, cache, _ = runner.prefill(params, ids, dtype=jnp.float32)
    norms = -np.linalg.norm(
        np.asarray(cache.keys[..., : ids.shape[1], :], np.float32), axis=-1
    )
    return float(np.percentile(norms, pct))


def test_dms_knorm_chunked_matches_exact(tiny):
    """DMS(Knorm) through prefill_chunked: threshold mask AND the decode
    ring state (scores/count/first_slot) equal the one-shot path bit for
    bit (knorm is per-token-local, so per-chunk scoring is exact)."""
    from kvpress_tpu.presses import DMSPress

    cfg, params, runner = tiny
    S, chunk, W = 64, 16, 24
    ids = jnp.asarray(np.random.default_rng(2).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    thr = _knorm_threshold(runner, params, cfg, ids)
    press = DMSPress(press=KnormPress(), threshold=thr, sliding_window_size=W)

    _, c_exact, st_exact = runner.prefill(
        params, ids, press=press, dtype=jnp.float32
    )
    _, c_chunk, st_chunk = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    me = np.asarray(c_exact.mask[..., :S])
    mc = np.asarray(c_chunk.mask[..., :S])
    np.testing.assert_array_equal(me, mc)
    assert 0.05 < (~me).mean() < 0.8          # the threshold actually evicts
    for k in ("scores", "count", "first_slot"):
        np.testing.assert_allclose(
            np.asarray(st_exact[k]), np.asarray(st_chunk[k]), rtol=1e-6,
            err_msg=k,
        )
    assert _decode(runner, params, c_exact, ids) == \
        _decode(runner, params, c_chunk, ids)


def test_dms_knorm_chunked_quantized(tiny):
    """DMS through the quantized chunked path: per-chunk scores are computed
    on cache-width (dequantized) keys — identical to what the one-shot
    quantized path scores."""
    from kvpress_tpu.presses import DMSPress

    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jnp.asarray(np.random.default_rng(3).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    thr = _knorm_threshold(runner, params, cfg, ids)
    press = DMSPress(press=KnormPress(), threshold=thr, sliding_window_size=24)

    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=True
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32,
        quantized=True,
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.mask[..., :S]), np.asarray(c_chunk.mask[..., :S])
    )


def test_dms_kvzap_chunked_matches_exact(tiny):
    """DMS(KVzap) — the reference leaderboard's threshold protocol
    (evaluation/leaderboard.sh, dms_press.py:69-130) — through chunked
    prefill: surrogate scores are per-token (MLP of the token's own hidden
    state), so the chunked mask and ring state are exact."""
    from kvpress_tpu.presses import DMSPress, KVzapPress

    cfg, params, runner = tiny
    S, chunk = 64, 16
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:S][None], jnp.int32)
    L, E, H = cfg.num_layers, cfg.hidden_size, cfg.num_kv_heads
    surrogate = {
        "w": jnp.asarray(rng.normal(0, 0.5, (L, E, H)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, (L, H)), jnp.float32),
    }
    press = DMSPress(press=KVzapPress(surrogate=surrogate), threshold=0.0,
                     sliding_window_size=24)

    _, c_exact, st_exact = runner.prefill(
        params, ids, press=press, dtype=jnp.float32
    )
    _, c_chunk, st_chunk = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    me = np.asarray(c_exact.mask[..., :S])
    mc = np.asarray(c_chunk.mask[..., :S])
    np.testing.assert_array_equal(me, mc)
    assert 0.05 < (~me).mean() < 0.95
    for k in ("scores", "count", "first_slot"):
        # surrogate scores: different HLOs reassociate the MLP float ops
        np.testing.assert_allclose(
            np.asarray(st_exact[k]), np.asarray(st_chunk[k]), atol=1e-5,
            err_msg=k,
        )


def test_dms_unscorable_base_rejected(tiny):
    """DMS over a scorer with no per-token chunk_score_fn (SnapKV's window
    attention needs cross-token context) is rejected with the documented
    assertion, not a silent wrong answer."""
    from kvpress_tpu.presses import DMSPress

    cfg, params, runner = tiny
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 48)), jnp.int32)
    press = DMSPress(press=SnapKVPress(0.5, window_size=8), threshold=0.0)
    with pytest.raises(AssertionError, match="chunk_score_fn"):
        runner.prefill_chunked(
            params, ids, press=press, chunk_size=16, dtype=jnp.float32
        )


def test_duo_chunked_matches_exact(tiny):
    """DuoAttentionPress through prefill_chunked: the streaming-head
    sink/recent mask equals the one-shot path (position-only eviction; the
    static S guard becomes a traced-length predicate)."""
    from kvpress_tpu.presses import DuoAttentionPress

    cfg, params, runner = tiny
    S, chunk = 64, 16
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:S][None], jnp.int32)
    scores = rng.random((cfg.num_layers, cfg.num_kv_heads))
    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=4, recent_size=8,
        head_scores=scores,
    )

    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    me = np.asarray(c_exact.mask[..., :S])
    mc = np.asarray(c_chunk.mask[..., :S])
    np.testing.assert_array_equal(me, mc)
    assert 0.1 < (~me).mean() < 0.8           # streaming heads were pruned
    assert _decode(runner, params, c_exact, ids) == \
        _decode(runner, params, c_chunk, ids)


@pytest.mark.parametrize("short", [True, False])
def test_duo_chunked_quantized_and_short(tiny, short):
    """Quantized Duo chunked == quantized one-shot; a context shorter than
    sink+recent prunes nothing on either path (the traced guard)."""
    from kvpress_tpu.presses import DuoAttentionPress

    cfg, params, runner = tiny
    S = 10 if short else 64
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:S][None], jnp.int32)
    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=4, recent_size=8,
        head_scores=rng.random((cfg.num_layers, cfg.num_kv_heads)),
    )
    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=True
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=16, dtype=jnp.float32,
        quantized=True,
    )
    me = np.asarray(
        c_exact.mask[..., :S] if c_exact.mask is not None
        else np.ones((cfg.num_layers, 1, cfg.num_kv_heads, S), bool)
    )
    mc = np.asarray(c_chunk.mask[..., :S])
    np.testing.assert_array_equal(me, mc)
    if short:
        assert (~mc).sum() == 0


# ---------------------------------------------------------------------- #
# Structural presses through chunked prefill (VERDICT r4 item 2 tail):
# ThinK, SimLayerKV, ChunkKV, Finch admitted; Block documented-rejected.


@pytest.mark.parametrize("quantized", [False, True])
def test_think_chunked_matches_exact(tiny, quantized):
    """ThinK (channel pruning) through prefill_chunked: channel selection
    from window-query energy x valid-prefix key energy equals the one-shot
    path; zeroed channels match."""
    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jnp.asarray(np.random.default_rng(7).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    press = ThinKPress(key_channel_compression_ratio=0.5, window_size=8)

    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=quantized
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32,
        quantized=quantized,
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    if quantized:
        from kvpress_tpu.cache import dequantize_kv

        ke = np.asarray(dequantize_kv(c_exact.keys, c_exact.key_scales, 8,
                                      jnp.float32)[..., :S, :])
        kc = np.asarray(dequantize_kv(c_chunk.keys, c_chunk.key_scales, 8,
                                      jnp.float32)[..., :S, :])
        # int8 noise can flip ONE near-tie channel rank; demand the zeroed
        # channel sets agree to >99.9% and the values stay close
        assert ((ke == 0) == (kc == 0)).mean() > 0.999
        np.testing.assert_allclose(ke, kc, atol=0.05)
    else:
        ke = np.asarray(c_exact.keys[..., :S, :], np.float32)
        kc = np.asarray(c_chunk.keys[..., :S, :], np.float32)
        # the zeroed channel sets must agree exactly; surviving values equal
        np.testing.assert_array_equal(ke == 0, kc == 0)
        np.testing.assert_allclose(ke, kc, atol=2e-5)
    assert (ke == 0).mean() > 0.4            # half the key channels zeroed


def test_simlayerkv_chunked_matches_exact(tiny):
    """SimLayerKV through prefill_chunked: per-layer lazy detection from the
    last query's attention over the valid prefix; lazy layers truncate to
    sink+recent on both paths, per-layer lengths and kept keys equal."""
    from kvpress_tpu.presses import SimLayerKVPress

    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jnp.asarray(np.random.default_rng(8).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    press = SimLayerKVPress(lazy_threshold=0.15, n_last=1, n_recent=8,
                            n_initial=4)

    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        np.testing.assert_allclose(
            np.asarray(c_exact.keys[layer, ..., :n, :], np.float32),
            np.asarray(c_chunk.keys[layer, ..., :n, :], np.float32),
            atol=2e-5, err_msg=f"layer {layer}",
        )
    # a near-zero threshold marks every layer lazy -> all truncate
    lazy_all = SimLayerKVPress(lazy_threshold=0.01, n_last=1, n_recent=8,
                               n_initial=4)
    _, c_lazy, _ = runner.prefill_chunked(
        params, ids, press=lazy_all, chunk_size=chunk, dtype=jnp.float32
    )
    assert int(jnp.max(c_lazy.length)) < S
    assert _decode(runner, params, c_exact, ids) == \
        _decode(runner, params, c_chunk, ids)


@pytest.mark.parametrize("quantized", [False, True])
def test_chunkkv_chunked_matches_exact(tiny, quantized):
    """ChunkKV (keep whole top chunks) through prefill_chunked: per-chunk
    masked means + traced budget + rank selection reproduce the one-shot
    chunk choice, including the partial tail chunk."""
    from kvpress_tpu.presses import ChunkKVPress

    cfg, params, runner = tiny
    S, chunk = 70, 16          # 70 = 3 full score-chunks of 20 + tail of 10
    ids = jnp.asarray(np.random.default_rng(9).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    press = ChunkKVPress(press=KnormPress(0.5), chunk_length=20)

    _, c_exact, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, quantized=quantized
    )
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32,
        quantized=quantized,
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    from kvpress_tpu.cache import dequantize_kv
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        if quantized:
            a = dequantize_kv(c_exact.keys[layer], c_exact.key_scales[layer],
                              8, jnp.float32)[..., :n, :]
            b = dequantize_kv(c_chunk.keys[layer], c_chunk.key_scales[layer],
                              8, jnp.float32)[..., :n, :]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.05, err_msg=f"layer {layer}")
        else:
            # same kept set; raw floats reassociate between the two HLOs
            np.testing.assert_allclose(
                np.asarray(c_exact.keys[layer, ..., :n, :], np.float32),
                np.asarray(c_chunk.keys[layer, ..., :n, :], np.float32),
                atol=2e-5, err_msg=f"layer {layer}",
            )
    if not quantized:
        assert _decode(runner, params, c_exact, ids) == \
            _decode(runner, params, c_chunk, ids)


@pytest.mark.parametrize("rerotate", [False, True])
@pytest.mark.parametrize("chunk_length", [None, 24])
def test_finch_chunked_prefill_matches_exact(tiny, rerotate, chunk_length):
    """Finch through prefill_chunked (window fits the scoring window):
    normalized window scores, per-span budgets and optional key re-rotation
    equal the one-shot path."""
    from kvpress_tpu.presses import FinchPress

    cfg, params, runner = tiny
    S, chunk = 64, 16
    ids = jnp.asarray(np.random.default_rng(10).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    press = FinchPress(compression_ratio=0.5, window_size=8,
                       rerotate_keys=rerotate, chunk_length=chunk_length)

    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=chunk, dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        np.testing.assert_allclose(
            np.asarray(c_exact.keys[layer, ..., :n, :], np.float32),
            np.asarray(c_chunk.keys[layer, ..., :n, :], np.float32),
            atol=3e-5, err_msg=f"layer {layer}",
        )
        np.testing.assert_allclose(
            np.asarray(c_exact.values[layer, ..., :n, :], np.float32),
            np.asarray(c_chunk.values[layer, ..., :n, :], np.float32),
            atol=3e-5, err_msg=f"layer {layer}",
        )


def test_block_press_rejected_with_reason(tiny):
    """BlockPress's streaming top-k needs every position's hidden states —
    prefill_chunked rejects it with the documented, press-specific message
    (not a generic assert)."""
    from kvpress_tpu.presses import BlockPress

    cfg, params, runner = tiny
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 48)), jnp.int32)
    with pytest.raises(AssertionError, match="BlockPress cannot run"):
        runner.prefill_chunked(
            params, ids, press=BlockPress(press=KnormPress(0.5), block_size=16),
            chunk_size=16, dtype=jnp.float32,
        )


def test_dms_compact_matches_mask(tiny):
    """DMSPress(compact=True): the threshold mask physically compacts
    (cache.compact_masked) — answers equal the mask-only layout on both the
    one-shot and chunked paths, the cache buffer actually shrinks, and
    decoding=True+compact is rejected (the decode ring tracks slot
    indices)."""
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import DMSPress

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ids = jnp.asarray(np.random.default_rng(2).permutation(
        cfg.vocab_size)[:64][None], jnp.int32)
    thr = _knorm_threshold(runner, params, cfg, ids, pct=50)
    ctx = " ".join(f"w{i}" for i in range(60))

    mask_p = DMSPress(press=KnormPress(), threshold=thr,
                      sliding_window_size=16)
    comp_p = DMSPress(press=KnormPress(), threshold=thr,
                      sliding_window_size=16, compact=True)
    for kw in (dict(), dict(context_chunk=16)):
        a_mask = pipe(ctx, question="what ?", press=mask_p,
                      max_new_tokens=6, **kw)
        a_comp = pipe(ctx, question="what ?", press=comp_p,
                      max_new_tokens=6, **kw)
        assert a_mask["answer"] == a_comp["answer"], kw

    # the buffer really shrinks below the context length
    ctx_ids, _ = pipe.preprocess(ctx, [""])
    _, c_m, _ = runner.prefill(
        params, jnp.asarray(np.asarray(ctx_ids, np.int32))[None],
        press=mask_p, dtype=jnp.float32)
    from kvpress_tpu.cache import compact_masked

    c_c = compact_masked(c_m)
    assert int(jnp.max(c_c.length)) < len(ctx_ids)

    with pytest.raises(AssertionError, match="prefill-only"):
        DMSPress(press=KnormPress(), threshold=thr, decoding=True,
                 compact=True)


def test_chunkkv_short_context_delegates(tiny):
    """Regression (round-5 review): a context shorter than chunk_length must
    delegate to the wrapped scorer (one-shot n_complete==0 semantics) —
    token-level top-k, not keep-the-single-chunk-whole."""
    from kvpress_tpu.presses import ChunkKVPress

    cfg, params, runner = tiny
    S = 16
    ids = jnp.asarray(np.random.default_rng(12).permutation(
        cfg.vocab_size)[:S][None], jnp.int32)
    press = ChunkKVPress(press=KnormPress(0.5), chunk_length=20)

    _, c_exact, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    _, c_chunk, _ = runner.prefill_chunked(
        params, ids, press=press, chunk_size=8, dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(c_exact.length), np.asarray(c_chunk.length)
    )
    assert int(c_chunk.length[0]) == S // 2      # actually compressed
    for layer in range(cfg.num_layers):
        n = int(c_exact.length[layer])
        np.testing.assert_allclose(
            np.asarray(c_exact.keys[layer, ..., :n, :], np.float32),
            np.asarray(c_chunk.keys[layer, ..., :n, :], np.float32),
            atol=2e-5, err_msg=f"layer {layer}",
        )
