"""Continuous-batching serving engine: per-request outputs must equal the
single-request greedy path (prefill + question + decode via Runner.forward),
including under compression, quantized slots, eos trimming and slot reuse.

The reference has no serving layer (kvpress/pipeline.py is batch-1); the
per-request contract these tests pin down is the pipeline's."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.cache import grow
from kvpress_tpu.pipeline import _prefill
from kvpress_tpu.serving import Request, ServingEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, Runner.create(cfg)


def ref_generate(runner, params, press, ctx, q_ids, n_new, capacity,
                 quantized=False, kv_bits=8, eos_ids=()):
    """The serving contract, one request at a time, straight on Runner."""
    ids = jnp.asarray(np.asarray(ctx, np.int32))[None]
    logits, cache, _ = _prefill(
        params, ids, None, runner=runner, press=press,
        quantized=quantized, kv_bits=kv_bits,
    )
    if q_ids:
        need = int(jnp.max(cache.length)) + len(q_ids)
        if cache.max_size < need:
            cache = grow(cache, need - cache.max_size)
        qarr = jnp.asarray(np.asarray(q_ids, np.int32))[None]
        logits, cache, _ = runner.forward(
            params, qarr, cache, logits_last_only=True,
            valid_len=jnp.asarray(len(q_ids), jnp.int32),
        )
    if cache.max_size < int(jnp.max(cache.length)) + n_new + 1:
        cache = grow(cache, int(jnp.max(cache.length)) + n_new + 1 - cache.max_size)
    tok = int(jnp.argmax(logits[0, -1]))
    out = [tok]
    for _ in range(n_new - 1):
        if out[-1] in eos_ids:
            break
        lg, cache, _ = runner.forward(
            params, jnp.asarray([[out[-1]]], jnp.int32), cache,
            logits_last_only=True,
        )
        out.append(int(jnp.argmax(lg[0, -1])))
    if eos_ids and any(t in eos_ids for t in out):
        out = out[: next(i for i, t in enumerate(out) if t in eos_ids) + 1]
    return out


def assert_generation_matches_ref(runner, params, press, req, got,
                                  quantized=False, kv_bits=8, tie_eps=2e-3):
    """TEACHER-FORCED check of a served generation against the B=1 path:
    replay ``got`` through Runner and require, at every step, the engine's
    token to be the reference argmax OR within ``tie_eps`` of it in the
    reference logits (float-reassociation ties only — the engine and the
    B=1 path compile different HLOs). Teacher forcing checks every step
    independently so one tie flip can't cascade, and a real semantic bug
    (wrong positions, masks, cache contents) shows up as a large gap.
    Historical note: this check caught a live-mask buffer-aliasing race in
    the engine (serving.py run()) that corrupted final tokens by ~0.05 —
    keep it teacher-forced and tight."""
    ids = jnp.asarray(np.asarray(req.context_ids, np.int32))[None]
    logits, cache, _ = _prefill(
        params, ids, None, runner=runner, press=press,
        quantized=quantized, kv_bits=kv_bits,
    )
    q_ids = req.question_ids
    if q_ids:
        need = int(jnp.max(cache.length)) + len(q_ids)
        if cache.max_size < need:
            cache = grow(cache, need - cache.max_size)
        qarr = jnp.asarray(np.asarray(q_ids, np.int32))[None]
        logits, cache, _ = runner.forward(
            params, qarr, cache, logits_last_only=True,
            valid_len=jnp.asarray(len(q_ids), jnp.int32),
        )
    if cache.max_size < int(jnp.max(cache.length)) + len(got) + 1:
        cache = grow(cache,
                     int(jnp.max(cache.length)) + len(got) + 1 - cache.max_size)
    mismatches = 0
    for i, tok in enumerate(got):
        row = np.asarray(logits[0, -1])
        ref_tok = int(row.argmax())
        if tok != ref_tok:
            mismatches += 1
            gap = float(row[ref_tok] - row[tok])
            assert gap < tie_eps, (
                f"step {i}: engine token {tok} lags reference argmax "
                f"{ref_tok} by {gap} (> {tie_eps}) — semantic divergence. "
                f"got={got}"
            )
        logits, cache, _ = runner.forward(
            params, jnp.asarray([[tok]], jnp.int32), cache,
            logits_last_only=True,
        )
    # a near-tie flip is rare; many flips in one short answer = a bug
    assert mismatches <= max(1, len(got) // 3), (mismatches, got)


def _mk_requests(cfg, lengths, n_new=6):
    rng = np.random.default_rng(0)
    reqs = []
    for i, (cl, ql) in enumerate(lengths):
        ctx = rng.permutation(cfg.vocab_size)[:cl].tolist()
        q = rng.permutation(cfg.vocab_size)[:ql].tolist()
        reqs.append(Request(ctx, q, max_new_tokens=n_new))
    return reqs


def test_serving_matches_single_request(tiny):
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (48, 8), (24, 4), (40, 4), (32, 8)])
    eng = ServingEngine(
        runner, params, n_slots=2, capacity=64, press=press,
        question_bucket=4, fetch_lag=2,
    )
    answers = eng.run(reqs)
    for req, got in zip(reqs, answers):
        assert len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, press, req, got)


def test_serving_more_requests_than_slots_reuses(tiny):
    """8 requests through 2 slots — retirement + re-admission."""
    cfg, params, runner = tiny
    reqs = _mk_requests(cfg, [(16 + 4 * i, 4) for i in range(8)], n_new=4)
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, fetch_lag=3)
    answers = eng.run(reqs)
    assert all(a is not None and len(a) == 4 for a in answers)
    for req, got in zip(reqs, answers):
        assert_generation_matches_ref(runner, params, None, req, got)


def test_serving_staggered_admission_heterogeneous_budgets(tiny):
    """Regression: decode steps issued while an admission is in flight must
    not clobber the staged first token. With heterogeneous max_new_tokens,
    slots retire out of lockstep, so a re-admission's _issue_admission →
    _complete_admission window overlaps live decode steps; the dead lane's
    argmax used to overwrite tokens[slot] (= the request's first token),
    dropping that token's KV commit (advisor round 2, serving.py)."""
    cfg, params, runner = tiny
    rng = np.random.default_rng(3)
    budgets = [4, 9, 5, 8, 3, 7]
    reqs = []
    for i, b in enumerate(budgets):
        ctx = rng.permutation(cfg.vocab_size)[: 24 + 4 * i].tolist()
        reqs.append(Request(ctx, [], max_new_tokens=b))
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, fetch_lag=3)
    answers = eng.run(reqs)
    for req, got in zip(reqs, answers):
        assert got is not None and len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, None, req, got)


def test_serving_eos_trims_speculative(tiny):
    cfg, params, runner = tiny
    req = _mk_requests(cfg, [(32, 4)], n_new=12)[0]
    free = ref_generate(runner, params, None, req.context_ids,
                        req.question_ids, 12, 64)
    eos = free[3]  # force an eos mid-stream
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, fetch_lag=4, eos_ids=(eos,))
    got = eng.run([req])[0]
    want = free[: free.index(eos) + 1]
    assert got == want
    assert len(got) < 12  # speculative tail trimmed


def test_serving_quantized_slots(tiny):
    cfg, params, runner = tiny
    reqs = _mk_requests(cfg, [(32, 4), (24, 4)], n_new=5)
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        quantized=True, kv_bits=8, question_bucket=4)
    answers = eng.run(reqs)
    for req, got in zip(reqs, answers):
        assert_generation_matches_ref(runner, params, None, req, got,
                                      quantized=True)


def test_serving_decoding_press_noop_exact(tiny):
    """A never-binding DecodingPress target must leave served answers
    bit-identical to the pressless engine (compression cond never fires,
    buffers untouched) — bf16 and quantized slots."""
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner = tiny
    reqs = _mk_requests(cfg, [(32, 4), (24, 4), (40, 4)], n_new=6)
    noop = DecodingPress(
        base_press=KnormPress(), compression_interval=3, target_size=4096,
        hidden_states_buffer_size=4,
    )
    for quant in (False, True):
        plain = ServingEngine(runner, params, n_slots=2, capacity=64,
                              question_bucket=4, quantized=quant).run(reqs)
        pressed = ServingEngine(runner, params, n_slots=2, capacity=64,
                                question_bucket=4, quantized=quant,
                                press=noop).run(reqs)
        assert plain == pressed, quant


def test_serving_decoding_press_compresses_slots(tiny):
    """DecodingPress in the serving loop: every slot's per-layer length lands
    in [target, target+interval+fetch_lag] after generation, slots desync
    (staggered admission) and answers stay close to the single-request
    DecodingPress path."""
    from kvpress_tpu.presses import DecodingPress, PrefillDecodingPress

    cfg, params, runner = tiny
    reqs = _mk_requests(cfg, [(40, 4), (32, 4), (48, 4)], n_new=10)
    press = PrefillDecodingPress(
        prefilling_press=KnormPress(compression_ratio=0.25),
        decoding_press=DecodingPress(
            base_press=KnormPress(), compression_interval=4, target_size=24,
            hidden_states_buffer_size=4,
        ),
    )
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, fetch_lag=2, press=press)
    answers = eng.run(reqs)
    assert all(a is not None and len(a) == 10 for a in answers)
    # the last-served slots' lengths are bounded by target + interval slack
    lengths = np.asarray(eng.sc.lengths)
    assert (lengths <= 24 + 4 + 2).all(), lengths
    # sanity: finite, in-vocab tokens
    for got in answers:
        assert all(0 <= t < cfg.vocab_size for t in got)


def test_serving_decoding_press_quantized(tiny):
    """DecodingPress over int8 serving slots: per-slot payload gather (dense
    built only inside the interval cond)."""
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner = tiny
    reqs = _mk_requests(cfg, [(40, 4), (32, 4)], n_new=8)
    press = DecodingPress(
        base_press=KnormPress(), compression_interval=3, target_size=32,
        hidden_states_buffer_size=4,
    )
    eng = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, quantized=True, press=press)
    answers = eng.run(reqs)
    assert all(a is not None and len(a) == 8 for a in answers)
    lengths = np.asarray(eng.sc.lengths)
    assert (lengths <= 32 + 3 + 2).all(), lengths


def test_serving_kvzip_multi_pass(tiny):
    """KVzip (multi-pass) requests through the engine: admission runs the
    pipeline's chunked reconstruction scoring, generation proceeds from the
    masked cache — teacher-force-checked against the same admission math on
    the B=1 path."""
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import KVzipPress
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    tok = ToyTokenizer(cfg.vocab_size)
    press = KVzipPress(compression_ratio=0.5, chunk_size=16)
    reqs = _mk_requests(cfg, [(32, 4), (24, 4)], n_new=6)
    eng = ServingEngine(runner, params, n_slots=2, capacity=96,
                        question_bucket=4, press=press, tokenizer=tok)
    answers = eng.run(reqs)
    assert all(a is not None and len(a) == 6 for a in answers)
    # some heads must actually be masked by the reconstruction scoring
    assert not bool(np.asarray(eng.sc.mask).all())

    pipe = KVPressPipeline(runner, params, tok)
    for req, got in zip(reqs, answers):
        ids = jnp.asarray(np.asarray(req.context_ids, np.int32))[None]
        logits, cache, _ = _prefill(params, ids, None, runner=runner,
                                    press=press)
        cache = pipe._run_kvzip(cache, list(req.context_ids), press,
                                req.max_new_tokens)
        need = int(jnp.max(cache.length)) + len(req.question_ids) + len(got) + 1
        if cache.max_size < need:
            cache = grow(cache, need - cache.max_size)
        qarr = jnp.asarray(np.asarray(req.question_ids, np.int32))[None]
        logits, cache, _ = runner.forward(
            params, qarr, cache, logits_last_only=True,
            valid_len=jnp.asarray(len(req.question_ids), jnp.int32),
        )
        mismatches = 0
        for i, tok_id in enumerate(got):
            row = np.asarray(logits[0, -1])
            ref_tok = int(row.argmax())
            if tok_id != ref_tok:
                mismatches += 1
                gap = float(row[ref_tok] - row[tok_id])
                assert gap < 2e-3, (i, tok_id, ref_tok, gap, got)
            logits, cache, _ = runner.forward(
                params, jnp.asarray([[tok_id]], jnp.int32), cache,
                logits_last_only=True,
            )
        assert mismatches <= 2, (mismatches, got)


def test_serving_sliding_window_model():
    """Gemma3-style interleaved sliding/global layers through the engine:
    slot-index window + dual RoPE bases; press skips sliding layers at
    admission. Teacher-forced against the B=1 path."""
    cfg = tiny_config(num_layers=4, sliding_window=8, rope_local_base_freq=500.0,
                      layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (24, 4), (40, 4)], n_new=6)
    eng = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                        question_bucket=4, fetch_lag=2)
    answers = eng.run(reqs)
    for req, got in zip(reqs, answers):
        assert len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, press, req, got)


def test_serving_rejects_cam(tiny):
    from kvpress_tpu.presses import CAMPress

    cfg, params, runner = tiny
    cam = CAMPress(base_press=KnormPress(), compression_interval=4,
                   target_size=24, hidden_states_buffer_size=4)
    with pytest.raises(AssertionError, match="CAM-style"):
        ServingEngine(runner, params, n_slots=2, capacity=64, press=cam)


def test_serving_capacity_rejected_before_any_work(tiny):
    """Over-budget requests are rejected at run() entry via the static bound
    (press.max_kept) — the old completion-time assert fired after the
    over-budget cache was already in the slot pool, leaving the engine
    unusable (advisor r2). The engine must stay usable afterwards."""
    cfg, params, runner = tiny
    req = _mk_requests(cfg, [(60, 4)], n_new=32)[0]
    eng = ServingEngine(runner, params, n_slots=1, capacity=64,
                        question_bucket=4)
    with pytest.raises(ValueError, match="capacity"):
        eng.run([req])
    ok = _mk_requests(cfg, [(32, 4)], n_new=4)[0]
    got = eng.run([ok])[0]          # engine unpolluted: serves normally
    assert len(got) == 4
    assert_generation_matches_ref(runner, params, None, ok, got)


def test_serving_sjf_schedule(tiny):
    """schedule='sjf' admits shortest-budget requests first; the per-request
    answers still match FIFO exactly (scheduling must not change content)."""
    cfg, params, runner = tiny
    rng = np.random.default_rng(5)
    budgets = [9, 3, 7, 4, 8, 5]
    reqs = [
        Request(rng.permutation(cfg.vocab_size)[: 24 + 4 * i].tolist(), [], b)
        for i, b in enumerate(budgets)
    ]
    fifo = ServingEngine(runner, params, n_slots=2, capacity=64,
                         question_bucket=4, fetch_lag=2)
    sjf = ServingEngine(runner, params, n_slots=2, capacity=64,
                        question_bucket=4, fetch_lag=2, schedule="sjf")
    a_fifo = fifo.run(reqs)
    a_sjf = sjf.run(reqs)
    assert a_fifo == a_sjf
    for req, got in zip(reqs, a_sjf):
        assert len(got) == req.max_new_tokens


def test_pipeline_batch_matches_call():
    """KVPressPipeline.batch == per-request __call__ (greedy), including
    mixed context lengths and slot contention."""
    from kvpress_tpu import init_params, tiny_config
    from kvpress_tpu.pipeline import KVPressPipeline
    from toy_tokenizer import ToyTokenizer

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))
    press = KnormPress(compression_ratio=0.5)

    contexts = [" ".join(f"w{i}x{j}" for i in range(24 + 8 * j)) for j in range(4)]
    questions = [f"what is w3x{j} ?" for j in range(4)]
    got = pipe.batch(contexts, questions, press=press, max_new_tokens=6,
                     n_slots=2, question_bucket=4)
    for ctx, q, g in zip(contexts, questions, got):
        # teacher-forced near-tie-tolerant comparison (see
        # assert_generation_matches_ref): answer tokens are unknown ids that
        # ToyTokenizer decodes as "<id>" — recover them
        toks = [
            int(t[1:-1]) if t.startswith("<") else pipe.tokenizer._tok2id(t)
            for t in g.split()
        ]
        assert len(toks) == 6, g
        ctx_ids, q_ids = pipe.preprocess(ctx, [q])
        req = Request(ctx_ids, q_ids[0], 6)
        assert_generation_matches_ref(pipe.runner, params, press, req, toks)


def test_serving_int8_weights(tiny):
    """Int8 weights (quantize_params_int8) through the serving loop equal the
    single-request path with the SAME int8 params — the engine's dense
    matmuls must read the per-channel scales (models.llama._lin)."""
    from kvpress_tpu.models.llama import quantize_params_int8

    cfg, params, runner = tiny
    qparams = quantize_params_int8(params)
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (40, 8)], n_new=5)
    eng = ServingEngine(runner, qparams, n_slots=2, capacity=64, press=press,
                        question_bucket=4, fetch_lag=2)
    answers = eng.run(reqs)
    for req, got in zip(reqs, answers):
        assert_generation_matches_ref(runner, qparams, press, req, got)


def test_serving_tensor_parallel(tiny):
    """ServingEngine over a ("data","model") mesh: weights and the slot
    pool's kv-head axis shard on "model", the slot axis on "data" (GSPMD
    inserts the per-layer psums); answers equal the B=1 reference."""
    from kvpress_tpu.parallel.mesh import make_mesh, validate_tp

    cfg, params, runner = tiny
    validate_tp(cfg, 2)
    mesh = make_mesh(data=2, model=2)
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (40, 8), (24, 4)], n_new=5)

    tp = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                       question_bucket=4, fetch_lag=2, mesh=mesh)
    assert tp.sc.keys.sharding.spec[1] == "data"
    assert tp.sc.keys.sharding.spec[2] == "model"
    answers = tp.run(reqs)
    for req, got in zip(reqs, answers):
        assert_generation_matches_ref(runner, params, press, req, got)


def test_pipeline_batch_kvzip_and_decode_press(tiny):
    """pipeline.batch forwards the tokenizer so KVzip multi-pass admission
    works, and DecodingPress requests serve through the engine."""
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import DecodingPress, KVzipPress
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctxs = [" ".join(f"tok{i}" for i in range(n)) for n in (30, 24)]

    ans = pipe.batch(ctxs, questions=["what ?"] * 2,
                     press=KVzipPress(compression_ratio=0.5, chunk_size=16),
                     max_new_tokens=4, capacity=96, n_slots=2)
    assert all(isinstance(a, str) and a for a in ans)

    # KVzip through CHUNKED admission (uncompressed chunk prefill + repeat
    # passes after — VERDICT r3 item 2 at the serving layer): same answers.
    ans_chunked = pipe.batch(
        ctxs, questions=["what ?"] * 2,
        press=KVzipPress(compression_ratio=0.5, chunk_size=16),
        max_new_tokens=4, capacity=96, n_slots=2, context_chunk=16,
    )
    assert ans_chunked == ans

    press = DecodingPress(base_press=KnormPress(), compression_interval=4,
                          target_size=24, hidden_states_buffer_size=4)
    ans2 = pipe.batch(ctxs, questions=["what ?"] * 2, press=press,
                      max_new_tokens=6, n_slots=2)
    assert all(isinstance(a, str) and a for a in ans2)


def test_serving_context_chunk_admission(tiny):
    """context_chunk= admission (bounded-activation chunked prefill) serves
    the same answers as exact-prefill admission, including ragged context
    lengths and slot reuse."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(50, 4), (64, 8), (33, 4), (48, 4)])
    base = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                         question_bucket=4, fetch_lag=2)
    chunked = ServingEngine(runner, params, n_slots=2, capacity=64,
                            press=press, question_bucket=4, fetch_lag=2,
                            context_chunk=16)
    assert base.run(reqs) == chunked.run(reqs)

    import pytest as _pytest
    from kvpress_tpu.presses import BlockPress

    with _pytest.raises(AssertionError, match="ScorerPress"):
        ServingEngine(runner, params, n_slots=2, capacity=64,
                      press=BlockPress(press=press), context_chunk=16)


def test_serving_interleaved_admission(tiny):
    """interleave=True (chunk-interleaved, Sarathi-style admission — decode
    steps dispatched between prefill chunk programs) is a pure scheduling
    change: answers match non-interleaved chunked admission exactly on a
    staggered workload (heterogeneous budgets + contexts force admissions
    while other slots are mid-decode), and the gap stats land in last_stats.
    interleave without context_chunk is rejected (nothing to interleave)."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(50, 9), (64, 3), (33, 7), (48, 4), (61, 5)])
    for i, r in enumerate(reqs):     # ragged budgets -> staggered retirement
        r.max_new_tokens = 3 + 2 * i
    base = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                         question_bucket=4, fetch_lag=2, context_chunk=16)
    inter = ServingEngine(runner, params, n_slots=2, capacity=64,
                          press=press, question_bucket=4, fetch_lag=2,
                          context_chunk=16, interleave=True)
    assert base.run(reqs) == inter.run(reqs)
    assert inter.last_stats["max_intertoken_gap_s"] >= \
        inter.last_stats["p50_intertoken_gap_s"] > 0

    import pytest as _pytest

    with _pytest.raises(AssertionError, match="context_chunk"):
        ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                      interleave=True)


@pytest.mark.parametrize("quantized", [False, True])
def test_serving_context_cache_reuse(tiny, quantized):
    """context_cache= admissions sharing a context skip prefill+compression
    via the LRU (the reference pipeline's one-cache-many-questions UX,
    pipeline.py:236-249, lifted to the engine) and still match the
    single-request path; a distinct context misses and evicts."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    rng = np.random.default_rng(3)
    ctx = rng.permutation(cfg.vocab_size)[:40].tolist()
    qs = [rng.permutation(cfg.vocab_size)[:4].tolist() for _ in range(3)]
    reqs = [Request(ctx, q, max_new_tokens=5) for q in qs]
    reqs.append(Request(rng.permutation(cfg.vocab_size)[:24].tolist(),
                        rng.permutation(cfg.vocab_size)[:4].tolist(),
                        max_new_tokens=5))
    eng = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                        question_bucket=4, fetch_lag=2, context_cache=1,
                        quantized=quantized)
    answers = eng.run(reqs)
    # shared-context request 0 misses (stored at issue time); 1 and 2 hit
    assert eng.ctx_hits == 2
    assert len(eng._ctx_lru) == 1   # the distinct 4th context evicted ctx
    (stored_key,) = eng._ctx_lru
    assert stored_key == (tuple(reqs[3].context_ids), None)
    for req, got in zip(reqs, answers):
        assert len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, press, req, got,
                                      quantized=quantized)


def test_serving_context_cache_inflight_dedup(tiny):
    """Two same-context requests admitted CONCURRENTLY in interleave mode:
    the second waits on the first admission's in-flight prefill instead of
    running a duplicate chunked prefill (advisor r3), then hits the LRU.
    last_stats reports the skipped context tokens and processed_tokens
    reflects tokens actually forwarded."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    rng = np.random.default_rng(11)
    ctx = rng.permutation(cfg.vocab_size)[:48].tolist()
    qs = [rng.permutation(cfg.vocab_size)[:4].tolist() for _ in range(2)]
    reqs = [Request(ctx, q, max_new_tokens=5) for q in qs]

    eng = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                        question_bucket=4, fetch_lag=2, context_chunk=16,
                        interleave=True, context_cache=1)
    answers = eng.run(reqs)
    # Both slots free -> both admissions issued in the same loop iteration;
    # the dedup path makes the second a hit instead of a duplicate prefill.
    assert eng.ctx_hits == 1
    assert eng.last_stats["skipped_context_tokens"] == len(ctx)
    assert eng.last_stats["processed_tokens"] == (
        sum(len(a) for a in answers)
        + sum(len(r.context_ids) + len(r.question_ids) for r in reqs)
        - len(ctx)
    )
    for req, got in zip(reqs, answers):
        assert len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, press, req, got)


def test_serving_sampling(tiny):
    """Nucleus sampling in the engine (reference: kvzap/evaluate_aime.py
    samples with temperature/top-p): near-zero temperature reproduces the
    greedy path exactly; a fixed seed is reproducible; different seeds
    draw different answers."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (40, 4), (24, 0)], n_new=6)

    greedy = ServingEngine(runner, params, n_slots=2, capacity=64,
                           press=press, question_bucket=4, fetch_lag=2)
    cold = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                         question_bucket=4, fetch_lag=2, do_sample=True,
                         temperature=1e-4, seed=7)
    assert greedy.run(reqs) == cold.run(reqs)

    hot = lambda seed: ServingEngine(
        runner, params, n_slots=2, capacity=64, press=press,
        question_bucket=4, fetch_lag=2, do_sample=True, temperature=2.0,
        top_p=0.95, seed=seed,
    ).run(reqs)
    a, b, c = hot(1), hot(1), hot(2)
    assert a == b                       # same seed reproduces
    assert a != c                       # 18 draws at T=2: collision ~ 0
    for got, req in zip(a, reqs):
        assert len(got) == req.max_new_tokens


def test_serving_context_cache_with_bucketing(tiny):
    """context_cache composes with context_bucket admission: hits reuse the
    stored cache (shrunk to the UNPADDED kept bound) and answers equal the
    unbucketed engine's."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    rng = np.random.default_rng(5)
    ctx = rng.permutation(cfg.vocab_size)[:40].tolist()   # pads 40 -> 48
    qs = [rng.permutation(cfg.vocab_size)[:4].tolist() for _ in range(3)]
    reqs = [Request(ctx, q, max_new_tokens=5) for q in qs]
    plain = ServingEngine(runner, params, n_slots=2, capacity=64,
                          press=press, question_bucket=4, fetch_lag=2)
    bucketed = ServingEngine(runner, params, n_slots=2, capacity=64,
                             press=press, question_bucket=4, fetch_lag=2,
                             context_bucket=16, context_cache=1)
    a, b = plain.run(reqs), bucketed.run(reqs)
    assert bucketed.ctx_hits == 2
    assert a == b


def test_serving_compact_press_lru_measured_shrink(tiny):
    """Compacting presses store LRU entries at the static kept bound (the
    full context for KVzip — no sound static bound exists below it), then
    shrink them to the MEASURED kept length at admission completion: the
    entry's buffer drops ~(1-ratio)x while hits still answer identically
    (front-compacted entries make the slice lossless)."""
    from kvpress_tpu.presses import KVzipPress

    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    tok = ToyTokenizer(cfg.vocab_size)
    rng = np.random.default_rng(13)
    ctx = rng.permutation(cfg.vocab_size)[:64].tolist()
    qs = [rng.permutation(cfg.vocab_size)[:4].tolist() for _ in range(3)]
    press = KVzipPress(compression_ratio=0.6, compact=True, chunk_size=24)
    reqs = [Request(ctx, q, max_new_tokens=4) for q in qs]

    plain = ServingEngine(runner, params, n_slots=1, capacity=96,
                          press=press, tokenizer=tok, fetch_lag=2)
    ref = plain.run(reqs)

    eng = ServingEngine(runner, params, n_slots=1, capacity=96, press=press,
                        tokenizer=tok, fetch_lag=2, context_cache=1,
                        question_bucket=16)
    got = eng.run(reqs)
    assert got == ref
    assert eng.ctx_hits == 2
    (entry, _), = eng._ctx_lru.values()
    # Static bound would store all 64 context slots; the measured shrink
    # buckets max-per-head kept (~0.4*64 + spread) to question_bucket=16.
    assert entry.max_size < 64
    assert entry.max_size % 16 == 0
    assert entry.max_size >= int(jnp.max(entry.length))


def test_serving_compact_press_small_capacity(tiny):
    """Compacting presses (KVzip compact=True) admit OPTIMISTICALLY: a slot
    capacity well below ctx+question+gen works when the measured compacted
    size fits (the capacity win compaction exists for), answers matching a
    generously-sized engine; a request whose compacted cache exceeds the
    slot is RETRIED once at a capacity-clamped compression ratio (it still
    answers, just more compressed); only a failed retry drops it — with the
    index reported in last_stats['dropped'] — without breaking the engine
    or the other requests."""
    from kvpress_tpu.presses import KVzipPress

    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    tok = ToyTokenizer(cfg.vocab_size)
    rng = np.random.default_rng(11)
    ctx = rng.permutation(cfg.vocab_size)[:64].tolist()
    q = rng.permutation(cfg.vocab_size)[:4].tolist()
    press = KVzipPress(compression_ratio=0.6, compact=True, chunk_size=24)
    reqs = [Request(ctx, q, max_new_tokens=4)]

    big = ServingEngine(runner, params, n_slots=1, capacity=96, press=press,
                        tokenizer=tok, fetch_lag=2)
    ref = big.run(reqs)

    # 0.6 of 64 evicted globally -> per-head kept ~26±spread; 48 slots is
    # far below the static bound (64+4+4+1) yet fits the compacted cache.
    small = ServingEngine(runner, params, n_slots=1, capacity=48,
                          press=press, tokenizer=tok, fetch_lag=2)
    assert small.run(reqs) == ref
    assert small.last_stats["retried_admissions"] == 0

    # Barely-compressing press + tiny slot: the first admission's compacted
    # cache cannot fit -> the engine retries once with the ratio clamped to
    # the slot budget and the request STILL ANSWERS (just more compressed);
    # a second, shorter request serves normally alongside.
    loose = KVzipPress(compression_ratio=0.05, compact=True, chunk_size=24)
    short_ctx = rng.permutation(cfg.vocab_size)[:20].tolist()
    eng = ServingEngine(runner, params, n_slots=1, capacity=40, press=loose,
                        tokenizer=tok, fetch_lag=2)
    outs = eng.run([Request(ctx, q, max_new_tokens=4),
                    Request(short_ctx, q, max_new_tokens=4)])
    assert len(outs[0]) == 4                   # retried, answered
    assert len(outs[1]) == 4
    assert eng.last_stats["retried_admissions"] == 1
    assert eng.last_stats["dropped"] == []

    # Impossible request: the slot budget (capacity - question - gen - 1)
    # is below the sink+question floor no ratio can compress away -> the
    # clamped retry also fails and the request is dropped with its index
    # reported; the other request still serves.
    tight = ServingEngine(runner, params, n_slots=1, capacity=16,
                          press=loose, tokenizer=tok, fetch_lag=2)
    outs = tight.run([Request(ctx, q, max_new_tokens=4),
                      Request(short_ctx[:6], q, max_new_tokens=4)])
    assert outs[0] == []                       # dropped after failed retry
    assert len(outs[1]) == 4
    assert tight.last_stats["retried_admissions"] == 1
    assert tight.last_stats["dropped"] == [0]
    assert tight.last_stats["dropped_requests"] == 1


def test_serving_dms_compact_small_capacity(tiny):
    """DMSPress(compact=True) admits optimistically like KVzip-compact: a
    slot capacity below the context works when the compacted threshold mask
    fits, answers matching a generous engine; an overflow drops directly
    (threshold presses have no ratio to clamp for a retry) with the index
    reported."""
    from kvpress_tpu.presses import DMSPress

    cfg, params, runner = tiny
    rng = np.random.default_rng(23)
    ctx = rng.permutation(cfg.vocab_size)[:64].tolist()
    q = rng.permutation(cfg.vocab_size)[:4].tolist()
    ids = jnp.asarray(np.asarray(ctx, np.int32))[None]
    _, c0, _ = _prefill(params, ids, None, runner=runner, press=None)
    thr = float(np.percentile(-np.linalg.norm(
        np.asarray(c0.keys[..., :64, :], np.float32), axis=-1), 55))
    press = DMSPress(press=KnormPress(), threshold=thr,
                     sliding_window_size=16, compact=True)
    reqs = [Request(ctx, q, max_new_tokens=4)]

    big = ServingEngine(runner, params, n_slots=1, capacity=96, press=press,
                        fetch_lag=2)
    ref = big.run(reqs)
    # ~55% of evictable tokens below threshold + 16 protected -> compacted
    # cache fits well under the 64-token context
    small = ServingEngine(runner, params, n_slots=1, capacity=56,
                          press=press, fetch_lag=2)
    assert small.run(reqs) == ref
    assert small.last_stats["retried_admissions"] == 0

    # an impossible slot: drops on FIRST failure (no ratio to clamp)
    tight = ServingEngine(runner, params, n_slots=1, capacity=12,
                          press=press, fetch_lag=2)
    outs = tight.run([Request(ctx, q, max_new_tokens=4)])
    assert outs[0] == []
    assert tight.last_stats["dropped"] == [0]
    assert tight.last_stats["retried_admissions"] == 0


def test_serving_streaming_callback(tiny):
    """on_token= streams (req_idx, token, n) as tokens drain: the streamed
    sequence per request equals the returned answer exactly — first token at
    admission, eos delivered, post-eos speculative tokens never delivered."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (40, 8), (24, 4)], n_new=8)

    # force an eos mid-stream for request 0 (speculative-trim coverage)
    free = ref_generate(runner, params, press, reqs[0].context_ids,
                        reqs[0].question_ids, 8, 64)
    eos = free[3]
    streamed: dict = {}

    def on_token(idx, tok, n):
        streamed.setdefault(idx, []).append(tok)
        assert n == len(streamed[idx])

    eng = ServingEngine(runner, params, n_slots=2, capacity=64, press=press,
                        question_bucket=4, fetch_lag=3, eos_ids=(eos,))
    answers = eng.run(reqs, on_token=on_token)
    assert streamed == {i: a for i, a in enumerate(answers)}
    assert any(eos in a for a in answers)       # the trim case was hit


def test_serving_priority_schedule(tiny):
    """schedule='priority': the highest-priority queued request admits
    first (observable via the streaming callback's first event), answers
    still equal the single-request path, ties fall back to fifo."""
    cfg, params, runner = tiny
    press = KnormPress(compression_ratio=0.5)
    reqs = _mk_requests(cfg, [(32, 4), (40, 4), (24, 4)], n_new=5)
    reqs[2].priority = 5                       # last submitted, highest prio

    first_admitted = []

    def on_token(idx, tok, n):
        if n == 1:
            first_admitted.append(idx)

    eng = ServingEngine(runner, params, n_slots=1, capacity=64, press=press,
                        question_bucket=4, fetch_lag=2, schedule="priority")
    answers = eng.run(reqs, on_token=on_token)
    assert first_admitted[0] == 2              # priority 5 went first
    assert first_admitted[1:] == [0, 1]        # then fifo among ties
    for req, got in zip(reqs, answers):
        assert len(got) == req.max_new_tokens
        assert_generation_matches_ref(runner, params, press, req, got)
