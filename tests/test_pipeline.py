"""Pipeline behavior: compression logging semantics, multi-question cache
rollback, decode-vs-generate equivalence (reference tests/test_pipeline.py)."""

import logging

import jax
import jax.numpy as jnp
import pytest

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer

CONTEXT = " ".join(f"word{i}" for i in range(40))


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))


def test_pipeline_answers_and_logs(pipe, caplog):
    with caplog.at_level(logging.DEBUG, logger="kvpress_tpu.pipeline"):
        out = pipe(CONTEXT, question="what is word3 ?",
                   press=KnormPress(compression_ratio=0.5), max_new_tokens=5)
    assert isinstance(out["answer"], str)
    messages = [r.getMessage() for r in caplog.records]
    assert "Context Length: 40" in messages
    assert "Compressed Context Length: 20" in messages


def test_multi_question_rollback(pipe):
    """Each question must see the same compressed cache: asking [q1, q2] in one
    call equals asking q1 and q2 in separate calls (reference
    tests/test_pipeline.py:141-164 cache-restoration invariant)."""
    press = KnormPress(compression_ratio=0.4)
    joint = pipe(CONTEXT, questions=["what is word3 ?", "where is word7 ?"],
                 press=press, max_new_tokens=6)
    solo1 = pipe(CONTEXT, question="what is word3 ?", press=press, max_new_tokens=6)
    solo2 = pipe(CONTEXT, question="where is word7 ?", press=press, max_new_tokens=6)
    assert joint["answers"][0] == solo1["answer"]
    assert joint["answers"][1] == solo2["answer"]


def test_no_press_no_compression(pipe, caplog):
    with caplog.at_level(logging.DEBUG, logger="kvpress_tpu.pipeline"):
        pipe(CONTEXT, question="q ?", max_new_tokens=3)
    messages = [r.getMessage() for r in caplog.records]
    assert "Context Length: 40" in messages
    assert "Compressed Context Length: 40" in messages


def test_empty_question(pipe):
    out = pipe(CONTEXT, press=KnormPress(compression_ratio=0.25), max_new_tokens=4)
    assert isinstance(out["answer"], str)


def test_sampling_generation(pipe):
    """do_sample with temperature/top-p is reproducible per seed and differs
    across seeds (reference AIME eval protocol, kvzap/evaluate_aime.py)."""
    kwargs = dict(question="what ?", press=KnormPress(compression_ratio=0.25),
                  max_new_tokens=8, do_sample=True, temperature=1.2, top_p=0.9)
    a1 = pipe(CONTEXT, seed=0, **kwargs)["answer"]
    a2 = pipe(CONTEXT, seed=0, **kwargs)["answer"]
    a3 = pipe(CONTEXT, seed=123, **kwargs)["answer"]
    assert a1 == a2
    assert isinstance(a3, str)


def test_sliding_model_shrink_keeps_full_context():
    """Regression: the post-compression shrink bound must not cut below the
    FULL context on sliding-window models (local layers are never
    compressed) — a Knorm-compressed Gemma3-style pipeline answer must match
    the unshrunk manual path exactly, even with a tiny max_new_tokens."""
    import numpy as np

    import kvpress_tpu as kp
    from kvpress_tpu.cache import grow
    from kvpress_tpu.pipeline import KVPressPipeline, _prefill

    cfg = kp.tiny_config(num_layers=4, sliding_window=8,
                         layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    tok = ToyTokenizer(cfg.vocab_size)
    pipe2 = KVPressPipeline(runner, params, tok)
    ctx = " ".join(f"tok{i}" for i in range(32))
    press = KnormPress(compression_ratio=0.5)

    out = pipe2(ctx, question="what ?", press=press, max_new_tokens=3)

    cids, qids = pipe2.preprocess(ctx, ["what ?"])
    ids = jnp.asarray(np.asarray(cids, np.int32))[None]
    logits, cache, _ = _prefill(params, ids, None, runner=runner, press=press)
    cache = grow(cache, 64)
    q = jnp.asarray(np.asarray(qids[0], np.int32))[None]
    logits, cache, _ = runner.forward(params, q, cache, logits_last_only=True)
    toks = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(2):
        lg, cache, _ = runner.forward(
            params, jnp.asarray([[toks[-1]]], jnp.int32), cache,
            logits_last_only=True,
        )
        toks.append(int(jnp.argmax(lg[0, -1])))
    assert out["answer"] == tok.decode(toks, skip_special_tokens=True)


def test_pressless_pipeline_grows_for_generation(pipe):
    """Regression: with no press (kept == S) the re-bucket must GROW the
    prefill-sized buffer for question + generation appends; shrink-only
    sizing let the append clamp into the final slots and silently corrupt
    the answer."""
    import numpy as np

    from kvpress_tpu.cache import grow
    from kvpress_tpu.pipeline import _prefill

    out = pipe(CONTEXT, question="what ?", max_new_tokens=12)

    cids, qids = pipe.preprocess(CONTEXT, ["what ?"])
    ids = jnp.asarray(np.asarray(cids, np.int32))[None]
    logits, cache, _ = _prefill(pipe.params, ids, None, runner=pipe.runner,
                                press=None)
    cache = grow(cache, 64)
    q = jnp.asarray(np.asarray(qids[0], np.int32))[None]
    logits, cache, _ = pipe.runner.forward(pipe.params, q, cache,
                                           logits_last_only=True)
    toks = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(11):
        lg, cache, _ = pipe.runner.forward(
            pipe.params, jnp.asarray([[toks[-1]]], jnp.int32), cache,
            logits_last_only=True,
        )
        toks.append(int(jnp.argmax(lg[0, -1])))
    assert out["answer"] == pipe.tokenizer.decode(toks, skip_special_tokens=True)
