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
