"""Chat-template separator-trick preprocessing (reference pipeline.py:139-156):
the question suffix (generation prompt) is recovered by splitting on a
sentinel, and question tokens get the suffix appended."""

import jax
import jax.numpy as jnp
import pytest

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline


def make_chat_tokenizer(vocab_size=1024):
    """Character-level HF fast tokenizer with a chat template."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    chars = [chr(c) for c in range(32, 127)]
    vocab = {"<unk>": 0, "</s>": 1}
    for ch in chars:
        vocab[ch] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", unk_token="<unk>"
    )
    t.chat_template = (
        "{% for message in messages %}<user> {{ message['content'] }}"
        "{% endfor %}{% if add_generation_prompt %} <assistant>{% endif %}"
    )
    return t


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_config(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return KVPressPipeline(Runner.create(cfg), params, make_chat_tokenizer())


def test_separator_split(pipe):
    context_ids, question_ids = pipe.preprocess("hello world", ["why?"])
    tok = pipe.tokenizer
    # char-level decode inserts spaces between symbols: compare squashed
    ctx_text = tok.decode(context_ids).replace(" ", "")
    q_text = tok.decode(question_ids[0]).replace(" ", "")
    # context carries the template prefix; the question carries the
    # generation-prompt suffix
    assert "helloworld" in ctx_text
    assert "<user>" in ctx_text
    assert "why?" in q_text
    assert "<assistant>" in q_text


def test_generation_with_chat_template(pipe):
    out = pipe("some things", question="what?",
               press=KnormPress(compression_ratio=0.3), max_new_tokens=4)
    assert isinstance(out["answer"], str)
