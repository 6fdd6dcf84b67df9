"""Per-head compaction (AdaKV compact=True): attention semantics identical to
the mask-only layout, but the buffer shrinks below the context length — the
memory saving the reference's fake eviction explicitly cannot deliver
(attention_patch.py:47)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.cache import shrink
from kvpress_tpu.presses import AdaKVPress, CriticalAdaKVPress, KnormPress


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, kp.Runner.create(cfg)


@pytest.mark.parametrize("wrapper", [AdaKVPress, CriticalAdaKVPress])
def test_compacted_matches_masked_decode(tiny, wrapper):
    cfg, params, runner = tiny
    S = 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)

    masked = wrapper(press=KnormPress(0.5), compact=False)
    compacted = wrapper(press=KnormPress(0.5), compact=True)

    _, c_mask, _ = runner.prefill(
        params, ids, press=masked, max_size=S + 8, dtype=jnp.float32
    )
    _, c_comp, _ = runner.prefill(
        params, ids, press=compacted, max_size=S + 8, dtype=jnp.float32
    )

    # compacted length strictly below the context length; mask-only keeps S
    assert all(int(l) == S for l in c_mask.length)
    assert all(int(l) < S for l in c_comp.length)

    # per-head kept counts identical
    for layer in range(cfg.num_layers):
        counts_mask = np.asarray(c_mask.mask[layer, :, :, :S].sum(-1))
        counts_comp = np.asarray(c_comp.mask[layer, :, :, :S].sum(-1))
        np.testing.assert_array_equal(counts_mask, counts_comp)

    # the compacted cache shrinks to its actual max head budget and decodes
    # to the same logits as the mask-only layout
    kept = int(jnp.max(c_comp.length))
    c_small = shrink(c_comp, kept + 8)
    tok = ids[:, -1:]
    lg_mask, _, _ = runner.forward(params, tok, c_mask, logits_last_only=True)
    lg_comp, _, _ = runner.forward(params, tok, c_small, logits_last_only=True)
    np.testing.assert_allclose(
        np.asarray(lg_comp), np.asarray(lg_mask), atol=1e-4, rtol=1e-4
    )
    assert c_small.keys.shape[3] < c_mask.keys.shape[3]


def test_pipeline_realizes_headwise_memory_saving(tiny):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from kvpress_tpu.pipeline import KVPressPipeline
    import kvpress_tpu.pipeline as P
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"w{i}" for i in range(64))

    sizes = {}
    orig = P._generate_answer

    def probe(params, q, cache, *a, **kw):
        sizes.setdefault("buf", cache.keys.shape[3])
        return orig(params, q, cache, *a, **kw)

    P._generate_answer = probe
    try:
        out = pipe(ctx, question="what ?", max_new_tokens=4,
                   press=AdaKVPress(press=KnormPress(0.5), compact=True))
        compact_buf = sizes.pop("buf")
        out2 = pipe(ctx, question="what ?", max_new_tokens=4,
                    press=AdaKVPress(press=KnormPress(0.5), compact=False))
        masked_buf = sizes.pop("buf")
    finally:
        P._generate_answer = orig
    assert isinstance(out["answer"], str) and isinstance(out2["answer"], str)
    assert compact_buf < masked_buf, (compact_buf, masked_buf)
