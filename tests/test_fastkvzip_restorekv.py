"""FastKVzip gate math parity vs the reference gate module (identical weights)
and end-to-end masking; RestoreKV budget-matched eviction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.cache import masked_fraction
from kvpress_tpu.pipeline import KVPressPipeline
from kvpress_tpu.presses import (
    FastKVzipPress,
    RestoreKVPress,
    init_random_gates,
    init_random_lora,
)
from kvpress_tpu.presses.fastkvzip import gate_scores

from reference_oracle import load_reference
from toy_tokenizer import ToyTokenizer


def test_gate_scores_match_reference_module():
    import torch

    load_reference()
    from kvpress.presses.fastkvzip_press import FastKVzipGate

    E, H, G, dg, sink = 32, 2, 3, 16, 4
    torch.manual_seed(0)
    gate = FastKVzipGate(0, E, H, G, torch.float32, output_dim=dg, sink=sink)
    with torch.no_grad():
        gate.k_base.normal_(0, 0.2)
        gate.b.normal_(0, 0.2)
    h = torch.randn(1, 10, E)
    with torch.no_grad():
        ref = gate(h).numpy()

    ours_gates = {
        "wq": jnp.asarray(gate.q_proj.weight.detach().numpy().T)[None],
        "bq": jnp.asarray(gate.q_proj.bias.detach().numpy())[None],
        "wk": jnp.asarray(gate.k_proj.weight.detach().numpy().T)[None],
        "q_norm": jnp.asarray(gate.q_norm.weight.detach().numpy())[None],
        "k_norm": jnp.asarray(gate.k_norm.weight.detach().numpy())[None],
        "k_base": jnp.asarray(gate.k_base.detach().numpy())[None],
        "b": jnp.asarray(gate.b.detach().numpy())[None],
    }
    got = np.asarray(gate_scores(ours_gates, 0, jnp.asarray(h.numpy())))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    return cfg, params, runner


def test_fastkvzip_end_to_end(tiny):
    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    gates = init_random_gates(jax.random.PRNGKey(1), cfg)
    press = FastKVzipPress(compression_ratio=0.5, gates=gates, n_sink=2)

    import kvpress_tpu.pipeline as P
    captured = {}
    orig = P._generate_answer

    def probe(params, q, cache, *a, **kw):
        captured["mask_frac"] = float(masked_fraction(cache))
        return orig(params, q, cache, *a, **kw)

    P._generate_answer = probe
    try:
        ctx = " ".join(f"w{i}" for i in range(64))
        out = pipe(ctx, question="what ?", press=press, max_new_tokens=4)
    finally:
        P._generate_answer = orig
    assert isinstance(out["answer"], str)
    # global budget: masked fraction ≈ ratio (window/sink protection skews it
    # slightly below on short contexts)
    assert 0.3 < captured["mask_frac"] <= 0.5, captured


def test_restorekv_budget_matched(tiny):
    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    key = jax.random.PRNGKey(2)
    embeddings = jax.random.normal(key, (8, cfg.hidden_size), jnp.float32) * 0.02
    lora = init_random_lora(key, cfg)
    press = RestoreKVPress(
        compression_ratio=0.5, chunk_size=24,
        restore_embeddings=embeddings, lora=lora,
    )

    import kvpress_tpu.pipeline as P
    captured = {}
    orig = P._generate_answer

    def probe(params, q, cache, *a, **kw):
        captured["len"] = np.asarray(cache.length)
        captured["offset"] = int(cache.offset)
        captured["mask_frac"] = float(masked_fraction(cache))
        return orig(params, q, cache, *a, **kw)

    P._generate_answer = probe
    try:
        ctx = " ".join(f"w{i}" for i in range(60))
        out = pipe(ctx, question="what ?", press=press, max_new_tokens=4)
    finally:
        P._generate_answer = orig
    assert isinstance(out["answer"], str)
    # restore pass appended 8 slots to every layer and advanced the offset
    assert all(l == 60 + 8 for l in captured["len"]), captured["len"]
    assert captured["offset"] == 68
    # budget-matched: masked fraction over valid slots ≈ (ratio + 8/60) · 60/68
    expected = (0.5 + 8 / 60) * 60 / 68
    assert abs(captured["mask_frac"] - expected) < 0.05, captured


def test_fastkvzip_compact_matches_masked(tiny):
    """FastKVzipPress(compact=True) — the post-mask branch of the pipeline
    compaction hook — answers identically to the mask-only run."""
    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    gates = init_random_gates(jax.random.PRNGKey(1), cfg)
    ctx = " ".join(f"w{i}" for i in range(64))
    a_mask = pipe(ctx, question="what ?", max_new_tokens=4,
                  press=FastKVzipPress(compression_ratio=0.5, gates=gates,
                                       n_sink=2))
    a_comp = pipe(ctx, question="what ?", max_new_tokens=4,
                  press=FastKVzipPress(compression_ratio=0.5, gates=gates,
                                       n_sink=2, compact=True))
    assert a_mask["answer"] == a_comp["answer"]
