"""Oracle parity for Cap, NonCausalAttn, SimLayerKV, Merging, LUKV; property
tests for the randomized Leverage/Compactor presses (the reference draws
unseeded torch Gaussians, so exact parity is not defined)."""

import numpy as np
import pytest
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.presses import (
    CapPress,
    CompactorPress,
    KnormPress,
    LeverageScorePress,
    LUKVPress,
    MergingPress,
    NonCausalAttnPress,
    SimLayerKVPress,
)

from reference_oracle import load_reference, run_reference_press, tiny_torch_model
from test_press_oracle import _match_sets

S = 96


@pytest.fixture(scope="module")
def oracle():
    ref = load_reference()
    model = tiny_torch_model("llama", eager=False)
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    rng = np.random.default_rng(0)
    ids = rng.permutation(cfg.vocab_size)[:S][None]
    return ref, model, params, cfg, runner, ids


PAIRS = [
    (
        "cap",
        lambda ref: ref.CapPress(compression_ratio=0.5),
        CapPress(compression_ratio=0.5),
    ),
    (
        "non_causal",
        lambda ref: ref.NonCausalAttnPress(compression_ratio=0.5, chunk_size=32),
        NonCausalAttnPress(compression_ratio=0.5, chunk_size=32),
    ),
    (
        "merging",
        lambda ref: ref.MergingPress(press=ref.KnormPress(0.5)),
        MergingPress(press=KnormPress(0.5)),
    ),
    (
        "merging_fraction",
        lambda ref: ref.MergingPress(press=ref.KnormPress(0.5), merge_fraction=0.75),
        MergingPress(press=KnormPress(0.5), merge_fraction=0.75),
    ),
]


@pytest.mark.parametrize("name,make_ref,ours", PAIRS, ids=[p[0] for p in PAIRS])
def test_press_matches_reference(oracle, name, make_ref, ours):
    ref, model, params, cfg, runner, ids = oracle
    ref_kv = run_reference_press(model, make_ref(ref), ids)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=2e-3)


def test_simlayerkv_matches_reference(oracle):
    ref, model, params, cfg, runner, ids = oracle
    # small n_recent so S=96 clears the min-length gate; threshold low so some
    # layers trigger lazily.
    ref_press = ref.SimLayerKVPress(lazy_threshold=0.4, n_recent=32, n_initial=4)
    ref_kv = run_reference_press(model, ref_press, ids)
    ours = SimLayerKVPress(lazy_threshold=0.4, n_recent=32, n_initial=4)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    # per-layer: lazy layers truncated, others full
    for layer, (rk, rv) in enumerate(ref_kv):
        assert int(cache.length[layer]) == rk.shape[2], f"layer {layer}"
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=2e-3)


def test_lukv_matches_reference(oracle):
    import torch
    from transformers import DynamicCache

    ref, model, params, cfg, runner, ids = oracle
    rng = np.random.default_rng(3)
    curve = rng.uniform(0.2, 0.8, size=(99, cfg.num_layers, cfg.num_kv_heads))

    ref_press = ref.LUKVPress(press=ref.KnormPress(), compression_ratio=0.5)
    ref_press._budget_curves = curve
    # post_init_from_model would fetch over HTTP; pre-seed and bypass.
    ref_press.post_init_from_model = lambda model: None
    cache = DynamicCache()
    with ref_press(model), torch.no_grad():
        model.model(input_ids=torch.tensor(ids), past_key_values=cache)
        ref_masked = [l.self_attn.masked_key_indices for l in model.model.layers]

    ours = LUKVPress(press=KnormPress(), compression_ratio=0.5, budget_curves=curve)
    _, our_cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    for layer_idx, masked in enumerate(ref_masked):
        got = ~np.asarray(our_cache.mask[layer_idx])
        exp = np.zeros_like(got)
        if masked is not None:
            b, h, s = (np.asarray(t) for t in masked)
            exp[b, h, s] = True
        np.testing.assert_array_equal(got, exp, err_msg=f"layer {layer_idx}")


def test_leverage_scores_match_direct_computation():
    """Leverage via sketch+Cholesky equals diag(X (XᵀX)⁻¹ Xᵀ) computed
    directly in numpy with the same sketch matrix."""
    rng = np.random.default_rng(0)
    k_states = rng.normal(size=(1, 2, 64, 16)).astype(np.float32)
    phi = rng.normal(size=(1, 2, 16, 8)).astype(np.float32) / np.sqrt(8)
    got = np.asarray(
        LeverageScorePress.compute_leverage_scores(
            jnp.asarray(k_states), jnp.asarray(phi)
        )
    )
    for h in range(2):
        X = (k_states[0, h] - k_states[0, h].mean(0)) @ phi[0, h]
        G = X.T @ X + 1e-2 * np.eye(8)
        lev = np.einsum("sk,kj,sj->s", X, np.linalg.inv(G), X)
        np.testing.assert_allclose(got[0, h], np.maximum(lev, 0), atol=1e-3)


def test_compactor_protects_sinks(oracle):
    ref, model, params, cfg, runner, ids = oracle
    press = CompactorPress(compression_ratio=0.5, chunk_size=32,
                           sink_size_start=8, sink_size_end=4)
    _, c_full, _ = runner.prefill(params, jnp.asarray(ids), dtype=jnp.float32)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=press, dtype=jnp.float32)
    n = int(cache.length[0])
    assert n == press.n_kept(S)
    # sink start (first 8) and end (last 4) rows must all survive
    full0 = np.asarray(c_full.keys[0, 0])       # (H, S, D)
    kept0 = np.asarray(cache.keys[0, 0, :, :n])
    for h in range(cfg.num_kv_heads):
        for idx in list(range(8)) + list(range(S - 4, S)):
            d = np.linalg.norm(kept0[h] - full0[h, idx], axis=-1).min()
            assert d < 1e-5, (h, idx, d)
