"""Wrapper-press parity against the reference oracle: kept-KV sets for
gather-based wrappers, masked-slot sets for head-wise (AdaKV-family) wrappers,
zeroed-channel patterns for ThinK."""

import numpy as np
import pytest
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.presses import (
    AdaKVPress,
    BlockPress,
    ChunkKVPress,
    ChunkPress,
    ComposedPress,
    CriticalAdaKVPress,
    CriticalKVPress,
    KeyRerotationPress,
    KnormPress,
    PerLayerCompressionPress,
    SnapKVPress,
    ThinKPress,
)

from reference_oracle import load_reference, run_reference_press, tiny_torch_model
from test_press_oracle import _match_sets

S = 96


@pytest.fixture(scope="module")
def oracle():
    ref = load_reference()
    # sdpa so AdaKV-family (which assert non-eager) works.
    model = tiny_torch_model("llama", eager=False)
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    rng = np.random.default_rng(0)
    ids = rng.permutation(cfg.vocab_size)[:S][None]  # unique tokens: no tied scores
    return ref, model, params, cfg, runner, ids


GATHER_PAIRS = [
    (
        "chunk",
        lambda ref: ref.ChunkPress(press=ref.KnormPress(0.5), chunk_length=32),
        ChunkPress(press=KnormPress(0.5), chunk_length=32),
    ),
    (
        "chunkkv",
        lambda ref: ref.ChunkKVPress(press=ref.KnormPress(0.5), chunk_length=16),
        ChunkKVPress(press=KnormPress(0.5), chunk_length=16),
    ),
    (
        "block",
        lambda ref: ref.BlockPress(press=ref.KeyDiffPress(0.5), block_size=24),
        BlockPress(press=kp.presses.KeyDiffPress(0.5), block_size=24),
    ),
    (
        "composed_knorm_think",
        lambda ref: ref.ComposedPress(
            [ref.SnapKVPress(0.4, window_size=16), ref.ThinKPress(0.5, window_size=16)]
        ),
        ComposedPress(
            (SnapKVPress(0.4, window_size=16), ThinKPress(0.5, window_size=16))
        ),
    ),
    (
        "criticalkv",
        lambda ref: ref.CriticalKVPress(press=ref.KnormPress(0.5)),
        CriticalKVPress(press=KnormPress(0.5)),
    ),
    (
        "key_rerotation",
        lambda ref: ref.KeyRerotationPress(press=ref.KnormPress(0.5)),
        KeyRerotationPress(press=KnormPress(0.5)),
    ),
]


@pytest.mark.parametrize("name,make_ref,ours", GATHER_PAIRS, ids=[p[0] for p in GATHER_PAIRS])
def test_wrapper_matches_reference(oracle, name, make_ref, ours):
    ref, model, params, cfg, runner, ids = oracle
    ref_kv = run_reference_press(model, make_ref(ref), ids)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=2e-4)


def test_per_layer_compression(oracle):
    ref, model, params, cfg, runner, ids = oracle
    ratios = (0.1, 0.5, 0.8)
    ref_press = ref.PerLayerCompressionPress(
        press=ref.KnormPress(0.5), compression_ratios=list(ratios)
    )
    ref_kv = run_reference_press(model, ref_press, ids)
    ours = PerLayerCompressionPress(press=KnormPress(0.5), compression_ratios=ratios)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length)


MASK_PAIRS = [
    (
        "adakv",
        lambda ref: ref.AdaKVPress(press=ref.KnormPress(0.5)),
        AdaKVPress(press=KnormPress(0.5)),
    ),
    (
        "critical_adakv",
        lambda ref: ref.CriticalAdaKVPress(press=ref.KnormPress(0.5)),
        CriticalAdaKVPress(press=KnormPress(0.5)),
    ),
]


@pytest.mark.parametrize("name,make_ref,ours", MASK_PAIRS, ids=[p[0] for p in MASK_PAIRS])
def test_headwise_mask_matches_reference(oracle, name, make_ref, ours):
    import torch
    from transformers import DynamicCache

    ref, model, params, cfg, runner, ids = oracle
    press = make_ref(ref)
    cache = DynamicCache()
    with press(model), torch.no_grad():
        model.model(input_ids=torch.tensor(ids), past_key_values=cache)
        ref_masked = []
        for layer in model.model.layers:
            ref_masked.append(layer.self_attn.masked_key_indices)

    _, our_cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    assert our_cache.mask is not None
    for layer_idx, masked in enumerate(ref_masked):
        got = ~np.asarray(our_cache.mask[layer_idx])       # True = pruned
        exp = np.zeros_like(got)
        b, h, s = (np.asarray(t) for t in masked)
        exp[b, h, s] = True
        np.testing.assert_array_equal(got, exp, err_msg=f"layer {layer_idx}")


def test_think_zeroes_channels(oracle):
    ref, model, params, cfg, runner, ids = oracle
    ref_kv = run_reference_press(
        model, ref.ThinKPress(key_channel_compression_ratio=0.5, window_size=16), ids
    )
    ours = ThinKPress(key_channel_compression_ratio=0.5, window_size=16)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    for layer, (rk, rv) in enumerate(ref_kv):
        np.testing.assert_allclose(
            np.asarray(cache.keys[layer]), rk, atol=2e-4, rtol=1e-3
        )
