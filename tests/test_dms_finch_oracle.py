"""DMS and Finch parity against the reference oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.cache import masked_fraction
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.presses import DMSPress, FinchPress, KnormPress

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


def test_dms_prefill_mask_matches_reference(oracle):
    import torch
    from transformers import DynamicCache

    ref, model, params, cfg, runner, ids = oracle
    threshold = -0.65   # some knorm scores (-||k||) above/below
    ref_press = ref.DMSPress(
        press=ref.KnormPress(), threshold=threshold, sliding_window_size=32
    )
    cache = DynamicCache()
    with ref_press(model), torch.no_grad():
        model.model(input_ids=torch.tensor(ids), past_key_values=cache)
        ref_masked = [l.self_attn.masked_key_indices for l in model.model.layers]
    ref_ratio = ref_press.compression_ratio

    ours = DMSPress(press=KnormPress(), threshold=threshold, sliding_window_size=32)
    _, our_cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    for layer_idx, masked in enumerate(ref_masked):
        got = ~np.asarray(our_cache.mask[layer_idx])
        exp = np.zeros_like(got)
        if masked is not None:
            b, h, s = (np.asarray(t) for t in masked)
            exp[b, h, s] = True
        np.testing.assert_array_equal(got, exp, err_msg=f"layer {layer_idx}")
    assert abs(float(masked_fraction(our_cache)) - ref_ratio) < 1e-6


@pytest.mark.parametrize("rerotate", [False, True])
def test_finch_matches_reference(oracle, rerotate):
    ref, model, params, cfg, runner, ids = oracle
    ref_press = ref.FinchPress(compression_ratio=0.5, rerotate_keys=rerotate)
    # Bypass the reference's delimiter machinery: fix the window directly.
    ref_press.window_size = 16
    ref_press.delimiter_token_id = 10**9   # absent from input
    ref_kv = run_reference_press(model, ref_press, ids)

    ours = FinchPress(compression_ratio=0.5, rerotate_keys=rerotate, window_size=16)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=2e-3)


def test_finch_chunked(oracle):
    ref, model, params, cfg, runner, ids = oracle
    ref_press = ref.FinchPress(compression_ratio=0.5, chunk_length=48, rerotate_keys=False)
    ref_press.window_size = 8
    ref_press.delimiter_token_id = 10**9
    ref_kv = run_reference_press(model, ref_press, ids)

    ours = FinchPress(
        compression_ratio=0.5, chunk_length=48, rerotate_keys=False, window_size=8
    )
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=2e-3)
