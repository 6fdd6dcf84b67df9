"""Press-by-press parity against the reference implementation run in-process
as a torch oracle: same tiny model, same inputs → the set of kept KV entries
must match (up to ordering, which is permutation-invariant for attention)."""

import numpy as np
import pytest
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.presses import (
    CURPress,
    ExpectedAttentionPress,
    KeyDiffPress,
    KnormPress,
    LagKVPress,
    ObservedAttentionPress,
    PyramidKVPress,
    SnapKVPress,
    StreamingLLMPress,
    TOVAPress,
)

from reference_oracle import load_reference, run_reference_press, tiny_torch_model

S = 96  # context length for oracle comparisons


@pytest.fixture(scope="module")
def oracle():
    ref = load_reference()
    model = tiny_torch_model("llama", eager=True)
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    rng = np.random.default_rng(0)
    ids = rng.permutation(cfg.vocab_size)[:S][None]  # unique tokens: no tied scores
    return ref, model, params, cfg, runner, ids


def _match_sets(ref_kv, ours_keys, ours_values, lengths, atol=1e-3):
    """Per layer/head the kept {key‖value} row sets must coincide: every
    reference row must have a (mutually) near-identical row of ours.
    Nearest-row matching is robust to row ordering and float noise."""
    for layer, (rk, rv) in enumerate(ref_kv):
        n = rk.shape[2]
        assert int(lengths[layer]) == n, (
            f"layer {layer}: kept {int(lengths[layer])} vs reference {n}"
        )
        ok = np.asarray(ours_keys[layer, 0, :, :n])
        ov = np.asarray(ours_values[layer, 0, :, :n])
        for h in range(rk.shape[1]):
            ref_rows = np.concatenate([rk[0, h], rv[0, h]], -1)
            our_rows = np.concatenate([ok[h], ov[h]], -1)
            d = np.linalg.norm(ref_rows[:, None] - our_rows[None, :], axis=-1)
            scale = np.maximum(np.linalg.norm(ref_rows, axis=-1), 1e-6)
            nearest = d.min(axis=1) / scale
            assert (nearest < atol).all(), (
                f"layer {layer} head {h}: worst row mismatch {nearest.max():.2e}"
            )
            # and injectively: each of our rows is also near some ref row
            nearest_rev = d.min(axis=0) / np.maximum(
                np.linalg.norm(our_rows, axis=-1), 1e-6
            )
            assert (nearest_rev < atol).all()


PAIRS = [
    (
        "knorm",
        lambda ref: ref.KnormPress(compression_ratio=0.5),
        KnormPress(compression_ratio=0.5),
    ),
    (
        "streaming_llm",
        lambda ref: ref.StreamingLLMPress(compression_ratio=0.5),
        StreamingLLMPress(compression_ratio=0.5),
    ),
    (
        "snapkv",
        lambda ref: ref.SnapKVPress(compression_ratio=0.5, window_size=16),
        SnapKVPress(compression_ratio=0.5, window_size=16),
    ),
    (
        "tova",
        lambda ref: ref.TOVAPress(compression_ratio=0.5),
        TOVAPress(compression_ratio=0.5),
    ),
    (
        "observed",
        lambda ref: ref.ObservedAttentionPress(compression_ratio=0.5),
        ObservedAttentionPress(compression_ratio=0.5),
    ),
    (
        "expected_attention",
        lambda ref: ref.ExpectedAttentionPress(compression_ratio=0.5),
        ExpectedAttentionPress(compression_ratio=0.5),
    ),
    (
        "expected_attention_nocov",
        lambda ref: ref.ExpectedAttentionPress(compression_ratio=0.4, use_covariance=False),
        ExpectedAttentionPress(compression_ratio=0.4, use_covariance=False),
    ),
    (
        "keydiff",
        lambda ref: ref.KeyDiffPress(compression_ratio=0.5),
        KeyDiffPress(compression_ratio=0.5),
    ),
    (
        "lagkv",
        lambda ref: ref.LagKVPress(compression_ratio=0.5, n_sink=4, lag_size=16),
        LagKVPress(compression_ratio=0.5, n_sink=4, lag_size=16),
    ),
    (
        "cur",
        lambda ref: ref.CURPress(compression_ratio=0.5),
        CURPress(compression_ratio=0.5),
    ),
    (
        "pyramidkv",
        lambda ref: ref.PyramidKVPress(compression_ratio=0.5, window_size=16),
        PyramidKVPress(compression_ratio=0.5, window_size=16),
    ),
]


@pytest.mark.parametrize("name,make_ref,ours", PAIRS, ids=[p[0] for p in PAIRS])
def test_press_matches_reference(oracle, name, make_ref, ours):
    ref, model, params, cfg, runner, ids = oracle
    ref_kv = run_reference_press(model, make_ref(ref), ids)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length)
