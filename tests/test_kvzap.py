"""KVzap subsystem: collector parity vs the reference's hook-based extractor,
surrogate training smoke, and end-to-end DMS(KVzap) compression."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.presses import DMSPress, KVzapPress
from kvpress_tpu.training import collect_scores, train_linear, train_mlp

from reference_oracle import load_reference, tiny_torch_model


@pytest.fixture(scope="module")
def setup():
    ref = load_reference()
    model = tiny_torch_model("llama", eager=True)
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    return ref, model, params, cfg, runner


def _reference_collect(model, ids, spans):
    import sys
    import torch

    sys.path.insert(0, "/root/reference")
    from kvzap.data import KVzapDataCollector

    collector = KVzapDataCollector(model, tokenizer=None)
    (collector._start_prompt, collector._end_prompt,
     collector._start_repeated_prompt, collector._end_repeated_prompt) = spans
    handles = collector._register_hooks()
    try:
        with torch.no_grad():
            model.model(torch.tensor(ids), output_attentions=True)
    finally:
        for h in handles:
            h.remove()
    X = np.stack([x.float().numpy() for x, _ in collector._data])
    y = np.stack([y.float().numpy() for _, y in collector._data])
    return X, y


def test_collector_matches_reference(setup):
    ref, model, params, cfg, runner = setup
    rng = np.random.default_rng(0)
    S = 80
    ids = rng.permutation(cfg.vocab_size)[:S][None]
    spans = (2, 30, 44, 72)   # prompt [2,30), repeat [44,72)

    ref_X, ref_y = _reference_collect(model, ids, spans)
    X, y = collect_scores(runner, params, jnp.asarray(ids), spans)

    np.testing.assert_allclose(np.asarray(X), ref_X, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-3, rtol=1e-2)


def test_train_and_compress(setup):
    """Collected scores → trained surrogate → DMS(KVzap) prunes in pipeline."""
    ref, model, params, cfg, runner = setup
    rng = np.random.default_rng(1)
    Xs, ys = [], []
    for i in range(4):
        S = 80
        ids = rng.permutation(cfg.vocab_size)[:S][None]
        spans = (2, 30, 44, 72)
        X, y = collect_scores(runner, params, jnp.asarray(ids), spans)
        Xs.append(np.asarray(X).transpose(1, 0, 2))   # (n, L, E)
        ys.append(np.asarray(y).transpose(1, 0, 2))
    X = jnp.asarray(np.concatenate(Xs))
    y = jnp.asarray(np.concatenate(ys))

    linear = train_linear(X, y)
    assert linear["w"].shape == (cfg.num_layers, cfg.hidden_size, cfg.num_kv_heads)

    mlp, metrics = train_mlp(X, y, hidden_dim=32, max_epochs=3, batch_size=32)
    assert metrics["history"][-1]["val_loss"] <= metrics["history"][0]["val_loss"] * 2

    # Linear surrogate should beat predicting the mean (R^2 > 0 on train data).
    from kvpress_tpu.presses.kvzap import kvzap_apply
    pred = jax.vmap(
        lambda l: kvzap_apply(linear, l, X[:, l][None])[0].T, out_axes=1
    )(jnp.arange(cfg.num_layers))
    ss_res = float(jnp.sum((pred - y) ** 2))
    ss_tot = float(jnp.sum((y - y.mean(axis=0, keepdims=True)) ** 2))
    assert ss_res < ss_tot, (ss_res, ss_tot)

    # End-to-end: DMS(KVzap) masks below-threshold tokens during prefill.
    thresh = float(jnp.quantile(y, 0.5))
    press = DMSPress(
        press=KVzapPress(surrogate=linear), threshold=thresh, sliding_window_size=16
    )
    ids = rng.permutation(cfg.vocab_size)[:64][None]
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=press, dtype=jnp.float32)
    from kvpress_tpu.cache import masked_fraction
    frac = float(masked_fraction(cache))
    assert 0.0 < frac < 1.0, frac
