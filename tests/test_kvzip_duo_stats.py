"""KVzip multi-pass scoring parity vs the reference (driven chunk-by-chunk
with identical repeat ids), DuoAttention mask parity, and
ExpectedAttentionStats behavior."""


import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.models.convert import from_torch_model
from kvpress_tpu.pipeline import KVPressPipeline, _scored_forward
from kvpress_tpu.presses import (
    DuoAttentionPress,
    ExpectedAttentionPress,
    ExpectedAttentionStatsPress,
    KVzipPress,
)
from kvpress_tpu.presses.kvzip import KVzipChunkScorer

from reference_oracle import load_reference, tiny_torch_model
from toy_tokenizer import ToyTokenizer

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


@pytest.mark.parametrize("plus,layerwise", [(False, False), (True, False), (False, True)])
def test_kvzip_mask_matches_reference(oracle, plus, layerwise):
    import torch
    from transformers import DynamicCache

    ref, model, params, cfg, runner, ids = oracle
    ratio = 0.6
    prefix_len, n_sink = 2, 4
    # Fixed chunk pairs shared by both sides: context split at 50.
    ctx = ids[0].tolist()
    suffix = [5, 6]
    pairs = [
        (ctx[prefix_len:50], [11, 12] + suffix + ctx[prefix_len:50]),
        (ctx[50:], [13, 14] + ctx[48:50] + suffix + ctx[50:]),
    ]

    # ---- reference side: drive internals with the same pairs ----
    press = ref.KVzipPress(
        compression_ratio=ratio, layerwise=layerwise,
        n_sink=n_sink, kvzip_plus_normalization=plus,
    )
    cache = DynamicCache()
    with torch.no_grad():
        model.model(input_ids=torch.tensor(ids), past_key_values=cache)
    press.context_length = S
    press.prefix_length = prefix_len
    press.score_val = torch.zeros((cfg.num_layers, 1, cfg.num_kv_heads, S))
    press.score_val[..., :n_sink] = 1.0
    hooks = [
        layer.self_attn.register_forward_hook(press.forward_hook, with_kwargs=True)
        for layer in model.model.layers
    ]
    for layer in model.model.layers:
        layer.self_attn.rotary_emb = model.model.rotary_emb
    try:
        start = prefix_len
        with torch.no_grad():
            for chunk, repeat in pairs:
                press.start_idx, press.end_idx = start, start + len(chunk)
                model(
                    input_ids=torch.tensor([repeat]), past_key_values=cache,
                    num_logits_to_keep=1,
                )
                start = press.end_idx
        press.compress_post(model)
        ref_masked = [l.self_attn.masked_key_indices for l in model.model.layers]
        ref_scores = press.score_val.float().numpy()
    finally:
        for h in hooks:
            h.remove()

    # ---- our side ----
    _, our_cache, _ = runner.prefill(
        params, jnp.asarray(ids), dtype=jnp.float32,
        max_size=S + max(len(r) for _, r in pairs),
    )
    score_val = np.zeros((cfg.num_layers, 1, cfg.num_kv_heads, S), np.float32)
    score_val[..., :n_sink] = 1.0
    start = prefix_len
    for chunk, repeat in pairs:
        end = start + len(chunk)
        scorer = KVzipChunkScorer(
            start_idx=start, end_idx=end, context_length=S,
            n_sink=n_sink, plus=plus,
        )
        state = scorer.init_state(cfg, 1, S)
        _, _, out = _scored_forward(
            params, jnp.asarray([repeat], jnp.int32), our_cache, state,
            runner=runner, press=scorer,
        )
        score_val[..., start:end] = np.asarray(out["scores"])
        start = end

    np.testing.assert_allclose(score_val, ref_scores, atol=2e-3, rtol=1e-2)

    ours_press = KVzipPress(
        compression_ratio=ratio, layerwise=layerwise,
        n_sink=n_sink, kvzip_plus_normalization=plus,
    )
    keep = ours_press.head_mask_from_scores(score_val)
    for layer_idx, masked in enumerate(ref_masked):
        exp = np.ones((1, cfg.num_kv_heads, S), dtype=bool)
        if masked is not None:
            b, h, s = (np.asarray(t) for t in masked)
            exp[b, h, s] = False
        np.testing.assert_array_equal(keep[layer_idx], exp, err_msg=f"layer {layer_idx}")


@pytest.mark.parametrize("quantized,scan_max", [
    (False, 3 << 30),   # scan form (small/mid caches)
    (True, 3 << 30),
    (False, 0),         # host-loop form (the 8B/128K path)
    (True, 0),
])
def test_kvzip_lean_repeat_pass_matches_scorer_path(oracle, quantized,
                                                    scan_max):
    """Both lean repeat-pass forms (traced chunk start, no cache append —
    scan for small/mid caches, host-loop per-layer for huge ones) must
    score identically to the static-span scorer press driven through the
    full forward. Quantized caches: the lean pass uses the exact bf16/f32
    repeat keys where the old path reads them back through the cache
    quantizer — scores differ only by that roundtrip."""
    _, _, params, cfg, runner, ids = oracle
    start, end, n_sink = 2, 50, 4
    rep = [11, 12, 5, 6] + ids[0, start:end].tolist()
    _, cache, _ = runner.prefill(
        params, jnp.asarray(ids, jnp.int32), max_size=S + len(rep) + 4,
        dtype=jnp.float32, quantized=quantized, kv_bits=8,
    )
    scorer = KVzipChunkScorer(
        start_idx=start, end_idx=end, context_length=S, n_sink=n_sink,
    )
    state = scorer.init_state(cfg, 1, S)
    rep_arr = jnp.asarray([rep], jnp.int32)
    _, _, out = _scored_forward(
        params, rep_arr, cache, state, runner=runner, press=scorer,
    )
    ref_scores = np.asarray(out["scores"])
    cache2, sc = runner.kvzip_repeat_pass(
        params, rep_arr, cache, start, min(n_sink, start), end - start,
        scan_max_bytes=scan_max,
    )
    tol = dict(atol=5e-2) if quantized else dict(atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), ref_scores, **tol)
    # the lean pass must leave the cache untouched (rollback is free)
    assert int(jnp.max(cache2.length)) == S
    assert int(jnp.max(jnp.asarray(cache2.offset))) == S


def test_kvzip_pipeline_end_to_end():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(kp.Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"w{i}" for i in range(60))
    press = KVzipPress(compression_ratio=0.5, chunk_size=24)
    out = pipe(ctx, question="what is w3 ?", press=press, max_new_tokens=6)
    assert isinstance(out["answer"], str)


def test_kvzip_compact_matches_masked():
    """KVzipPress(compact=True) routes through cache.compact_masked: the
    answer must equal the mask-only run (compaction preserves kept content
    and slot-relative order)."""
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(kp.Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"w{i}" for i in range(64))
    a_mask = pipe(ctx, question="what is w3 ?", max_new_tokens=6,
                  press=KVzipPress(compression_ratio=0.6, chunk_size=24))
    a_comp = pipe(ctx, question="what is w3 ?", max_new_tokens=6,
                  press=KVzipPress(compression_ratio=0.6, chunk_size=24,
                                   compact=True))
    assert a_mask["answer"] == a_comp["answer"]


def test_duo_attention_mask(oracle):
    import torch
    from transformers import DynamicCache

    ref, model, params, cfg, runner, ids = oracle
    rng = np.random.default_rng(5)
    head_scores = rng.random((cfg.num_layers, cfg.num_kv_heads))

    class _TestDuo(ref.DuoAttentionPress):
        @staticmethod
        def load_attention_pattern(m):
            return 8, 16, head_scores

    ref_press = _TestDuo(head_compression_ratio=0.5)
    cache = DynamicCache()
    with ref_press(model), torch.no_grad():
        model.model(input_ids=torch.tensor(ids), past_key_values=cache)
        ref_masked = [l.self_attn.masked_key_indices for l in model.model.layers]

    ours = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=8, recent_size=16,
        head_scores=head_scores,
    )
    _, our_cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    for layer_idx, masked in enumerate(ref_masked):
        got = ~np.asarray(our_cache.mask[layer_idx])
        exp = np.zeros_like(got)
        if masked is not None:
            b, h, s = (np.asarray(t) for t in masked)
            exp[b, h, s] = True
        np.testing.assert_array_equal(got, exp, err_msg=f"layer {layer_idx}")


def test_expected_attention_stats(oracle):
    """Stats press with stats fitted on the very same context ≈ plain
    ExpectedAttention (same mu/cov up to pooling), and the offline collector
    produces the right shapes."""
    from kvpress_tpu.presses.expected_attention_stats import collect_query_stats

    ref, model, params, cfg, runner, ids = oracle
    stats = collect_query_stats(runner, params, [jnp.asarray(ids)], n_sink=4)
    assert stats["mu"].shape == (cfg.num_layers, cfg.num_heads, cfg.head_dim)
    assert stats["cov"].shape == (
        cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.head_dim
    )
    press = ExpectedAttentionStatsPress(compression_ratio=0.5, stats=stats)
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=press, dtype=jnp.float32)
    assert all(int(l) == 48 for l in cache.length)

    # kept sets should broadly agree with plain ExpectedAttention (same data)
    plain = ExpectedAttentionPress(compression_ratio=0.5)
    _, cache2, _ = runner.prefill(params, jnp.asarray(ids), press=plain, dtype=jnp.float32)
    k1 = np.asarray(cache.keys[0, 0, :, :48])
    k2 = np.asarray(cache2.keys[0, 0, :, :48])
    # compare overlap of kept rows per head
    for h in range(cfg.num_kv_heads):
        d = np.linalg.norm(k1[h][:, None] - k2[h][None], axis=-1)
        overlap = (d.min(axis=1) < 1e-5).mean()
        assert overlap > 0.7, overlap


def test_duo_on_the_fly_scoring(oracle):
    """On-the-fly head scores: right shape/range, reproducible, and usable as
    the press artifact (reference duo_attention_on_the_fly, :144-210)."""
    from kvpress_tpu.presses.duo import duo_attention_on_the_fly

    ref, model, params, cfg, runner, ids = oracle
    scores = duo_attention_on_the_fly(
        runner, params, [jnp.asarray(ids)], q_len=64
    )
    assert scores.shape == (cfg.num_layers, cfg.num_kv_heads)
    # area under a cumulative attention curve lies in (0, 1]
    assert (scores > 0).all() and (scores <= 1.0 + 1e-6).all()

    press = DuoAttentionPress(
        head_compression_ratio=0.5, sink_size=4, recent_size=8,
        head_scores=scores,
    )
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=press, dtype=jnp.float32)
    from kvpress_tpu.cache import masked_fraction
    assert float(masked_fraction(cache)) > 0.2


@pytest.mark.parametrize("scan_max", [3 << 30, 0])
def test_kvzip_lean_pass_sliding_window_model(scan_max):
    """Gemma3-style interleaved sliding/global layers through BOTH lean
    repeat-pass forms: the window lax.cond branch must score identically to
    the static-span scorer press driven through the full forward."""
    cfg = kp.tiny_config(num_layers=4, sliding_window=8,
                         rope_local_base_freq=500.0,
                         layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    Sc = 64
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.permutation(cfg.vocab_size)[:Sc][None], jnp.int32)
    start, end, n_sink = 2, 40, 4
    rep = [11, 12, 5, 6] + np.asarray(ids[0, start:end]).tolist()
    _, cache, _ = runner.prefill(params, ids, max_size=Sc + len(rep) + 4,
                                 dtype=jnp.float32)
    scorer = KVzipChunkScorer(start_idx=start, end_idx=end,
                              context_length=Sc, n_sink=n_sink)
    state = scorer.init_state(cfg, 1, Sc)
    rep_arr = jnp.asarray([rep], jnp.int32)
    _, _, out = _scored_forward(params, rep_arr, cache, state,
                                runner=runner, press=scorer)
    _, sc = runner.kvzip_repeat_pass(
        params, rep_arr, cache, start, min(n_sink, start), end - start,
        scan_max_bytes=scan_max,
    )
    np.testing.assert_allclose(np.asarray(sc), np.asarray(out["scores"]),
                               atol=1e-6, rtol=1e-5)
