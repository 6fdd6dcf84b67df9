"""Int8 quantized KV cache: storage dtype, dequant accuracy, press interplay
(the reference's QuantizedCache × press matrix, tests/test_pipeline.py:109-126)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.cache import quantize_kv


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params, Runner.create(cfg)


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32))
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8
    err = jnp.max(jnp.abs(q.astype(jnp.float32) * s - x))
    assert float(err) < float(jnp.max(jnp.abs(x))) / 100


def test_quantized_prefill_matches_fp(tiny):
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0, cfg.vocab_size)
    lg_fp, c_fp, _ = runner.prefill(
        params, ids, dtype=jnp.float32, compute_logits=True
    )
    lg_q, c_q, _ = runner.prefill(
        params, ids, dtype=jnp.float32, compute_logits=True, quantized=True
    )
    assert c_q.keys.dtype == jnp.int8
    assert c_q.is_quantized
    # logits close (int8 cache noise only)
    diff = np.abs(np.asarray(lg_fp) - np.asarray(lg_q)).max()
    ref_scale = np.abs(np.asarray(lg_fp)).max()
    assert diff < 0.1 * ref_scale, (diff, ref_scale)


def test_quantized_press_and_decode(tiny):
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 40), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    _, cache, _ = runner.prefill(
        params, ids, press=press, max_size=56, dtype=jnp.float32, quantized=True
    )
    assert all(int(l) == 20 for l in cache.length)
    # decode a few tokens against the quantized compressed cache
    tok = ids[:, -1:]
    for _ in range(4):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        tok = jnp.argmax(logits, axis=-1)
        assert np.isfinite(np.asarray(logits)).all()
    assert int(cache.length[0]) == 24
    assert cache.keys.dtype == jnp.int8


def test_int4_roundtrip():
    from kvpress_tpu.cache import dequantize_kv
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 16, 32))
    q, s = quantize_kv(x, bits=4)
    assert q.dtype == jnp.uint8 and q.shape[-1] == 16
    err = jnp.max(jnp.abs(dequantize_kv(q, s, 4, jnp.float32) - x))
    # int4: coarse but bounded by scale/2
    assert float(err) <= float(jnp.max(s)) * 0.51


def test_int4_prefill_press_decode(tiny):
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 40), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    _, cache, _ = runner.prefill(
        params, ids, press=press, max_size=56, dtype=jnp.float32,
        quantized=True, kv_bits=4,
    )
    assert cache.keys.dtype == jnp.uint8
    assert cache.keys.shape[-1] == cfg.head_dim // 2    # packed nibbles
    assert all(int(l) == 20 for l in cache.length)
    tok = ids[:, -1:]
    for _ in range(3):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        tok = jnp.argmax(logits, axis=-1)
        assert np.isfinite(np.asarray(logits)).all()
    assert int(cache.length[0]) == 23


def test_pipeline_quantized_cache(tiny):
    """Pipeline-level quantized cache (the reference's cache=QuantizedCache())."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from kvpress_tpu.pipeline import KVPressPipeline
    from toy_tokenizer import ToyTokenizer

    cfg, params, runner = tiny
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"w{i}" for i in range(30))
    for bits in (8, 4):
        out = pipe(ctx, question="what ?", press=KnormPress(0.5),
                   max_new_tokens=4, quantized=True, kv_bits=bits)
        assert isinstance(out["answer"], str)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_gqa_attention_matches_dequant(bits):
    """quant_gqa_attention(payload) == gqa_attention(dequantized buffer):
    the fused path must be numerically identical up to dtype rounding —
    scales applied algebraically outside the dot (ops/attention.py)."""
    from kvpress_tpu.cache import dequantize_kv
    from kvpress_tpu.ops.attention import (
        attention_bias, gqa_attention, quant_gqa_attention,
    )

    B, Hq, Hkv, T, S, D = 2, 8, 2, 3, 24, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    pk, sk = quantize_kv(k, bits)
    pv, sv = quantize_kv(v, bits)
    head_mask = jax.random.bernoulli(ks[0], 0.8, (B, Hkv, S))
    bias = attention_bias(jnp.asarray(S - T, jnp.int32), T, S, head_mask=head_mask)

    dk = dequantize_kv(pk, sk, bits, jnp.float32)
    dv = dequantize_kv(pv, sv, bits, jnp.float32)
    ref, _ = gqa_attention(q, dk, dv, bias, D**-0.5, softcap=30.0)
    out = quant_gqa_attention(q, pk, pv, sk, sv, bias, D**-0.5, bits, softcap=30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_quantized_decode_never_dequantizes_buffer(tiny):
    """The decode-step jaxpr must not contain a dequantized (S-sized bf16)
    KV intermediate: the payload feeds attention directly (VERDICT r1 #1)."""
    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, cfg.vocab_size)
    _, cache, _ = runner.prefill(params, ids, max_size=48, quantized=True)
    S, D = cache.max_size, cfg.head_dim
    # A full dequant materializes a float (…, Hkv, S, D) buffer: no convert
    # producing one may appear anywhere in the lowered HLO.
    txt = jax.jit(
        lambda p, t, c: runner.forward(p, t, c, logits_last_only=True)
    ).lower(params, ids[:, -1:], cache).as_text()
    needle = f"{cfg.num_kv_heads},{S},{D}"
    bad = [
        ln for ln in txt.splitlines()
        if "convert" in ln and needle in ln
        and ("f32[" in ln.split("=")[0] or "bf16[" in ln.split("=")[0])
    ]
    assert not bad, bad[:3]


def test_weight_int8_logit_parity(tiny):
    """quantize_params_int8: logits close to bf16 weights; same Runner code
    path (the TPU counterpart of the reference's FP8 models,
    evaluate.py:370-372)."""
    from kvpress_tpu.models.llama import quantize_params_int8

    cfg, params, runner = tiny
    qparams = quantize_params_int8(params)
    assert qparams["layers"]["wq"].dtype == jnp.int8
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 32), 0, cfg.vocab_size)
    lg, cache, _ = runner.prefill(params, ids, compute_logits=True,
                                  dtype=jnp.float32)
    lg_q, cache_q, _ = runner.prefill(qparams, ids, compute_logits=True,
                                      dtype=jnp.float32)
    ref = np.abs(np.asarray(lg)).max()
    assert np.abs(np.asarray(lg) - np.asarray(lg_q)).max() < 0.05 * ref
    # decode works against the quantized-weight model
    logits, cache_q, _ = runner.forward(
        qparams, ids[:, -1:], cache_q, logits_last_only=True
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("tied", [True, False])
def test_embed_lm_head_int8_parity(tied):
    """quantize_params_int8(include_embeddings=True): int8 token embedding
    (per-row scales — gathered rows dequantize locally, tied head reuses the
    same scales per output channel) and int8 untied lm_head. Logits stay
    close to the bf16-embedding model; decode runs."""
    from kvpress_tpu import init_params, tiny_config
    from kvpress_tpu.models.llama import quantize_params_int8

    cfg = tiny_config(tie_word_embeddings=tied)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    qparams = quantize_params_int8(params, include_embeddings=True)
    assert qparams["embed"].dtype == jnp.int8
    assert ("lm_head" in qparams) == (not tied)
    if not tied:
        assert qparams["lm_head"].dtype == jnp.int8

    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 32), 0, cfg.vocab_size)
    lg, _, _ = runner.prefill(params, ids, compute_logits=True,
                              dtype=jnp.float32)
    lg_q, cache_q, _ = runner.prefill(qparams, ids, compute_logits=True,
                                      dtype=jnp.float32)
    ref = np.abs(np.asarray(lg)).max()
    assert np.abs(np.asarray(lg) - np.asarray(lg_q)).max() < 0.05 * ref
    logits, cache_q, _ = runner.forward(
        qparams, ids[:, -1:], cache_q, logits_last_only=True
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("tied", [True, False])
def test_init_params_int8_embeddings(tied):
    """init_params_int8(int8_embeddings=True) — the full-vocab 8B bench
    layout: int8 embed (+ untied lm_head) payloads with the
    quantize_params_int8(include_embeddings=True) scale shapes; the Runner
    serves it end to end."""
    from kvpress_tpu import tiny_config
    from kvpress_tpu.models.llama import init_params_int8

    cfg = tiny_config(tie_word_embeddings=tied)
    params = init_params_int8(cfg, jax.random.PRNGKey(0), dtype=jnp.float32,
                              int8_embeddings=True)
    assert params["embed"].dtype == jnp.int8
    assert params["embed_scale"].shape == (cfg.vocab_size, 1)
    if not tied:
        assert params["lm_head"].dtype == jnp.int8
        assert params["lm_head_scale"].shape == (1, cfg.vocab_size)
    runner = Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 24), 0,
                             cfg.vocab_size)
    lg, cache, _ = runner.prefill(params, ids, compute_logits=True,
                                  dtype=jnp.float32, max_size=32)
    logits, cache, _ = runner.forward(params, ids[:, -1:], cache,
                                      logits_last_only=True)
    assert np.isfinite(np.asarray(lg)).all()
    assert np.isfinite(np.asarray(logits)).all()


def test_fp8_checkpoint_conversion():
    """fp8 safetensors (weight + 128x128 weight_scale_inv blocks) dequantize
    at conversion to the same params a bf16 checkpoint would give."""
    import torch

    from transformers import AutoModelForCausalLM, LlamaConfig

    from kvpress_tpu.models.convert import convert_state_dict, from_torch_model

    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False))
    model.eval()
    params_ref, cfg = from_torch_model(model, dtype=jnp.float32)

    # fake-fp8 the linears: block scales of 32x32, payload = w / scale in f8
    sd = dict(model.state_dict())
    fp8_sd = {}
    for k, v in sd.items():
        if k.endswith(".weight") and ".proj" in k:
            w = v.float()
            BR = BC = 32
            r = -(-w.shape[0] // BR) * BR
            c = -(-w.shape[1] // BC) * BC
            wp = torch.zeros(r, c)
            wp[: w.shape[0], : w.shape[1]] = w
            blocks = wp.reshape(r // BR, BR, c // BC, BC)
            amax = blocks.abs().amax(dim=(1, 3), keepdim=True).clamp(min=1e-8)
            scale = amax / 448.0                       # e4m3 max
            payload = (blocks / scale).reshape(r, c)[: w.shape[0], : w.shape[1]]
            fp8_sd[k] = payload.to(torch.float8_e4m3fn)
            fp8_sd[k + "_scale_inv"] = scale.reshape(r // BR, c // BC)
        else:
            fp8_sd[k] = v
    params_fp8 = convert_state_dict(fp8_sd, cfg, jnp.float32)
    for name in ("wq", "wo", "wd"):
        ref = np.asarray(params_ref["layers"][name])
        got = np.asarray(params_fp8["layers"][name])
        # fp8 payload rounding only
        assert np.abs(ref - got).max() < 0.1 * np.abs(ref).max() + 1e-4


def test_adakv_compact_with_quantized_cache(tiny):
    """AdaKV per-head compaction composes with int4 storage: the press sees
    dense values (storage-only quantization), so the kept sets equal the
    bf16 run; the compacted cache requantizes, shrinks and decodes."""
    from kvpress_tpu import AdaKVPress, KnormPress
    from kvpress_tpu.cache import shrink

    cfg, params, runner = tiny
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 48), 0, cfg.vocab_size)
    press = AdaKVPress(press=KnormPress(compression_ratio=0.5), compact=True)

    _, cq, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32,
                              quantized=True, kv_bits=4)
    _, cb, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(cq.mask), np.asarray(cb.mask))
    np.testing.assert_array_equal(np.asarray(cq.length), np.asarray(cb.length))
    assert cq.keys.dtype == jnp.uint8

    cq = shrink(cq, int(np.max(np.asarray(cq.length))) + 4)
    tok = ids[:, -1:]
    for _ in range(3):
        logits, cq, _ = runner.forward(params, tok, cq, logits_last_only=True)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()
    assert not bool(cq.overflowed)


def test_weight_int4_dequant_exact(tiny):
    """dequant_weight inverts quantize_params_int4's packing exactly (the
    same lo/hi nibble algebra _lin computes), and the quantization error is
    bounded by the per-half step size."""
    from kvpress_tpu.models.llama import dequant_weight, quantize_params_int4

    cfg, params, runner = tiny
    qparams = quantize_params_int4(params)
    layers = qparams["layers"]
    assert layers["wq"].dtype == jnp.uint8
    L, I2, O = layers["wq"].shape
    assert I2 == params["layers"]["wq"].shape[1] // 2
    assert layers["wq_scale"].shape == (L, 2, O)
    w = np.asarray(params["layers"]["wq"], np.float32)
    deq = np.asarray(dequant_weight(layers, "wq", jnp.float32))
    step = np.asarray(layers["wq_scale"])  # (L, 2, O)
    halves = np.stack([w[:, :I2], w[:, I2:]], 1)
    deq_halves = np.stack([deq[:, :I2], deq[:, I2:]], 1)
    assert np.abs(halves - deq_halves).max() <= (step[:, :, None] * 0.5 + 1e-6).max()


def test_weight_int4_logit_parity(tiny):
    """quantize_params_int4: logits close to full-precision; decode runs;
    int8→int4 re-quantization path also works (dequant-first)."""
    from kvpress_tpu.models.llama import (
        quantize_params_int4,
        quantize_params_int8,
    )

    cfg, params, runner = tiny
    qparams = quantize_params_int4(params)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 32), 0, cfg.vocab_size)
    lg, _, _ = runner.prefill(params, ids, compute_logits=True,
                              dtype=jnp.float32)
    lg_q, cache_q, _ = runner.prefill(qparams, ids, compute_logits=True,
                                      dtype=jnp.float32)
    ref = np.abs(np.asarray(lg)).max()
    assert np.abs(np.asarray(lg) - np.asarray(lg_q)).max() < 0.15 * ref
    logits, cache_q, _ = runner.forward(
        qparams, ids[:, -1:], cache_q, logits_last_only=True
    )
    assert np.isfinite(np.asarray(logits)).all()

    # from-int8 path dequantizes before requantizing (no payload reuse)
    q48 = quantize_params_int4(quantize_params_int8(params))
    lg_q2, _, _ = runner.prefill(q48, ids, compute_logits=True,
                                 dtype=jnp.float32)
    assert np.abs(np.asarray(lg_q2) - np.asarray(lg_q)).max() < 0.05 * ref


def test_weight_int4_with_int4_kv_press_decode(tiny):
    """Full stack: int4 weights + int4 KV + Knorm press through prefill and
    decode (the bench headline path at 8B scale)."""
    from kvpress_tpu import KnormPress
    from kvpress_tpu.cache import shrink
    from kvpress_tpu.models.llama import quantize_params_int4

    cfg, params, runner = tiny
    qparams = quantize_params_int4(params)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 48), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    _, cache, _ = runner.prefill(qparams, ids, press=press, quantized=True,
                                 kv_bits=4, dtype=jnp.float32)
    cache = shrink(cache, 40)
    tok = ids[:, -1:]
    for _ in range(4):
        logits, cache, _ = runner.forward(qparams, tok, cache,
                                          logits_last_only=True)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        assert np.isfinite(np.asarray(logits)).all()


def test_compact_masked_semantics():
    """cache.compact_masked gathers each head's kept entries to the front in
    original order, drops per-layer length to the max per-head count, and
    leaves quantized scales aligned with their payloads."""
    import dataclasses

    from kvpress_tpu.cache import compact_masked, init_cache
    from kvpress_tpu.config import ModelConfig

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=3, num_heads=4, num_kv_heads=2, head_dim=8)
    L, B, H, S = 3, 2, 2, 16
    rng = np.random.default_rng(0)
    cache = init_cache(cfg, B, S, dtype=jnp.float32)
    keys = jnp.asarray(rng.normal(size=(L, B, H, S, 8)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(L, B, H, S, 8)), jnp.float32)
    length = jnp.asarray([12, 16, 9], jnp.int32)
    mask = jnp.asarray(rng.random((L, B, H, S)) > 0.4)
    cache = dataclasses.replace(cache, keys=keys, values=values,
                                length=length, mask=mask)
    # snapshot before the call: compact_masked DONATES the cache buffers
    keys_np, mask_np = np.asarray(keys), np.asarray(mask)
    length_np = np.asarray(length)
    out = compact_masked(cache)

    pos = np.arange(S)
    for l in range(L):
        keep = mask_np[l] & (pos[None, None] < int(length_np[l]))
        counts = keep.sum(-1)
        assert int(out.length[l]) == counts.max()
        for b in range(B):
            for h in range(H):
                kept = keys_np[l, b, h][keep[b, h]]
                np.testing.assert_array_equal(
                    np.asarray(out.keys[l, b, h, :counts[b, h]]), kept)
                np.testing.assert_array_equal(
                    np.asarray(out.mask[l, b, h]), pos < counts[b, h])
