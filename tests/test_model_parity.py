"""Logit parity vs HuggingFace transformers on tiny random checkpoints —
the TPU equivalent of the reference's llama2-0b unit-test substrate
(reference tests/fixtures.py:10-48)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kvpress_tpu import Runner, init_cache
from kvpress_tpu.models.convert import from_torch_model


def _hf_tiny(model_type="llama", **kw):
    import torch
    from transformers import (
        AutoModelForCausalLM,
        LlamaConfig,
        MistralConfig,
        Qwen2Config,
        Qwen3Config,
    )

    common = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    common.update(kw)
    cfg_cls = {
        "llama": LlamaConfig,
        "mistral": MistralConfig,
        "qwen2": Qwen2Config,
        "qwen3": Qwen3Config,
    }[model_type]
    if model_type == "qwen3":
        common["head_dim"] = common["hidden_size"] // common["num_attention_heads"]
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg_cls(**common))
    model.eval()
    return model


@pytest.mark.parametrize("model_type", ["llama", "mistral", "qwen2", "qwen3"])
def test_logits_match_hf(model_type):
    import torch

    model = _hf_tiny(model_type)
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))

    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()

    cache = init_cache(cfg, 2, 17, dtype=jnp.float32)
    logits, cache2, _ = runner.forward(params, jnp.asarray(ids), cache)
    got = np.asarray(logits)

    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
    assert int(cache2.length[0]) == 17
    assert int(cache2.offset) == 17


def test_incremental_decode_matches_full_forward():
    """Prefill + per-token decode must equal a single full forward (cache
    correctness), mirroring reference tests/test_generate.py:9-26 semantics."""
    import torch

    model = _hf_tiny("llama")
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 12)))

    cache_full = init_cache(cfg, 1, 12, dtype=jnp.float32)
    full_logits, _, _ = runner.forward(params, ids, cache_full)

    cache = init_cache(cfg, 1, 12, dtype=jnp.float32)
    _, cache, _ = runner.forward(params, ids[:, :8], cache, compute_logits=False)
    step_logits = []
    for t in range(8, 12):
        lg, cache, _ = runner.forward(
            params, ids[:, t : t + 1], cache, logits_last_only=True
        )
        step_logits.append(np.asarray(lg)[:, 0])
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, np.asarray(full_logits)[:, 8:], atol=2e-3, rtol=2e-3)


def test_phi3_fused_qkv_parity():
    """Phi3 fused qkv/gate_up split at conversion (reference utils.py:30-43)."""
    import torch
    from transformers import AutoModelForCausalLM, Phi3Config

    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, pad_token_id=0))
    model.eval()
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = np.random.default_rng(0).integers(1, 256, (1, 15))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    cache = init_cache(cfg, 1, 15, dtype=jnp.float32)
    logits, _, _ = runner.forward(params, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("mixed", [False, True])
def test_gemma3_parity(mixed):
    """Gemma3: (1+w) norms, q/k-norm, query_pre_attn_scalar, dual RoPE bases,
    interleaved sliding-window layers."""
    import torch
    from transformers import AutoModelForCausalLM, Gemma3TextConfig

    torch.manual_seed(0)
    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
              head_dim=16, max_position_embeddings=512, pad_token_id=0,
              sliding_window=8, tie_word_embeddings=False)
    if mixed:
        kw["layer_types"] = [
            "sliding_attention" if (i + 1) % 2 else "full_attention"
            for i in range(4)
        ]
    model = AutoModelForCausalLM.from_config(Gemma3TextConfig(**kw))
    model.eval()
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = np.random.default_rng(0).integers(1, 256, (1, 20))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    cache = init_cache(cfg, 1, 20, dtype=jnp.float32)
    logits, _, _ = runner.forward(params, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)


def test_gemma3_sliding_layers_not_compressed():
    """Sliding-window (local) layers are skipped by compression
    (reference base_press.py:195-200)."""
    import torch
    from transformers import AutoModelForCausalLM, Gemma3TextConfig

    from kvpress_tpu import KnormPress

    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, pad_token_id=0,
        sliding_window=8, tie_word_embeddings=False,
        layer_types=["sliding_attention" if (i + 1) % 2 else "full_attention"
                     for i in range(4)]))
    model.eval()
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 256, (1, 24)))
    _, cache, _ = runner.prefill(
        params, ids, press=KnormPress(compression_ratio=0.5), dtype=jnp.float32
    )
    lengths = [int(l) for l in cache.length]
    for i, sliding in enumerate(cfg.layer_is_sliding):
        assert lengths[i] == (24 if sliding else 12), (i, lengths)


def test_sliding_layer_buffers_untouched_by_press():
    """Regression: a prefill press must leave sliding-layer KV CONTENT
    identical to the pressless prefill, not just restore length/mask — the
    press's gather-to-front would otherwise scramble the buffer front while
    the full length is restored."""
    import jax

    import kvpress_tpu as kp

    cfg = kp.tiny_config(num_layers=4, sliding_window=8,
                         layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 256, (1, 24)))
    _, plain, _ = runner.prefill(params, ids, dtype=jnp.float32)
    _, pressed, _ = runner.prefill(
        params, ids, press=kp.KnormPress(compression_ratio=0.5),
        dtype=jnp.float32,
    )
    for i, sliding in enumerate(cfg.layer_is_sliding):
        if sliding:
            np.testing.assert_array_equal(
                np.asarray(pressed.keys[i]), np.asarray(plain.keys[i]), str(i)
            )
            np.testing.assert_array_equal(
                np.asarray(pressed.values[i]), np.asarray(plain.values[i])
            )

    # quantized cache: sliding layers keep the exact append-time payloads.
    # Baseline = identity press (BasePress), so both runs use the same
    # attention semantics (press runs attend the fresh bf16 current block;
    # pressless quantized prefill attends the payloads).
    from kvpress_tpu.presses.base import BasePress

    _, qplain, _ = runner.prefill(params, ids, press=BasePress(),
                                  dtype=jnp.float32, quantized=True, kv_bits=8)
    _, qpressed, _ = runner.prefill(
        params, ids, press=kp.KnormPress(compression_ratio=0.5),
        dtype=jnp.float32, quantized=True, kv_bits=8,
    )
    for i, sliding in enumerate(cfg.layer_is_sliding):
        if sliding:
            np.testing.assert_array_equal(
                np.asarray(qpressed.keys[i]), np.asarray(qplain.keys[i])
            )
            np.testing.assert_array_equal(
                np.asarray(qpressed.key_scales[i]),
                np.asarray(qplain.key_scales[i]),
            )


@pytest.mark.parametrize("scaling", [
    {"rope_type": "yarn", "factor": 2.0, "original_max_position_embeddings": 64},
    {"rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
    {"rope_type": "linear", "factor": 2.0},
])
def test_rope_scaling_parity(scaling):
    """YaRN / llama3 / linear RoPE scaling vs transformers
    (reference KeyRerotation tests cover default + YaRN, test_key_rerotation_press_rope.py)."""
    import torch
    from transformers import AutoModelForCausalLM, LlamaConfig

    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_scaling=dict(scaling)))
    model.eval()
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = np.random.default_rng(0).integers(1, 256, (1, 96))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    cache = init_cache(cfg, 1, 96, dtype=jnp.float32)
    logits, _, _ = runner.forward(params, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-3, rtol=3e-3)


def test_key_rerotation_under_yarn():
    """KeyRerotation kept-KV parity vs the reference under YaRN scaling."""
    import sys, torch
    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import load_reference, run_reference_press
    from test_press_oracle import _match_sets
    from transformers import AutoModelForCausalLM, LlamaConfig
    from kvpress_tpu.presses import KeyRerotationPress, KnormPress

    ref = load_reference()
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 64}))
    model.eval()
    params, cfg = from_torch_model(model, dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = np.random.default_rng(1).permutation(256)[:96][None]

    ref_kv = run_reference_press(
        model, ref.KeyRerotationPress(press=ref.KnormPress(0.5)), ids
    )
    ours = KeyRerotationPress(press=KnormPress(0.5))
    _, cache, _ = runner.prefill(params, jnp.asarray(ids), press=ours, dtype=jnp.float32)
    _match_sets(ref_kv, cache.keys, cache.values, cache.length, atol=3e-3)


def test_gemma3_multimodal_parity():
    """Gemma3ForConditionalGeneration: vision tower host-side, projected
    features scattered into inputs_embeds — logits must match the HF
    multimodal forward (reference compresses this model via
    base_press.py:191-202; its pipeline feeds HF's merged embeddings)."""
    import torch
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration
    from transformers.models.gemma3 import Gemma3TextConfig
    from transformers.models.siglip import SiglipVisionConfig

    from kvpress_tpu.models.convert import from_torch_multimodal, multimodal_embeds

    torch.manual_seed(0)
    vc = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14, num_channels=3)
    tc = Gemma3TextConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=16,
                          max_position_embeddings=512, pad_token_id=0,
                          sliding_window=8, tie_word_embeddings=False)
    hf_cfg = Gemma3Config(text_config=tc, vision_config=vc,
                          mm_tokens_per_image=4, image_token_index=500,
                          boi_token_index=498, eoi_token_index=499)
    model = Gemma3ForConditionalGeneration(hf_cfg)
    model.eval()

    params, cfg, embed_images = from_torch_multimodal(model, dtype=jnp.float32)
    runner = Runner.create(cfg)

    rng = np.random.default_rng(0)
    T = 16
    ids = rng.integers(1, 498, (1, T))
    ids[0, 3:7] = 500                               # one image: 4 placeholders
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px)
        ).logits.float().numpy()

    feats = embed_images(px)
    assert feats.shape == (1, 4, 64)
    embeds = multimodal_embeds(params, cfg, ids, feats, 500)
    cache = init_cache(cfg, 1, T, dtype=jnp.float32)
    logits, _, _ = runner.forward(
        params, None, cache, inputs_embeds=embeds
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)

    # compression applies through the multimodal prefill path
    from kvpress_tpu import KnormPress

    _, cache2, _ = runner.prefill(
        params, None, press=KnormPress(compression_ratio=0.5),
        dtype=jnp.float32, inputs_embeds=embeds,
    )
    full = [l for i, l in enumerate(np.asarray(cache2.length))
            if cfg.sliding_flags()[i] == 0]
    assert all(l == T // 2 for l in full)
