"""Multimodal (Gemma3) pipeline: the JAX SigLIP vision tower end to end.

VERDICT r2 item 4: the reference compresses Gemma3ForConditionalGeneration
wholly in-framework (kvpress/presses/base_press.py:197-202); round 2 ran the
vision tower host-side in torch. These tests pin (a) feature parity of the
JAX tower vs HF get_image_features, (b) greedy-generation parity through the
pipeline with pixel_values, and (c) that inference is torch-free (torch is
only touched at conversion).

Mask semantics: with token_type_ids, HF Gemma3 lets tokens of the SAME image
attend each other bidirectionally (token_type_ids_mask_function or-mask);
with token_type_ids=None it is plain causal. The runner implements both
regimes on BOTH attention paths: prefill(token_types=...) builds the
or-mask bias on the XLA path, and the flash kernel takes image-group-id
vectors plus the static span bound (image_span=); the pipeline enables it
automatically whenever pixel_values are passed.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp
from transformers import Gemma3Config, Gemma3ForConditionalGeneration
from transformers.models.gemma3 import Gemma3TextConfig
from transformers.models.siglip import SiglipVisionConfig

from kvpress_tpu import KnormPress
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer

IMAGE_TOKEN_ID = 500


class ImageTokenizer(ToyTokenizer):
    """ToyTokenizer that maps the literal word ``<image>`` to the Gemma3
    placeholder id (the HF processor expands each image to
    mm_tokens_per_image copies of it)."""

    def _tok2id(self, tok):
        if tok == "<image>":
            return IMAGE_TOKEN_ID
        return super()._tok2id(tok)


def _tiny_model():
    torch.manual_seed(0)
    vc = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14, num_channels=3)
    tc = Gemma3TextConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=16,
                          max_position_embeddings=512, pad_token_id=0,
                          bos_token_id=1, eos_token_id=2,   # == ToyTokenizer
                          sliding_window=8, tie_word_embeddings=False)
    hf_cfg = Gemma3Config(text_config=tc, vision_config=vc,
                          mm_tokens_per_image=4, image_token_index=IMAGE_TOKEN_ID,
                          boi_token_index=498, eoi_token_index=499)
    model = Gemma3ForConditionalGeneration(hf_cfg)
    model.eval()
    return model


def test_vision_tower_feature_parity():
    """encode_images (pure JAX) == HF get_image_features."""
    from kvpress_tpu.models.convert import from_torch_multimodal

    model = _tiny_model()
    _, _, embed_images = from_torch_multimodal(model, dtype=jnp.float32)
    px = np.random.default_rng(0).standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(torch.tensor(px)).numpy()
    got = np.asarray(embed_images(px))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_multimodal_pipeline_generation_parity():
    """pipe(context, pixel_values=...) greedy tokens == HF generate, and the
    compressed path still answers; inference never touches torch."""
    model = _tiny_model()
    tok = ImageTokenizer(vocab_size=498)   # hash ids stay below the specials
    pipe = KVPressPipeline.from_torch_multimodal(model, tok)
    assert pipe.image_token_id == IMAGE_TOKEN_ID

    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    words = " ".join(f"w{i}" for i in range(12))
    context = f"{words} <image> <image> <image> <image> tail0 tail1"
    question = "q0 q1"

    # HF greedy reference over the exact ids the pipeline feeds the model.
    # token_type_ids mark the image span: the pipeline (XLA path — CPU here)
    # applies the same bidirectional image-span or-mask HF's processor
    # enables, so the reference arm must enable it too.
    ctx_ids, q_idss = pipe.preprocess(context, [question])
    ids = torch.tensor([list(ctx_ids) + list(q_idss[0])])
    tt = (ids == IMAGE_TOKEN_ID).long()
    with torch.no_grad():
        gen = model.generate(input_ids=ids, pixel_values=torch.tensor(px),
                             token_type_ids=tt,
                             max_new_tokens=6, do_sample=False)
    ref_tokens = gen[0, ids.shape[1]:].tolist()

    # Torch must be idle during inference: poison the entry points the old
    # host-side path used.
    def _boom(*a, **k):
        raise AssertionError("torch called during inference")

    saved = (torch.as_tensor, torch.tensor)
    torch.as_tensor = torch.tensor = _boom
    try:
        out = pipe(context, question=question, pixel_values=px,
                   max_new_tokens=6)
    finally:
        torch.as_tensor, torch.tensor = saved
    assert out["answer"] == tok.decode(ref_tokens, skip_special_tokens=True)

    # Compression composes with the multimodal prefill (image rows count as
    # ordinary KV slots for the press).
    out2 = pipe(context, question=question, pixel_values=px,
                press=KnormPress(compression_ratio=0.25), max_new_tokens=4)
    assert isinstance(out2["answer"], str)


def test_bidirectional_image_span_logit_parity():
    """runner.prefill(token_types=...) == HF forward WITH token_type_ids —
    image tokens of the same image attend each other bidirectionally
    (modeling_gemma3.py token_type_ids_mask_function). Two images pin the
    group separation (image A must NOT attend image B's future tokens)."""
    from kvpress_tpu import Runner
    from kvpress_tpu.models.convert import from_torch_multimodal, multimodal_embeds

    model = _tiny_model()
    params, cfg, embed_images = from_torch_multimodal(model, dtype=jnp.float32)
    runner = Runner.create(cfg)

    rng = np.random.default_rng(2)
    T = 20
    ids = rng.integers(1, 498, (1, T))
    ids[0, 3:7] = IMAGE_TOKEN_ID                  # image A
    ids[0, 10:14] = IMAGE_TOKEN_ID                # image B
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    tt = (ids == IMAGE_TOKEN_ID).astype(np.int64)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
            token_type_ids=torch.tensor(tt),
        ).logits.float().numpy()
        ref_causal = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
        ).logits.float().numpy()
    # sanity: the or-mask must actually change something at the image span
    assert np.abs(ref - ref_causal).max() > 1e-4

    feats = np.asarray(embed_images(px))
    embeds = multimodal_embeds(params, cfg, ids, feats, IMAGE_TOKEN_ID)
    logits, _, _ = runner.prefill(
        params, None, inputs_embeds=embeds, dtype=jnp.float32,
        compute_logits=True, token_types=jnp.asarray(tt),
    )
    np.testing.assert_allclose(np.asarray(logits)[:, -1], ref[:, -1],
                               atol=2e-3, rtol=2e-3)


def test_chunked_prefill_image_span_parity():
    """prefill_chunked with token_types == one-shot prefill with
    token_types (VERDICT r3 item 8: multimodal through the long-context
    mechanism). The chunk size deliberately SPLITS image B's span so the
    boundary-adjustment (shift back to the span start — early span tokens
    must see the whole span, which would not exist yet across a split) is
    exercised, and a press composes on top."""
    from kvpress_tpu import Runner
    from kvpress_tpu.models.convert import from_torch_multimodal, multimodal_embeds

    model = _tiny_model()
    params, cfg, embed_images = from_torch_multimodal(model, dtype=jnp.float32)
    runner = Runner.create(cfg)

    rng = np.random.default_rng(5)
    T = 24
    ids = rng.integers(1, 498, (1, T))
    ids[0, 3:7] = IMAGE_TOKEN_ID                  # image A (chunk 1)
    ids[0, 10:14] = IMAGE_TOKEN_ID                # image B straddles 8|16? no:
    # chunk=8 boundaries at 8, 16 — span [10,14) inside chunk 2; make a span
    # that straddles 16: [14, 18)
    ids[0, 14:18] = IMAGE_TOKEN_ID
    px = rng.standard_normal((3, 3, 28, 28)).astype(np.float32)
    tt = jnp.asarray((ids == IMAGE_TOKEN_ID).astype(np.int64))

    feats = np.asarray(embed_images(px))
    embeds = multimodal_embeds(params, cfg, ids, feats, IMAGE_TOKEN_ID)
    l_one, c_one, _ = runner.prefill(
        params, None, inputs_embeds=embeds, dtype=jnp.float32,
        compute_logits=True, token_types=tt,
    )
    l_chunk, c_chunk, _ = runner.prefill_chunked(
        params, jnp.asarray(ids), chunk_size=8, dtype=jnp.float32,
        compute_logits=True, inputs_embeds=embeds, token_types=tt,
        image_span=4,
    )
    np.testing.assert_allclose(np.asarray(l_chunk)[:, -1],
                               np.asarray(l_one)[:, -1],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c_chunk.keys),
                               np.asarray(c_one.keys), atol=1e-4, rtol=1e-4)

    # sanity: dropping token_types changes the logits (the or-mask matters)
    l_causal, _, _ = runner.prefill_chunked(
        params, jnp.asarray(ids), chunk_size=8, dtype=jnp.float32,
        compute_logits=True, inputs_embeds=embeds,
    )
    assert np.abs(np.asarray(l_causal) - np.asarray(l_one))[:, -1].max() > 1e-5

    # a scorer press composes with the multimodal chunked path (this tiny
    # Gemma3's layers are ALL sliding-window layers, which presses never
    # compress — so the right check is equality with the one-shot press
    # path, not a length drop)
    from kvpress_tpu import KnormPress as _K

    _, c_press, _ = runner.prefill_chunked(
        params, jnp.asarray(ids), chunk_size=8, dtype=jnp.float32,
        press=_K(0.25), inputs_embeds=embeds, token_types=tt, image_span=4,
    )
    _, c_press_one, _ = runner.prefill(
        params, None, inputs_embeds=embeds, dtype=jnp.float32,
        press=_K(0.25), token_types=tt,
    )
    np.testing.assert_array_equal(np.asarray(c_press.length),
                                  np.asarray(c_press_one.length))


def test_serving_multimodal_admission():
    """pipe.batch(pixel_values=...) — multimodal requests through the
    continuous-batching engine (precomputed embeds + token_types per
    Request, image-span or-mask in admission prefill) match the
    single-request pipeline, mixed with a text-only request."""
    model = _tiny_model()
    tok = ImageTokenizer(vocab_size=498)
    pipe = KVPressPipeline.from_torch_multimodal(model, tok)

    rng = np.random.default_rng(3)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    words = " ".join(f"w{i}" for i in range(10))
    mm_ctx = f"{words} <image> <image> <image> <image> tail0 tail1"
    txt_ctx = " ".join(f"t{i}" for i in range(18))
    press = KnormPress(compression_ratio=0.25)

    singles = [
        pipe(mm_ctx, question="q0 q1", pixel_values=px, press=press,
             max_new_tokens=5)["answer"],
        pipe(txt_ctx, question="q0 q1", press=press,
             max_new_tokens=5)["answer"],
    ]
    batched = pipe.batch(
        [mm_ctx, txt_ctx], questions=["q0 q1", "q0 q1"], press=press,
        max_new_tokens=5, n_slots=2, pixel_values=[px, None],
    )
    assert batched == singles

    # chunked multimodal admission agrees too
    chunked = pipe.batch(
        [mm_ctx, txt_ctx], questions=["q0 q1", "q0 q1"], press=press,
        max_new_tokens=5, n_slots=2, pixel_values=[px, None],
        context_chunk=8,
    )
    assert chunked == singles


def test_observed_press_keeps_image_span_on_flash_runner():
    """A wants_probs press (ObservedAttention) routes prefill to the dense
    fallback even on a flash runner — that path must still apply the
    image-span or-mask. Regression: the or-mask was only built for
    attn_impl='xla', so flash+Observed silently dropped token_types
    (flash-with-tt was bit-identical to flash-without-tt)."""
    from kvpress_tpu import Runner, init_params, tiny_config
    from kvpress_tpu.presses import ObservedAttentionPress

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    flash = Runner.create(cfg, attn_impl="flash")
    xla = Runner.create(cfg, attn_impl="xla")
    press = ObservedAttentionPress(compression_ratio=0.5)

    rng = np.random.default_rng(4)
    T = 24
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, T)))
    tt = np.zeros((1, T), np.int64)
    tt[0, 3:7] = 1
    tt[0, 12:16] = 1
    tt = jnp.asarray(tt)

    kw = dict(dtype=jnp.float32, compute_logits=True, press=press)
    lf, cf, _ = flash.prefill(params, ids, token_types=tt, image_span=4, **kw)
    lx, cx, _ = xla.prefill(params, ids, token_types=tt, **kw)
    lplain, _, _ = flash.prefill(params, ids, **kw)

    np.testing.assert_allclose(np.asarray(lf)[:, -1], np.asarray(lx)[:, -1],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(cf.length), np.asarray(cx.length))
    assert np.abs(np.asarray(lf)[:, -1] - np.asarray(lplain)[:, -1]).max() > 1e-5


def test_multimodal_serving_lru_reuse():
    """Repeated image admissions share the context LRU keyed on
    (context_ids, image fingerprint): the second identical (ctx, px)
    request hits (ctx_hits>0) and answers identically, while the same ids
    with DIFFERENT pixels miss (no collision)."""
    model = _tiny_model()
    tok = ImageTokenizer(vocab_size=498)
    pipe = KVPressPipeline.from_torch_multimodal(model, tok)

    rng = np.random.default_rng(5)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    px2 = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    words = " ".join(f"w{i}" for i in range(10))
    mm_ctx = f"{words} <image> <image> <image> <image> tail0 tail1"
    press = KnormPress(compression_ratio=0.25)

    singles = pipe.batch(
        [mm_ctx, mm_ctx], questions=["q0 q1", "q2 q3"], press=press,
        max_new_tokens=5, n_slots=1, pixel_values=[px, px],
    )

    from kvpress_tpu.serving import ServingEngine
    import kvpress_tpu.serving as serving_mod

    hits = {}
    orig_run = ServingEngine.run

    def spy_run(self, reqs, **kw):
        out = orig_run(self, reqs, **kw)
        hits["ctx_hits"] = self.ctx_hits
        hits["n_lru"] = len(self._ctx_lru)
        return out

    serving_mod.ServingEngine.run = spy_run
    try:
        cached = pipe.batch(
            [mm_ctx, mm_ctx], questions=["q0 q1", "q2 q3"], press=press,
            max_new_tokens=5, n_slots=1, pixel_values=[px, px],
            context_cache=2,
        )
        assert hits["ctx_hits"] == 1          # second identical image hit
        assert cached == singles
        pipe.batch(
            [mm_ctx, mm_ctx], questions=["q0 q1", "q0 q1"], press=press,
            max_new_tokens=5, n_slots=1, pixel_values=[px, px2],
            context_cache=2,
        )
        assert hits["ctx_hits"] == 0          # different pixels: no hit
        assert hits["n_lru"] == 2             # two distinct entries
    finally:
        serving_mod.ServingEngine.run = orig_run


def test_kvzip_multimodal_parity_and_smoke():
    """Multi-pass x pixel_values (the exclusion lifted): (1) plumbing parity
    — on a TEXT context, running KVzip through the inputs_embeds path must
    reproduce the ids path exactly (the repeat chunks re-feed captured
    embeddings; for text they equal the token embeddings); (2) a real image
    context compresses through KVzip end-to-end and still answers."""
    import kvpress_tpu as kp
    from kvpress_tpu.presses import KVzipPress
    from kvpress_tpu.models.llama import embed_tokens

    # (1) parity on a text context with a plain tiny model
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer

    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    pipe_txt = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    press = KVzipPress(compression_ratio=0.5, chunk_size=24)
    ctx_ids, _ = pipe_txt.preprocess(" ".join(f"w{i}" for i in range(60)), [""])
    ids = jnp.asarray(np.asarray(ctx_ids, np.int32))[None]
    _, cache_a, _ = runner.prefill(params, ids, dtype=jnp.float32,
                                   max_size=len(ctx_ids) + 64)
    _, cache_b, _ = runner.prefill(params, ids, dtype=jnp.float32,
                                   max_size=len(ctx_ids) + 64)
    c_ids = pipe_txt._run_kvzip(cache_a, ctx_ids, press, 8)
    c_emb = pipe_txt._run_kvzip(
        cache_b, ctx_ids, press, 8,
        context_embeds=embed_tokens(params, ids, cfg),
    )
    np.testing.assert_array_equal(np.asarray(c_ids.mask),
                                  np.asarray(c_emb.mask))
    assert 0.3 < (~np.asarray(c_ids.mask[..., :len(ctx_ids)])).mean() < 0.7

    # (2) image context end-to-end through the pipeline + serving
    model = _tiny_model()
    tok = ImageTokenizer(vocab_size=498)
    pipe = KVPressPipeline.from_torch_multimodal(model, tok)
    rng = np.random.default_rng(6)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    words = " ".join(f"w{i}" for i in range(24))
    mm_ctx = f"{words} <image> <image> <image> <image> tail0 tail1"
    zpress = KVzipPress(compression_ratio=0.4, chunk_size=16)
    out = pipe(mm_ctx, question="q0 q1", pixel_values=px, press=zpress,
               max_new_tokens=5)
    assert isinstance(out["answer"], str)
    served = pipe.batch([mm_ctx], questions=["q0 q1"], press=zpress,
                        max_new_tokens=5, n_slots=1, pixel_values=[px])
    assert served == [out["answer"]]
