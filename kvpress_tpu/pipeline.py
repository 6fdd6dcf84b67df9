"""Text-generation pipeline: compress a long context once, answer many
questions against the compressed cache.

Mirrors the reference ``KVPressTextGenerationPipeline`` UX
(kvpress/pipeline.py:25-331): chat-template separator split, prefill without
the LM head, per-question greedy decode with position_ids continuing from the
*uncompressed* context length, and answer rollback between questions. The
rollback, which the reference implements by physically slicing cache tensors
(pipeline.py:252-265), is free here: a cache is a value, so "rollback" is
restoring the pre-question ``length``/``offset`` scalars.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cache import KVCache, resize
from .models.llama import Runner, param_dtype as param_dtype_of
from .presses.base import BasePress

logger = logging.getLogger(__name__)


def _sample_token(logits: jax.Array, key, temperature: float, top_p: float):
    """Nucleus sampling of one token from (V,) logits."""
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature)
    order = jnp.argsort(-probs)
    sorted_probs = probs[order]
    cum = jnp.cumsum(sorted_probs)
    keep = cum - sorted_probs < top_p        # always keep the top token
    filtered = jnp.where(keep, sorted_probs, 0.0)
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(filtered, 1e-38)))
    return order[idx].astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "runner", "max_new_tokens", "eos_ids", "press",
        "do_sample", "temperature", "top_p",
    ),
)
def _generate_answer(
    params,
    question_ids: jax.Array,          # (1, Tq); Tq may be 0
    cache: KVCache,
    prefill_logits,
    press_state=None,
    rng_key=None,
    *,
    runner: Runner,
    max_new_tokens: int,
    eos_ids: tuple[int, ...],
    press=None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
):
    """Question forward + greedy while_loop decode, with optional decode-time
    compression (press.compresses_decode) threaded through the loop. Returns
    (tokens (max_new,), n_generated, final cache). An empty question (shape
    (1, 0)) starts greedy decoding straight from the prefill's logits.

    MUST be jitted with ``params`` as an argument: unjitted, the
    ``lax.while_loop`` bakes the weights into the traced computation as HLO
    constants — on the axon backend the remote-compile POST of a 1B-model
    constant silently hangs at ~0 CPU (CLAUDE.md), and on any backend it
    bloats the executable."""
    decode_press = press if (press is not None and press.compresses_decode) else None
    if question_ids.shape[1] > 0:
        logits, cache, press_state = runner.forward(
            params, question_ids, cache, logits_last_only=True,
            press=decode_press, press_state=press_state, phase="decode",
        )
    else:
        logits = prefill_logits
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def pick(logits_row, key):
        if do_sample:
            return _sample_token(logits_row, key, temperature, top_p)
        return jnp.argmax(logits_row).astype(jnp.int32)

    rng_key, sub = jax.random.split(rng_key)
    first = pick(logits[0, -1], sub)
    eos = jnp.asarray(eos_ids, jnp.int32)
    out = jnp.zeros((max_new_tokens,), jnp.int32).at[0].set(first)

    def cond(state):
        i, tok, _, _, _, _ = state
        return (i < max_new_tokens) & ~jnp.isin(tok, eos)

    def body(state):
        i, tok, cache, out, pstate, key = state
        logits, cache, pstate = runner.forward(
            params, tok[None, None], cache, logits_last_only=True,
            press=decode_press, press_state=pstate, phase="decode",
        )
        key, sub = jax.random.split(key)
        nxt = pick(logits[0, -1], sub)
        out = out.at[i].set(nxt)
        return i + 1, nxt, cache, out, pstate, key

    n, _, cache, out, _, _ = jax.lax.while_loop(
        cond, body, (1, first, cache, out, press_state, rng_key)
    )
    return out, n, cache


@partial(jax.jit, static_argnames=("runner", "press", "quantized", "kv_bits",
                                   "image_span"))
def _prefill(params, context_ids, valid_len=None, inputs_embeds=None,
             token_types=None, *,
             runner: Runner, press, quantized: bool = False, kv_bits: int = 8,
             image_span=None):
    # Prefill; press is static (part of the trace). Last-position logits are
    # kept so empty-question generation can continue the context. valid_len
    # (traced) enables bucketed prefill: one compile per bucket instead of
    # one per context length. inputs_embeds (multimodal) overrides the token
    # embedding.
    from .models.llama import param_dtype

    return runner.prefill(
        params, context_ids, press=press, compute_logits=True,
        dtype=param_dtype(params), valid_len=valid_len,
        quantized=quantized, kv_bits=kv_bits, inputs_embeds=inputs_embeds,
        token_types=token_types, image_span=image_span,
    )


@partial(jax.jit, static_argnames=("runner", "press"))
def _scored_forward(params, ids, cache, press_state, embeds=None, *,
                    runner: Runner, press):
    """One repeat-chunk forward with a scorer press (KVzip multi-pass).
    ``embeds`` overrides the token embedding (multimodal repeat content —
    vision features must re-feed as features, not placeholder ids)."""
    return runner.forward(
        params, ids, cache, press=press, press_state=press_state,
        phase="decode", compute_logits=False, inputs_embeds=embeds,
    )


@partial(jax.jit, donate_argnums=(0,))
def _kvcompose_rebuild_layer(cache: KVCache, keep_l, l_idx):
    """One layer of the KVCompose structured rebuild, in place on the
    donated cache: kept entries gather to the buffer front in position
    order (the _compress_layer pattern — peak extra memory is one layer's
    gather, not a second full payload copy). ``l_idx`` is traced — one
    compile for all layers."""
    order = jnp.argsort(jnp.where(keep_l, 0, 1), axis=-1, stable=True)
    at = (l_idx, 0, 0, 0, 0)

    def reorder(buf):
        g = jnp.take_along_axis(buf[l_idx], order[..., None], axis=2)
        return jax.lax.dynamic_update_slice(buf, g[None], at)

    updates = dict(keys=reorder(cache.keys), values=reorder(cache.values))
    if cache.key_scales is not None:
        updates["key_scales"] = reorder(cache.key_scales)
        updates["value_scales"] = reorder(cache.value_scales)
    return dataclasses.replace(cache, **updates)


def _chat_affixes(tok) -> tuple[int, list[int]]:
    """(prefix_len, suffix_ids) of the chat template around a user message —
    probed with a dummy separator (reference kvzip_press.py:96-117).
    Memoized on the tokenizer object, keyed by the template text so a
    chat_template assigned after the first call invalidates the cache: the
    presize bound and the repeat loop both need the affixes, and the
    template probe sits on the serving admission path the engine otherwise
    keeps sync-free."""
    cached = getattr(tok, "_kvpress_chat_affixes", None)
    if cached is not None and cached[0] == tok.chat_template:
        return cached[1]
    if tok.chat_template is None:
        out = (0, tok.encode("\n", add_special_tokens=False))
    else:
        dummy = "dummy context"
        separator = "\n" + "#" * len(dummy)
        templated = tok.apply_chat_template(
            [{"role": "user", "content": dummy + separator}],
            add_generation_prompt=True, tokenize=False, enable_thinking=False,
        )
        ctx_part, suffix_text = templated.split(separator)
        prefix_text = ctx_part.split(dummy)[0]
        prefix_len = len(tok.encode(prefix_text, add_special_tokens=False))
        out = (prefix_len, tok.encode(suffix_text, add_special_tokens=False))
    try:
        tok._kvpress_chat_affixes = (tok.chat_template, out)
    except (AttributeError, TypeError):
        pass                              # slot-restricted tokenizer objects
    return out


def kvzip_repeat_bound(press, context_ids, tokenizer) -> int:
    """EXACT repeat-pass headroom for a KVzip-family press on this context:
    the longest actual repeat prompt (probed through the tokenizer, so a
    chat template with long affixes can't overflow the presized buffer into
    the two-full-caches ``grow`` fallback) plus RestoreKV's restore tokens.
    Falls back to the press's static ``repeat_room()`` budget without a
    tokenizer."""
    if tokenizer is None or press.compression_ratio <= 0:
        return press.repeat_room()
    prefix_len, suffix_ids = _chat_affixes(tokenizer)
    pairs = press.chunk_pairs(
        list(context_ids), prefix_len, suffix_ids, tokenizer
    )
    room = max((len(r) for _, r in pairs), default=0)
    return room + getattr(press, "num_restore_tokens", 0)


@dataclasses.dataclass
class KVPressPipeline:
    """Callable: pipe(context, question=…, press=…) → {"answer": str}.

    tokenizer: a HF ``AutoTokenizer`` (used host-side only).
    """

    runner: Runner
    params: dict
    tokenizer: object
    eos_token_ids: Optional[tuple[int, ...]] = None
    # Multimodal (Gemma3): JAX vision tower params/config (models/siglip.py)
    # and the placeholder token id images expand to. When set, __call__
    # accepts pixel_values and the context must contain mm_tokens_per_image
    # placeholder tokens per image (the HF processor contract).
    vision_params: Optional[dict] = None
    vision_cfg: Optional[object] = None
    image_token_id: Optional[int] = None

    @staticmethod
    def from_pretrained(path_or_repo: str, dtype=jnp.bfloat16) -> "KVPressPipeline":
        from transformers import AutoTokenizer
        from .models.convert import load_pretrained

        params, cfg = load_pretrained(path_or_repo, dtype=dtype)
        tok = AutoTokenizer.from_pretrained(path_or_repo)
        return KVPressPipeline(Runner.create(cfg), params, tok)

    @staticmethod
    def from_torch_multimodal(model, tokenizer, dtype=jnp.float32,
                              attn_impl: str = "auto"):
        """Multimodal pipeline from a live ``Gemma3ForConditionalGeneration``.

        Torch is used at conversion only; inference (vision tower included)
        runs as JAX (reference compresses this model family in-framework,
        base_press.py:197-202). Bidirectional image-span attention (HF
        token_type_ids semantics) works on BOTH attention paths: the XLA
        path builds an or-mask bias, the flash kernel takes image-group-id
        vectors and extends its block skips by the static span bound."""
        from .models.convert import from_torch_multimodal

        params, cfg, embed_images = from_torch_multimodal(model, dtype=dtype)
        return KVPressPipeline(
            Runner.create(cfg, attn_impl=attn_impl), params, tokenizer,
            vision_params=embed_images.vparams,
            vision_cfg=embed_images.vcfg,
            image_token_id=model.config.image_token_index,
        )

    def _eos(self) -> tuple[int, ...]:
        if self.eos_token_ids is not None:
            return tuple(self.eos_token_ids)
        eos = self.tokenizer.eos_token_id
        if eos is None:
            return (-1,)
        return tuple(eos) if isinstance(eos, (list, tuple)) else (int(eos),)

    def preprocess(
        self,
        context: str,
        questions: list[str],
        answer_prefix: str = "",
        max_context_length: Optional[int] = None,
        enable_thinking: bool = False,
    ):
        tok = self.tokenizer
        if tok.chat_template is None:
            bos = getattr(tok, "bos_token", "") or ""
            context = bos + context
            question_suffix = "\n"
        else:
            separator = "#" * (len(context) + 10)
            templated = tok.apply_chat_template(
                [{"role": "user", "content": context + separator}],
                add_generation_prompt=True,
                tokenize=False,
                enable_thinking=enable_thinking,
            )
            context, question_suffix = templated.split(separator)
        questions = [q + question_suffix + answer_prefix for q in questions]
        context_ids = tok.encode(context, add_special_tokens=False)
        if max_context_length is not None and len(context_ids) > max_context_length:
            logger.warning(
                "Context length has been truncated from %d to %d tokens.",
                len(context_ids), max_context_length,
            )
            context_ids = context_ids[:max_context_length]
        question_ids = [tok.encode(q, add_special_tokens=False) for q in questions]
        return context_ids, question_ids

    def __call__(
        self,
        context: str,
        question: Optional[str] = None,
        questions: Optional[list[str]] = None,
        press: Optional[BasePress] = None,
        max_new_tokens: int = 50,
        answer_prefix: str = "",
        max_context_length: Optional[int] = None,
        enable_thinking: bool = False,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
        context_bucket: Optional[int] = None,
        context_chunk: Optional[int] = None,  # bounded-activation chunked prefill
        quantized: bool = False,     # int KV cache (reference: cache=QuantizedCache())
        kv_bits: int = 8,            # 8 (int8) or 4 (packed nibbles)
        pixel_values=None,           # (n_images, C, I, I) for multimodal models
    ) -> dict:
        assert question is None or questions is None, (
            "Either question or questions should be provided, not both."
        )
        if pixel_values is not None:
            assert self.vision_params is not None, (
                "pixel_values requires a multimodal pipeline "
                "(KVPressPipeline.from_torch_multimodal)."
            )
            assert context_bucket is None, (
                "multimodal prefill does not compose with context_bucket "
                "(bucket pads break the image-span or-mask)"
            )
        single = questions is None
        questions = questions or ([question] if question else [""])
        if press is not None and press.compresses_decode and len(questions) > 1:
            raise ValueError(
                "DecodingPress is not compatible with multiple questions. "
                "Please specify a single question."
            )

        context_ids, question_ids = self.preprocess(
            context, questions, answer_prefix, max_context_length, enable_thinking
        )

        # FinchPress: locate the delimiter host-side, strip it, and bake the
        # dynamic window size into the press (reference does this inside an
        # embedding forward hook, finch_press.py:123-137).
        if (
            press is not None
            and hasattr(press, "with_window")
            and getattr(press, "delimiter_token_id", None) is not None
        ):
            did = press.delimiter_token_id
            assert context_ids.count(did) == 1, (
                "Exactly one delimiter token should be present."
            )
            pos = context_ids.index(did)
            window = len(context_ids) - 1 - pos
            assert window > 0, "No window detected (window size must be > 0)."
            context_ids = context_ids[:pos] + context_ids[pos + 1 :]
            press = press.with_window(window)

        context_length = len(context_ids)
        valid_len = None
        if context_bucket is not None:
            # Bucketed prefill: bounded compile count across context lengths.
            assert press is None or not (
                getattr(press, "multi_pass", False)
                or getattr(press, "post_mask", False)
            ), "context_bucket is not supported for multi-pass presses"
            pad_to = -(-context_length // context_bucket) * context_bucket
            context_ids = list(context_ids) + [0] * (pad_to - context_length)
            valid_len = jnp.asarray(context_length, jnp.int32)
        ids = jnp.asarray(np.asarray(context_ids, np.int32))[None]

        embeds = None
        token_types = None
        if pixel_values is not None:
            from .models.convert import multimodal_embeds
            from .models.siglip import encode_images

            feats = encode_images(self.vision_params, pixel_values,
                                  vcfg=self.vision_cfg)
            embeds = multimodal_embeds(
                self.params, self.runner.cfg, ids, feats, self.image_token_id
            )
            # Bidirectional image-span attention (the HF processor passes
            # token_type_ids): supported on BOTH attention paths — the XLA
            # path builds an or-mask bias; the flash kernel takes group-id
            # vectors and extends its causal block skip by the static span.
            token_types = (ids == self.image_token_id).astype(jnp.int32)
        if context_chunk is not None:
            # Bounded-activation prefill (8B@128K-class contexts on one
            # chip). Composes with ScorerPress compression (final-chunk
            # dynamic scoring), scorer-like and chunked-composable wrappers
            # (AdaKV family, CriticalKV, KeyRerotation, Chunk, Composed,
            # PerLayerCompression — presses/wrappers.py chunked_compress),
            # multimodal embeds + image-span attention, and the quantized
            # cache; not with bucketing (pad semantics) — that needs the
            # one-shot path.
            assert context_bucket is None, (
                "context_chunk does not compose with context_bucket"
            )
            # Multi-pass presses: presize for the repeat passes — growing
            # a 128K cache afterwards holds two full caches (measured OOM
            # at 8B/128K int4 next to the weights). KVzip's bound is exact
            # (the actual repeat prompts probed through the tokenizer);
            # KVCompose re-feeds the whole context (~2x context KV, the
            # reference's own overhead, kvcompose_press.py:377-379).
            mp = getattr(press, "multi_pass", None) if press is not None \
                else None
            extra = 0
            if mp is True:
                extra = kvzip_repeat_bound(press, context_ids, self.tokenizer)
            elif mp == "kvcompose" and press.compression_ratio > 0:
                extra = len(context_ids)
            prefill_logits, cache, press_state = self.runner.prefill_chunked(
                self.params, ids, press=press, chunk_size=context_chunk,
                dtype=param_dtype_of(self.params), compute_logits=True,
                quantized=quantized, kv_bits=kv_bits,
                max_size=ids.shape[1] + extra if extra else None,
                inputs_embeds=embeds, token_types=token_types,
                image_span=(self.vision_cfg.mm_tokens_per_image
                            if token_types is not None else None),
            )
        else:
            prefill_logits, cache, press_state = _prefill(
                self.params, ids, valid_len, embeds, token_types,
                runner=self.runner,
                press=press, quantized=quantized, kv_bits=kv_bits,
                image_span=(self.vision_cfg.mm_tokens_per_image
                            if token_types is not None else None),
            )
        logger.debug("Context Length: %d", context_length)
        logger.debug("Compressed Context Length: %d", int(jnp.max(cache.length)))

        # Key-rerotation presses renumber kept keys to contiguous positions, so
        # subsequent tokens continue from the *compressed* length (reference
        # pipeline.py:239-241).
        if press is not None and getattr(press, "rerotates", False):
            cache = dataclasses.replace(cache, offset=jnp.max(cache.length))

        # Multi-pass presses (KVzip): score by chunked context reconstruction
        # against the uncompressed cache, then mask (reference kvzip_press.py
        # __call__ / _perform_kvzip_compression).
        if press is not None and getattr(press, "multi_pass", False):
            if getattr(press, "multi_pass", None) == "kvcompose":
                cache = self._run_kvcompose(cache, context_ids, press,
                                            context_chunk=context_chunk,
                                            context_embeds=embeds)
            else:
                cache = self._run_kvzip(cache, context_ids, press,
                                        max_new_tokens, context_embeds=embeds)

        # Post-mask presses (FastKVzip): cross-layer bottom-k over the scores
        # the press collected during prefill (reference compress_post).
        if press is not None and getattr(press, "post_mask", False):
            cache = press.apply_post_mask(cache, press_state)

        # Head-wise compaction of mask-based evictions (KVzip / FastKVzip /
        # DMS compact=True, via the declarative press.host_compact flag):
        # kept entries to each head's buffer front, length dropped to the
        # max per-head count — the resize below then realizes the HBM
        # saving (decode reads/copies the small buffer; at 8B@128K the full
        # masked buffer cannot decode at all). AdaKV-family wrappers
        # compact inside their own compress (host_compact stays False).
        if press is not None and getattr(press, "host_compact", False):
            from .cache import compact_masked

            cache = compact_masked(cache)

        # Re-bucket the cache to realize compression memory savings, with room
        # for the longest question + generation. The host reads the actual
        # post-compression length so head-compacting presses (AdaKV
        # compact=True) shrink below their static bound.
        kept = (
            press.max_kept(context_length, self.runner.cfg)
            if press is not None else context_length
        )
        if self.runner.cfg.sliding_window is not None:
            # Sliding-window (local) layers are never compressed — they keep
            # the FULL context, so the shrink bound must not cut below it.
            kept = context_length
        kept = min(kept, int(jnp.max(cache.length)))
        max_q = max((len(q) for q in question_ids), default=0)
        # resize, not shrink: pressless / lightly-compressed requests
        # need the buffer GROWN for question + generation appends —
        # shrink silently no-ops on enlarge and the decode append would
        # clamp into (and corrupt) the final slots.
        cache = resize(cache, kept + max_q + max_new_tokens + 1)

        base_length = cache.length
        base_offset = cache.offset
        answers = []
        for qi, q_ids in enumerate(question_ids):
            q = jnp.asarray(np.asarray(q_ids, np.int32))[None]
            tokens, n, _ = _generate_answer(
                self.params, q, cache, prefill_logits, press_state,
                jax.random.fold_in(jax.random.PRNGKey(seed), qi),
                runner=self.runner, max_new_tokens=max_new_tokens,
                eos_ids=self._eos(), press=press,
                do_sample=do_sample, temperature=temperature, top_p=top_p,
            )
            tokens = np.asarray(tokens)[: int(n)]
            # Strip eos for decoding (skip_special_tokens equivalent).
            answers.append(
                self.tokenizer.decode(tokens.tolist(), skip_special_tokens=True)
            )
            # Rollback: restore pre-question lengths; stale slots are garbage
            # beyond `length` and will be overwritten by the next append.
            cache = dataclasses.replace(
                cache, length=base_length, offset=base_offset
            )

        if single:
            return {"answer": answers[0]}
        return {"answers": answers}

    def batch(
        self,
        contexts: list[str],
        questions: Optional[list[Optional[str]]] = None,
        press: Optional[BasePress] = None,
        max_new_tokens: int = 50,
        answer_prefix: str = "",
        max_context_length: Optional[int] = None,
        enable_thinking: bool = False,
        n_slots: int = 8,
        capacity: Optional[int] = None,
        quantized: bool = False,
        kv_bits: int = 8,
        context_bucket: Optional[int] = None,
        context_chunk: Optional[int] = None,  # chunked-prefill admission
        interleave: bool = False,        # chunk-interleaved admission
        question_bucket: int = 64,
        mesh=None,                       # tensor-parallel serving
        context_cache: int = 0,          # compressed-context LRU reuse
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
        pixel_values: Optional[list] = None,   # per-request images (or None)
        on_token=None,       # streaming: (req_idx, token_id, n_so_far) as
                             # tokens drain (ServingEngine.run contract)
    ) -> list[str]:
        """Serve many (context, question) requests through the continuous-
        batching engine (serving.py): per-request press-compressed prefill,
        one fixed-shape jitted decode step over ``n_slots`` slots, admission
        as slots retire. Per-request semantics are the single ``__call__``
        contract (greedy, or nucleus sampling via ``do_sample``; requests
        sharing a context can reuse one compressed cache via
        ``context_cache``); the reference pipeline has no batched
        surface at all (kvpress/pipeline.py is batch-1 — on TPU the decode
        step is weight-HBM-bound at small batch, so batching is the main
        throughput lever).

        ``capacity`` (per-slot KV budget) defaults to compressed longest
        context + bucketed question + generation room.
        """
        from .serving import Request, ServingEngine

        if questions is None:
            questions = [None] * len(contexts)
        assert len(questions) == len(contexts)
        if pixel_values is None:
            pixel_values = [None] * len(contexts)
        assert len(pixel_values) == len(contexts)
        image_span = None
        reqs = []
        for ctx, q, px in zip(contexts, questions, pixel_values):
            context_ids, q_ids = self.preprocess(
                ctx, [q] if q else [""], answer_prefix, max_context_length,
                enable_thinking,
            )
            embeds = token_types = content_key = None
            if px is not None:
                assert self.vision_params is not None, (
                    "pixel_values requires a multimodal pipeline"
                )
                import hashlib

                from .models.convert import multimodal_embeds
                from .models.siglip import encode_images

                ids_arr = jnp.asarray(
                    np.asarray(context_ids, np.int32))[None]
                feats = encode_images(self.vision_params, px,
                                      vcfg=self.vision_cfg)
                embeds = multimodal_embeds(
                    self.params, self.runner.cfg, ids_arr, feats,
                    self.image_token_id,
                )
                token_types = (ids_arr == self.image_token_id).astype(
                    jnp.int32)
                image_span = self.vision_cfg.mm_tokens_per_image
                # Image fingerprint: lets multimodal admissions share the
                # context LRU — (ids, pixels) keys never collide across
                # different images with identical placeholder ids.
                content_key = hashlib.sha1(
                    np.ascontiguousarray(np.asarray(px)).tobytes()
                ).hexdigest()
            reqs.append(Request(context_ids, q_ids[0], max_new_tokens,
                                inputs_embeds=embeds,
                                token_types=token_types,
                                content_key=content_key))
        if capacity is None:
            longest = max(len(r.context_ids) for r in reqs)
            if context_bucket is not None:
                longest = -(-longest // context_bucket) * context_bucket
            kept = (
                press.max_kept(longest, self.runner.cfg)
                if press is not None else longest
            )
            if self.runner.cfg.sliding_window is not None:
                kept = longest      # sliding layers keep the full context
            max_q = max(len(r.question_ids) for r in reqs)
            capacity = (
                kept
                + -(-max(max_q, 1) // question_bucket) * question_bucket
                + max_new_tokens + 1
            )
        eos = tuple(e for e in self._eos() if e >= 0)
        eng = ServingEngine(
            self.runner, self.params,
            n_slots=max(1, min(n_slots, len(reqs))),
            capacity=capacity, press=press,
            quantized=quantized, kv_bits=kv_bits,
            context_bucket=context_bucket, context_chunk=context_chunk,
            interleave=interleave, question_bucket=question_bucket,
            eos_ids=eos, mesh=mesh, tokenizer=self.tokenizer,
            context_cache=context_cache, do_sample=do_sample,
            temperature=temperature, top_p=top_p, seed=seed,
            image_span=image_span,
        )
        outs = eng.run(reqs, on_token=on_token)
        answers = []
        for toks in outs:
            answers.append(
                self.tokenizer.decode(list(toks), skip_special_tokens=True)
            )
        return answers

    # ------------------------------------------------------------------ #

    def _run_kvzip(self, cache: KVCache, context_ids, press, max_new_tokens,
                   context_embeds=None):
        """KVzip chunked context reconstruction: for each chunk, forward a
        'repeat' prompt against the cache with a chunk-scorer press, collect
        per-layer scores, roll the cache back (free — the pre-pass cache value
        is simply reused), then mask global bottom-k.

        ``context_embeds`` (1, S, E): multimodal contexts re-feed each
        chunk's CAPTURED embeddings (vision features included) instead of
        re-embedding placeholder ids; the repeat-question/suffix tokens are
        embedded normally and concatenated in front. The repeat copy runs
        causally, as the reference's repeat forward does (it passes only
        input_ids, kvzip_press.py:179-202)."""
        import numpy as np

        from .cache import grow
        from .presses.kvzip import KVzipChunkScorer

        if press.compression_ratio <= 0:
            return cache
        tok = self.tokenizer
        prefix_len, suffix_ids = _chat_affixes(tok)
        pairs = press.chunk_pairs(list(context_ids), prefix_len, suffix_ids, tok)
        ctx_len = len(context_ids)
        max_rep = max(len(r) for _, r in pairs)
        if cache.max_size < ctx_len + max_rep:
            if cache.keys.nbytes > (1 << 30):
                logger.warning(
                    "KVzip repeat-pass grow fallback on a %.1f GiB cache "
                    "(max_size %d -> %d): the grow copy holds two full "
                    "caches — presize via context_chunk/kvzip_repeat_bound",
                    cache.keys.nbytes / 2**30, cache.max_size,
                    ctx_len + max_rep,
                )
            cache = grow(cache, ctx_len + max_rep - cache.max_size)

        cfg = self.runner.cfg
        score_val = np.zeros((cfg.num_layers, 1, cfg.num_kv_heads, ctx_len), np.float32)
        score_val[..., : press.n_sink] = 1.0

        # Dispatch every repeat-chunk forward back-to-back and fetch all the
        # score arrays in ONE device_get at the end: a per-chunk np.asarray
        # host sync drains the device queue between chunks (measured 39.1s
        # vs 3.1s for the 8 passes at 16K on the tunneled chip —
        # tools/probe_kvzip_cost.py). Rollback between passes is implicit:
        # the pre-pass `cache` value is simply reused.
        start = prefix_len
        spans, score_arrs = [], []
        # Lean repeat passes (default): the repeat KV lives only in
        # per-layer transients inside the lean chunk scan — no xs+ys
        # double-cache copy (which OOMs 8B@64K next to the weights), free
        # rollback, and a TRACED chunk start so all full chunks share one
        # compile (the static-span scorer recompiles per chunk). The plus
        # variant needs per-layer value/Wo norms — it keeps the
        # full-forward scorer path.
        use_lean = not press.kvzip_plus_normalization
        for chunk, repeat in pairs:
            end = start + len(chunk)
            rep = jnp.asarray(np.asarray(repeat, np.int32))[None]
            rep_embeds = None
            if context_embeds is not None:
                from .models.llama import embed_tokens

                head_ids = jnp.asarray(
                    np.asarray(repeat[: len(repeat) - len(chunk)], np.int32)
                )[None]
                rep_embeds = jnp.concatenate([
                    embed_tokens(self.params, head_ids, self.runner.cfg),
                    context_embeds[:, start:end],
                ], axis=1)
            if use_lean:
                cache, sc = self.runner.kvzip_repeat_pass(
                    self.params, rep, cache, start,
                    min(press.n_sink, start), end - start,
                    rep_embeds=rep_embeds,
                )
                score_arrs.append(sc)
                # Lagged queue bound: enqueued calls allocate their outputs
                # eagerly on the axon backend (CLAUDE.md), so an unbounded
                # dispatch run-ahead could pile up pass outputs. A tiny
                # fetch every 8th pass caps that at ~8 passes of small
                # outputs. Not every pass: on the tunnel ANY fetch waits on
                # the whole enqueued queue (measured +6s over 16 passes at
                # 8B/32K — a per-pass barrier, not a cheap dependency wait).
                if len(score_arrs) % 8 == 0:
                    jax.device_get(score_arrs[-2][0, 0, 0, 0])
            else:
                scorer = KVzipChunkScorer(
                    start_idx=start, end_idx=end, context_length=ctx_len,
                    n_sink=press.n_sink, plus=press.kvzip_plus_normalization,
                )
                state = scorer.init_state(cfg, 1, ctx_len)
                _, _, out_state = _scored_forward(
                    self.params, rep, cache, state, rep_embeds,
                    runner=self.runner, press=scorer,
                )
                score_arrs.append(out_state["scores"])
            spans.append((start, end))
            start = end
        for (s, e), arr in zip(spans, jax.device_get(score_arrs)):
            score_val[..., s:e] = arr

        # RestoreKV: one LoRA-adapted restore pass appends n restore-token
        # KV slots to the cache; eviction then runs budget-matched
        # (reference restorekv_press.py:67-100).
        eff_press = press
        if getattr(press, "num_restore_tokens", 0) > 0:
            from .presses.restorekv import apply_lora

            restore_params = (
                apply_lora(self.params, press.lora, press.lora_scaling)
                if press.lora else self.params
            )
            from .models.llama import param_dtype

            embeds = jnp.asarray(
                press.restore_embeddings, param_dtype(self.params)
            )[None]
            dummy_ids = jnp.zeros((1, embeds.shape[1]), jnp.int32)
            _, cache, _ = self.runner.forward(
                restore_params, dummy_ids, cache, inputs_embeds=embeds,
                compute_logits=False,
            )
            overhead = press.num_restore_tokens / max(ctx_len, 1)
            eff_press = dataclasses.replace(
                press,
                compression_ratio=min(0.999999, press.compression_ratio + overhead),
            )

        keep = eff_press.head_mask_from_scores(score_val)    # (L, 1, H, ctx)
        return self._apply_keep_mask(cache, keep)

    def _apply_keep_mask(self, cache: KVCache, keep):
        """keep: (L, B, H, ctx_len) bool — AND into the cache mask."""
        import numpy as np

        L, B, H, ctx_len = keep.shape
        S_buf = cache.max_size
        keep_padded = np.ones((L, B, H, S_buf), dtype=bool)
        keep_padded[..., :ctx_len] = keep
        mask = cache.mask
        if mask is None:
            mask = jnp.ones_like(jnp.asarray(keep_padded))
        return dataclasses.replace(cache, mask=mask & jnp.asarray(keep_padded))

    def _run_kvcompose(self, cache: KVCache, context_ids, press,
                       context_chunk=None, context_embeds=None):
        """KVCompose scoring pass: re-feed the context against its own cache,
        aggregate attention onto the original columns, then structured
        per-layer rebuild or unstructured head mask.

        ``context_chunk`` switches the re-feed to bounded chunks (the 8B@64K+
        enabler): appends are preserved (chunk i's queries attend to the
        original context plus re-fed chunks < i — the exact one-shot
        causality over the doubled sequence) and each chunk pass emits a
        blockwise flash-lse column aggregation instead of materializing the
        (S, 2S) prob matrix (reference streams eager attention the same way,
        kvcompose_press.py:28-99)."""
        import numpy as np

        from .cache import grow
        from .presses.kvcompose import KVComposeCollector

        if press.compression_ratio <= 0:
            return cache
        ctx_len = len(context_ids)
        if cache.max_size < 2 * ctx_len:
            if cache.keys.nbytes > (1 << 30):
                logger.warning(
                    "KVCompose re-feed grow on a %.1f GiB cache — presize "
                    "via context_chunk to avoid the two-cache copy",
                    cache.keys.nbytes / 2**30,
                )
            cache = grow(cache, 2 * ctx_len - cache.max_size)
        cfg = self.runner.cfg

        if context_chunk is not None and ctx_len > context_chunk:
            # fresh copies: the refeed passes DONATE the cache pytree, which
            # deletes the original length/offset buffers too
            base_len = jnp.array(cache.length)
            base_off = jnp.array(cache.offset)
            acc = None
            for start in range(0, ctx_len, context_chunk):
                ids_chunk = jnp.asarray(np.asarray(
                    context_ids[start:start + context_chunk], np.int32))[None]
                cache, part = self.runner.kvcompose_refeed_pass(
                    self.params, ids_chunk, cache, ctx_len, press.agg_task,
                    chunk_embeds=(
                        context_embeds[:, start:start + context_chunk]
                        if context_embeds is not None else None
                    ),
                )
                acc = part if acc is None else (
                    jnp.maximum(acc, part) if press.agg_task == "max"
                    else acc + part
                )
            # rollback: appended re-feed KV sits beyond ctx_len — restoring
            # length/offset makes those slots dead (next appends overwrite)
            cache = dataclasses.replace(cache, length=base_len,
                                        offset=base_off)
            acc = acc.astype(jnp.float32)    # partials may be bf16 (128K max)
            task = acc if press.agg_task == "max" else acc / ctx_len
            # group aggregation once over ALL queries' task aggregation
            # (per-chunk group agg would not commute for mixed agg modes)
            B = task.shape[1]
            Hq = task.shape[2]
            G = Hq // cfg.num_kv_heads
            grouped = task.reshape(task.shape[0], B, cfg.num_kv_heads, G,
                                   ctx_len)
            gagg = (grouped.max(axis=3) if press.agg_group == "max"
                    else grouped.mean(axis=3))
            scores = np.asarray(jax.device_get(gagg))[:, 0]  # (L, H, ctx)
        else:
            collector = KVComposeCollector(
                context_len=ctx_len, agg_task=press.agg_task,
                agg_group=press.agg_group,
            )
            state = collector.init_state(cfg, 1, ctx_len)
            ids = jnp.asarray(np.asarray(context_ids, np.int32))[None]
            _, _, out = _scored_forward(
                self.params, ids, cache, state, context_embeds,
                runner=self.runner, press=collector,
            )
            scores = np.asarray(out["scores"])[:, 0]         # (L, H, ctx)
        values = None
        if press.add_v_norm:
            values = np.asarray(cache.values[:, 0, :, :ctx_len], np.float32)
        budgets, keep = press.budgets_and_masks(scores, values)

        if not press.structured:
            return self._apply_keep_mask(cache, keep[:, None])

        # Structured: physically rebuild each layer to its composite budget —
        # a HOST LOOP of donated per-layer updates (one layer's gather
        # transient; a stacked take_along_axis holds a second full payload
        # copy next to the weights — measured OOM at 8B/64K int4).
        keep_buf = np.zeros(
            (cfg.num_layers, 1, cfg.num_kv_heads, cache.max_size), bool
        )
        keep_buf[..., :ctx_len] = keep[:, None]
        cache = dataclasses.replace(
            cache,
            mask=jnp.ones(
                (cfg.num_layers, 1, cfg.num_kv_heads, cache.max_size), bool
            ),
            length=jnp.asarray(budgets, jnp.int32),
        )
        for l in range(cfg.num_layers):
            cache = _kvcompose_rebuild_layer(
                cache, jnp.asarray(keep_buf[l]), jnp.asarray(l, jnp.int32)
            )
        return cache
