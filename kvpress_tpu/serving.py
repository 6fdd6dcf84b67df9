"""Continuous-batching serving engine over compressed KV caches.

The reference has no serving layer — its pipeline answers one request at a
time (``kvpress/pipeline.py:25-331``, batch hard-coded to 1). On TPU the
decode step is HBM-bound on *weights* at small batch, so batching is the
single biggest throughput lever (CLAUDE.md decode analysis); this module
provides it the XLA way: one fixed-shape jitted decode step over a fixed
pool of request slots, a host admission loop around it, and per-request
press-compressed prefills inserted into free slots.

Design (all shapes static under jit):

- ``SlotCache``: stacked buffers ``(L, N_slots, H_kv, C, D)`` with *per-slot*
  per-layer lengths ``(L, N)``, per-slot logical offsets ``(N,)`` and a
  keep-mask ``(L, N, H_kv, C)``. This generalizes ``KVCache`` (per-layer
  scalar length) to ragged slots; appends become per-slot scatters and
  causality a per-slot length bias — both fuse into the attention.
- Admission: ``Runner.prefill`` (B=1) with the press, phase="prefill" —
  identical compression semantics to the pipeline — then the (question)
  forward, host-side re-bucket to the slot capacity, and a jitted insert
  (``dynamic_update_slice`` on the slot axis).
- Decode: one token per live slot per step. Dead slots keep computing
  (their lanes are ignored and their lengths frozen) — wasted lanes beat a
  recompile. Steps are issued asynchronously and token fetches lag
  ``fetch_lag`` steps behind so the host's device_get round-trip (the ~25 ms
  axon latency) overlaps device compute.
- Quantized slots: int8 / packed-int4 payloads decode through
  ``quant_gqa_attention`` (ops/attention.py) — payload-width HBM reads, the
  dequantized buffer never materializes.

- Decode-phase compression: DecodingPress / PrefillDecodingPress compress
  each slot independently inside the jitted step — per-slot interval counters
  and hidden ring buffers (slots admitted at different times desync), the
  compression body under ``lax.cond(any(do))``, per-slot ``where`` apply,
  and ``vmap``-ed base-press scoring so scalar-length ``dynamic_score``
  implementations work unchanged. Quantized slots gather payload+scales
  (dense dequant only inside the cond).

- Multi-pass / post-mask admission: KVzip / KVCompose / FastKVzip requests
  run the pipeline's reconstruction-scoring orchestration at admission
  (``KVPressPipeline._run_kvzip`` / ``_run_kvcompose`` — pass ``tokenizer=``
  for the KVzip repeat prompts), then serve from the masked cache.

Not supported (asserted): CAM-style merge presses (they need dense per-step
attention accumulation — use the pipeline).
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from functools import partial
from typing import Optional

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .cache import KVCache, quantize_kv, shrink, grow
from .config import ModelConfig
from .models.llama import Runner, _act, _lin, _project_qkv, rms_norm
from .ops.attention import NEG_INF, gqa_attention, quant_gqa_attention
from .presses.base import BasePress
from .rope import apply_rope, rope_cos_sin

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlotCache:
    keys: jax.Array                      # (L, N, H, C, D) | int payload
    values: jax.Array
    lengths: jax.Array                   # (L, N) int32
    offsets: jax.Array                   # (N,) int32 — logical positions
    mask: jax.Array                      # (L, N, H, C) bool
    key_scales: Optional[jax.Array] = None   # (L, N, H, C, 1) f32
    value_scales: Optional[jax.Array] = None
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)

    @property
    def capacity(self) -> int:
        return self.keys.shape[3]

    @property
    def n_slots(self) -> int:
        return self.keys.shape[1]


def init_slot_cache(
    cfg: ModelConfig, n_slots: int, capacity: int, dtype=jnp.bfloat16,
    quantized: bool = False, bits: int = 8,
) -> SlotCache:
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    if quantized:
        pd = D if bits == 8 else D // 2
        pt = jnp.int8 if bits == 8 else jnp.uint8
        keys = jnp.zeros((L, n_slots, H, capacity, pd), pt)
        values = jnp.zeros((L, n_slots, H, capacity, pd), pt)
        ks = jnp.ones((L, n_slots, H, capacity, 1), jnp.float32)
        vs = jnp.ones((L, n_slots, H, capacity, 1), jnp.float32)
    else:
        keys = jnp.zeros((L, n_slots, H, capacity, D), dtype)
        values = jnp.zeros((L, n_slots, H, capacity, D), dtype)
        ks = vs = None
    return SlotCache(
        keys=keys, values=values,
        lengths=jnp.zeros((L, n_slots), jnp.int32),
        offsets=jnp.zeros((n_slots,), jnp.int32),
        mask=jnp.ones((L, n_slots, H, capacity), bool),
        key_scales=ks, value_scales=vs, bits=8 if not quantized else bits,
    )


# --------------------------------------------------------------------- #
# jitted engine steps


@partial(jax.jit, static_argnames=(
    "runner", "decode_press", "do_sample", "temperature", "top_p",
))
def _decode_step(
    params, tokens: jax.Array, sc: SlotCache, live: jax.Array,
    dp_state=None, rng=None, step=None, *, runner: Runner, decode_press=None,
    do_sample: bool = False, temperature: float = 1.0, top_p: float = 1.0,
):
    """One token for every slot: ``tokens (N,) → logits (N, V)``.

    Mirrors Runner._layer_step's decode path (models/llama.py:144-391) with
    per-slot ragged lengths: appends are batched scatters at each slot's
    length, causality is the per-slot bias ``k_slot <= length[b]``, and
    lengths/offsets only advance for live slots.

    ``decode_press`` (DecodingPress family, static) compresses each slot's
    cache independently: per-slot step counters/hidden ring buffers live in
    ``dp_state`` (see ServingEngine); slots hit their intervals at different
    times, so the compression body runs under ``lax.cond(any(do))`` and
    applies per-slot via ``where`` — base-press scoring is ``vmap``-ed over
    slots so every dynamic_score sees the scalar length it was written for.
    """
    cfg = runner.cfg
    N = tokens.shape[0]
    H, D = cfg.num_kv_heads, cfg.head_dim
    quantized = sc.key_scales is not None

    from .models.llama import embed_tokens

    x = embed_tokens(params, tokens[:, None], cfg)        # (N, 1, E)
    positions = sc.offsets[:, None]                       # (N, 1)
    inv_freq = runner.inv_freq()
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None
        else cfg.head_dim ** -0.5
    )
    C = sc.capacity
    sliding = jnp.asarray(cfg.sliding_flags())
    iN = jnp.arange(N)
    k_slot = jnp.arange(C, dtype=jnp.int32)
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    def body(xh, xs):
        if decode_press is not None:
            (layer, ck, cv, clen, cmask, cks, cvs, sflag, lid,
             pbuf, psteps, pbuf_len) = xs
        else:
            layer, ck, cv, clen, cmask, cks, cvs, sflag, lid = xs
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
        if cfg.rope_local_base_freq is not None:
            cos_l, sin_l = rope_cos_sin(
                runner.inv_freq_local(), positions, 1.0
            )
            cos = jnp.where(sflag, cos_l, cos)
            sin = jnp.where(sflag, sin_l, sin)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q_pre, cos, sin)
        k = apply_rope(k_pre, cos, sin)

        # Append at each slot's own length (scatter over the slot batch).
        if quantized:
            pk, sk = quantize_kv(k, sc.bits)
            pv, sv = quantize_kv(v, sc.bits)
            ck = ck.at[iN, :, clen].set(pk[:, :, 0].astype(ck.dtype))
            cv = cv.at[iN, :, clen].set(pv[:, :, 0].astype(cv.dtype))
            cks = cks.at[iN, :, clen].set(sk[:, :, 0])
            cvs = cvs.at[iN, :, clen].set(sv[:, :, 0])
        else:
            ck = ck.at[iN, :, clen].set(k[:, :, 0].astype(ck.dtype))
            cv = cv.at[iN, :, clen].set(v[:, :, 0].astype(cv.dtype))
        cmask = cmask.at[iN, :, clen].set(True)

        # Per-slot slot-index causality + keep-mask (ops/attention.py
        # docstring) — built lazily; XLA fuses it into the logits.
        allowed = k_slot[None, :] <= clen[:, None]        # (N, C)
        if cfg.sliding_window is not None:
            sl = allowed & (k_slot[None, :] > clen[:, None] - cfg.sliding_window)
            allowed = jnp.where(sflag, sl, allowed)
        bias = jnp.where(allowed[:, None, None, :], 0.0, NEG_INF)
        bias = bias + jnp.where(cmask, 0.0, NEG_INF)[:, :, None, :]

        if quantized:
            attn = quant_gqa_attention(
                q, ck, cv, cks, cvs, bias, scale, sc.bits,
                softcap=cfg.logit_softcap,
            )
        else:
            attn, _ = gqa_attention(
                q, ck, cv, bias, scale, softcap=cfg.logit_softcap
            )

        o = _lin(attn.transpose(0, 2, 1, 3).reshape(N, 1, -1), layer, "wo")
        if cfg.post_norms:
            o = rms_norm(o, layer["ln1_post"], cfg.rms_norm_eps,
                         cfg.rms_one_offset)
        xh = xh + o
        h2 = rms_norm(xh, layer["ln2"], cfg.rms_norm_eps, cfg.rms_one_offset)
        mlp = _act(_lin(h2, layer, "wg"), cfg.act) * _lin(h2, layer, "wu")
        mlp = _lin(mlp, layer, "wd")
        if cfg.post_norms:
            mlp = rms_norm(mlp, layer["ln2_post"], cfg.rms_norm_eps,
                           cfg.rms_one_offset)
        xh = xh + mlp
        nlen = jnp.where(live, clen + 1, clen)            # dead slots frozen

        if decode_press is None:
            return xh, (ck, cv, nlen, cmask, cks, cvs)

        # ---- per-slot decode-phase compression (DecodingPress family) ----
        # Ring buffers advance for LIVE slots only: a slot inserted by an
        # in-flight admission (not yet live) must not shift a duplicate
        # hidden state in during the dead step between insert and live.
        buf_size = pbuf.shape[1]
        shifted = jnp.concatenate([pbuf[:, 1:], h.astype(pbuf.dtype)], axis=1)
        buf = jnp.where(live[:, None, None], shifted, pbuf)
        buf_len = jnp.where(
            live, jnp.minimum(pbuf_len + 1, buf_size), pbuf_len
        )
        steps = psteps + live.astype(jnp.int32)
        target = decode_press.target_value_vec(sc.offsets, nlen)     # (N,)
        n_top = min(decode_press.target_bound(None, buf_size), C)
        do = live & (steps >= decode_press.compression_interval) \
            & (nlen > target)
        if cfg.sliding_window is not None:
            # sliding layers are never compressed (slot-index window)
            do = do & ~sflag

        def compress(args):
            ck, cv, cks, cvs, cmask = args
            if quantized:
                from .cache import dequantize_kv

                dk = dequantize_kv(ck, cks, sc.bits, xh.dtype)
                dv = dequantize_kv(cv, cvs, sc.bits, xh.dtype)
            else:
                dk, dv = ck, cv
            buf_positions = (
                sc.offsets[:, None]
                - jnp.arange(buf_size - 1, -1, -1, dtype=jnp.int32)[None]
            )

            def score_one(hid, pos, kk, vv, ln):
                from .presses.base import LayerCtx

                dctx = LayerCtx(
                    layer_idx=lid, hidden=hid[None], queries=None,
                    queries_prerope=None, keys_prerope=None,
                    positions=pos[None], attn_probs=None, layer_params=layer,
                    inv_freq=inv_freq, cfg=cfg,
                    attention_scaling=runner.attention_scaling, kv_len=ln,
                )
                return decode_press.score_dynamic(
                    dctx, kk[None], vv[None], ln
                )[0]

            scores = jax.vmap(score_one)(
                buf, buf_positions, dk, dv, nlen
            ).astype(jnp.float32)                                # (N, H, C)
            valid = (k_slot[None, None] < nlen[:, None, None]) & cmask
            scores = jnp.where(valid, scores, NEG_INF)
            _, idx = jax.lax.top_k(scores, n_top)                # (N, H, n_top)
            kept_k = jnp.take_along_axis(ck, idx[..., None], axis=2)
            kept_v = jnp.take_along_axis(cv, idx[..., None], axis=2)
            ck2 = jax.lax.dynamic_update_slice_in_dim(ck, kept_k, 0, axis=2)
            cv2 = jax.lax.dynamic_update_slice_in_dim(cv, kept_v, 0, axis=2)
            if quantized:
                ks2 = jnp.take_along_axis(cks, idx[..., None], axis=2)
                vs2 = jnp.take_along_axis(cvs, idx[..., None], axis=2)
                cks2 = jax.lax.dynamic_update_slice_in_dim(cks, ks2, 0, axis=2)
                cvs2 = jax.lax.dynamic_update_slice_in_dim(cvs, vs2, 0, axis=2)
            else:
                cks2, cvs2 = cks, cvs
            sel = do[:, None, None, None]
            ck = jnp.where(sel, ck2, ck)
            cv = jnp.where(sel, cv2, cv)
            if quantized:
                cks = jnp.where(sel, cks2, cks)
                cvs = jnp.where(sel, cvs2, cvs)
            cmask = jnp.where(do[:, None, None], True, cmask)
            return ck, cv, cks, cvs, cmask

        ck, cv, cks, cvs, cmask = jax.lax.cond(
            jnp.any(do), compress, lambda a: a, (ck, cv, cks, cvs, cmask)
        )
        nlen = jnp.where(do, jnp.minimum(target, n_top), nlen)
        steps = jnp.where(do, 0, steps)
        buf_len = jnp.where(do, 0, buf_len)
        return xh, (ck, cv, nlen, cmask, cks, cvs, buf, steps, buf_len)

    if decode_press is not None:
        xs = (
            params["layers"], sc.keys, sc.values, sc.lengths, sc.mask,
            sc.key_scales, sc.value_scales, sliding, layer_ids,
            dp_state["buffer"], dp_state["steps"], dp_state["buf_len"],
        )
        x, (nk, nv, nlen, nmask, nks, nvs, nbuf, nsteps, nbuf_len) = \
            jax.lax.scan(body, x, xs)
        dp_state = {"buffer": nbuf, "steps": nsteps, "buf_len": nbuf_len}
    else:
        xs = (
            params["layers"], sc.keys, sc.values, sc.lengths, sc.mask,
            sc.key_scales, sc.value_scales, sliding, layer_ids,
        )
        x, (nk, nv, nlen, nmask, nks, nvs) = jax.lax.scan(body, x, xs)

    from .models.llama import lm_head_logits

    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = lm_head_logits(x[:, 0], params, cfg)
    nsc = dataclasses.replace(
        sc, keys=nk, values=nv, lengths=nlen, mask=nmask,
        key_scales=nks, value_scales=nvs,
        offsets=jnp.where(live, sc.offsets + 1, sc.offsets),
    )
    # Dead lanes keep their INPUT token: an in-flight admission stages the
    # request's first token in tokens[slot] before the slot is live, and a
    # decode step issued in between must not overwrite it with the dead
    # lane's argmax (the slot's length/offset are frozen, so that first
    # token's KV would never be committed once the slot comes live).
    if do_sample:
        # Per-(step, slot) keys derived inside the jit: rng is the engine's
        # constant base key and step a traced counter — no per-step host
        # splits, no recompiles.
        from .pipeline import _sample_token

        step_key = jax.random.fold_in(rng, step)
        keys = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(iN)
        nxt = jax.vmap(_sample_token, in_axes=(0, 0, None, None))(
            logits, keys, temperature, top_p
        )
    else:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(live, nxt, tokens), nsc, dp_state


@partial(jax.jit, static_argnames=("temperature", "top_p"))
def _sample_first(row, adm_key, i, *, temperature: float, top_p: float):
    """Per-admission first-token draw, fused to one dispatch; ``i`` is a
    traced counter so every admission shares one compile."""
    from .pipeline import _sample_token

    return _sample_token(row, jax.random.fold_in(adm_key, i),
                         temperature, top_p)


@partial(jax.jit, static_argnames=("runner",))
def _question_forward(params, ids, cache, valid_len, *, runner: Runner):
    """Question tokens against the compressed context (bucketed via
    valid_len — one compile per question bucket)."""
    return runner.forward(
        params, ids, cache, logits_last_only=True, valid_len=valid_len
    )


@jax.jit
def _reset_slot_state(state: dict, slot: jax.Array) -> dict:
    """Zero one slot's decode-press counters/ring buffer (admission)."""
    z = jnp.zeros((), jnp.int32)
    L, N, buf, E = state["buffer"].shape
    return {
        "buffer": jax.lax.dynamic_update_slice(
            state["buffer"], jnp.zeros((L, 1, buf, E), state["buffer"].dtype),
            (z, slot, z, z),
        ),
        "steps": jax.lax.dynamic_update_slice(
            state["steps"], jnp.zeros((L, 1), jnp.int32), (z, slot)
        ),
        "buf_len": jax.lax.dynamic_update_slice(
            state["buf_len"], jnp.zeros((L, 1), jnp.int32), (z, slot)
        ),
    }


@jax.jit
def _insert_slot(sc: SlotCache, pc: KVCache, slot: jax.Array) -> SlotCache:
    """Write a (L, 1, H, C, D) prefilled request cache into slot ``slot``."""
    z = jnp.zeros((), jnp.int32)

    def put(dst, src):
        idx = (z, slot) + (z,) * (dst.ndim - 2)
        return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), idx)

    mask = pc.mask
    if mask is None:
        mask = jnp.ones(pc.keys.shape[:-1], bool)
    new = dict(
        keys=put(sc.keys, pc.keys),
        values=put(sc.values, pc.values),
        mask=put(sc.mask, mask),
        lengths=jax.lax.dynamic_update_slice(
            sc.lengths, pc.length[:, None], (z, slot)
        ),
        offsets=jax.lax.dynamic_update_slice(
            sc.offsets, pc.offset[None], (slot,)
        ),
    )
    if sc.key_scales is not None:
        new["key_scales"] = put(sc.key_scales, pc.key_scales)
        new["value_scales"] = put(sc.value_scales, pc.value_scales)
    return dataclasses.replace(sc, **new)


# --------------------------------------------------------------------- #


_UNSET = object()        # "use the engine's press" sentinel for overrides


def _with_ratio(press, ratio: float):
    """A copy of ``press`` with its effective compression_ratio replaced —
    either its own dataclass field or the wrapped press's (AdaKV-family
    wrappers delegate the property to ``press.press``)."""
    fields = {f.name for f in dataclasses.fields(press)}
    if "compression_ratio" in fields:
        return dataclasses.replace(press, compression_ratio=ratio)
    assert "press" in fields and press.press is not None, (
        f"cannot override compression_ratio on {type(press).__name__}"
    )
    return dataclasses.replace(
        press, press=_with_ratio(press.press, ratio)
    )


@dataclasses.dataclass
class Request:
    context_ids: list
    question_ids: list
    max_new_tokens: int = 64
    # Multimodal admission (Gemma3): precomputed context embeds (1, S, E)
    # override the token embedding (vision features scattered into text
    # embeds — models/convert.multimodal_embeds), with token_types (1, S)
    # marking image placeholder tokens for bidirectional image-span
    # attention. The engine's image_span= carries the static span bound.
    inputs_embeds: Optional[object] = None
    token_types: Optional[object] = None
    # Image content fingerprint (e.g. a hash of the pixel bytes, set by
    # pipeline.batch): multimodal admissions participate in the context LRU
    # keyed on (context_ids, content_key) — identical ids with different
    # images never collide. None + inputs_embeds set = LRU bypass.
    content_key: Optional[object] = None
    # Scheduling weight (schedule="priority"): higher admits first;
    # ties fall back to submission order.
    priority: int = 0


@dataclasses.dataclass
class _SlotState:
    req_idx: int = -1
    generated: list = dataclasses.field(default_factory=list)
    budget: int = 0
    in_flight: int = 0        # steps issued whose tokens aren't fetched yet
    done_at: Optional[int] = None   # index into generated where eos was seen


class ServingEngine:
    """Fixed-pool continuous batching. ``run(requests)`` drives admission,
    batched decode and retirement until every request has an answer.

    capacity: per-slot KV budget — compressed context + question +
    max_new_tokens must fit (asserted at admission).
    """

    def __init__(
        self,
        runner: Runner,
        params: dict,
        n_slots: int = 8,
        capacity: int = 4096,
        press: Optional[BasePress] = None,
        quantized: bool = False,
        kv_bits: int = 8,
        context_bucket: Optional[int] = None,
        context_chunk: Optional[int] = None,  # bounded-activation admission
        question_bucket: int = 64,
        fetch_lag: int = 4,
        eos_ids: tuple = (),
        mesh=None,                  # tensor-parallel serving over ("data","model")
        tokenizer=None,             # required for KVzip-family multi-pass
        schedule: str = "fifo",     # "fifo" | "sjf" (shortest job first)
        interleave: bool = False,   # chunk-interleaved admission (needs
                                    # context_chunk): bound live slots'
                                    # inter-token stall to ~one chunk
        context_cache: int = 0,     # LRU of compressed contexts (entries)
        do_sample: bool = False,    # nucleus sampling instead of greedy
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
        image_span: Optional[int] = None,   # static image-span bound for
        # multimodal admissions (mm_tokens_per_image; Requests carry
        # inputs_embeds + token_types)
        max_admissions: Optional[int] = None,   # cap on CONCURRENT
        # admissions: each in-flight admission holds a full uncompressed
        # prefill buffer until compression lands, so n_slots concurrent
        # admissions of long contexts can out-size the slot pool itself.
        # None = one per free slot (the round-3 behavior).
    ):
        # Decode-phase compression: a DecodingPress (or the decoding half of
        # a PrefillDecodingPress) compresses every slot independently inside
        # the jitted decode step (per-slot interval counters + ring buffers).
        from .presses.decoding import DecodingPress, PrefillDecodingPress

        self.decode_press = None
        if isinstance(press, PrefillDecodingPress):
            self.decode_press = press.decoding_press
            press = press.prefilling_press
        elif isinstance(press, DecodingPress):
            self.decode_press = press
            press = None
        if self.decode_press is not None:
            assert type(self.decode_press).decode_compress in (
                DecodingPress.decode_compress,
            ), (
                "only DecodingPress-family presses (score → top-k) run in "
                "the serving loop; CAM-style merge presses need the pipeline"
            )
        self.multi_pass = bool(getattr(press, "multi_pass", False))
        self.post_mask = bool(getattr(press, "post_mask", False))
        if press is not None:
            assert self.multi_pass or not press.compresses_decode, (
                "decode-phase presses other than DecodingPress/"
                "PrefillDecodingPress are not supported in the serving loop"
            )
            if self.multi_pass or self.post_mask:
                assert context_bucket is None, (
                    "context_bucket is not supported for multi-pass presses"
                )
            if self.multi_pass and getattr(press, "multi_pass", None) != \
                    "kvcompose":
                assert tokenizer is not None, (
                    "KVzip-family presses need the tokenizer (repeat-prompt "
                    "construction) — pass tokenizer= to ServingEngine"
                )
        self.tokenizer = tokenizer
        self.runner = runner
        self.params = params
        self.n_slots = n_slots
        self.capacity = capacity
        self.press = press
        self.quantized = quantized
        self.kv_bits = kv_bits
        self.context_bucket = context_bucket
        self.image_span = image_span
        self.max_admissions = max_admissions
        if context_chunk is not None:
            from .presses.base import ScorerPress
            from .presses.dms import DMSPress

            assert context_bucket is None, (
                "context_chunk and context_bucket are mutually exclusive"
            )
            assert press is None or (
                isinstance(press, ScorerPress)
                or getattr(press, "scorer_like", False)
                or hasattr(press, "chunked_compress")
                or (isinstance(press, DMSPress)
                    and press.press.chunk_score_fn is not None)
                or self.multi_pass or self.post_mask
            ), (
                "context_chunk admission compresses with a ScorerPress, a "
                "scorer-like or chunked-composable wrapper, DMS over a "
                "per-token scorer, or a multi-pass/post-mask press (repeat "
                "passes run after the chunked prefill)"
            )
        self.context_chunk = context_chunk
        self.question_bucket = question_bucket
        self.fetch_lag = max(1, fetch_lag)
        assert schedule in ("fifo", "sjf", "priority"), schedule
        self.schedule = schedule
        assert not interleave or context_chunk is not None, (
            "interleave=True requires context_chunk= (the chunk is the "
            "scheduling unit — exact-length prefill is one indivisible "
            "dispatch)"
        )
        self.interleave = bool(interleave)
        self.eos_ids = set(int(e) for e in eos_ids)
        from .models.llama import param_dtype

        self.dtype = param_dtype(params)
        self.sc = init_slot_cache(
            runner.cfg, n_slots, capacity, dtype=self.dtype,
            quantized=quantized, bits=kv_bits,
        )
        self.dp_state = None
        if self.decode_press is not None:
            L, E = runner.cfg.num_layers, runner.cfg.hidden_size
            buf = max(self.decode_press.hidden_states_buffer_size, 1)
            self.dp_state = {
                "buffer": jnp.zeros((L, n_slots, buf, E), self.dtype),
                "steps": jnp.zeros((L, n_slots), jnp.int32),
                "buf_len": jnp.zeros((L, n_slots), jnp.int32),
            }
        if mesh is not None:
            # Mesh serving: weights and the slot pool's kv-head axis shard
            # over "model" (GSPMD inserts one psum per attention/MLP block,
            # exactly the prefill TP layout in parallel/mesh.py); the SLOT
            # axis shards over "data" when it divides — each data shard owns
            # a slice of the batch, so the engine scales along both axes.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import shard_params

            self.params = shard_params(params, mesh)
            dp = (
                "data"
                if "data" in mesh.axis_names
                and n_slots % mesh.shape["data"] == 0
                else None
            )

            def ns(*spec):
                return NamedSharding(mesh, P(*spec))

            kv = ns(None, dp, "model", None, None)
            self.sc = jax.device_put(self.sc, SlotCache(
                keys=kv, values=kv,
                lengths=ns(None, dp), offsets=ns(dp),
                mask=ns(None, dp, "model", None),
                key_scales=None if self.sc.key_scales is None else kv,
                value_scales=None if self.sc.value_scales is None else kv,
                bits=self.sc.bits,
            ))
            if self.dp_state is not None:
                self.dp_state = jax.device_put(self.dp_state, {
                    "buffer": ns(None, dp, None, None),
                    "steps": ns(None, dp),
                    "buf_len": ns(None, dp),
                })
        self.mesh = mesh
        self.tokens = jnp.zeros((n_slots,), jnp.int32)
        self.live = np.zeros((n_slots,), bool)
        self.slots = [_SlotState() for _ in range(n_slots)]
        # Optimistic-admission bookkeeping, initialized here (not only in
        # run()) so _complete_admission is safe from any caller (advisor r4):
        # indices of requests dropped after their retry, and pending
        # capacity-clamped retries (consumed by run()'s admission loop).
        self._dropped: list[int] = []
        self._retry_pending: list[dict] = []
        self._retries = 0
        self._on_token = None     # streaming callback, set per run()
        # Compressed-context reuse: the reference pipeline's core UX is one
        # compressed cache answering many questions (pipeline.py:236-249 in
        # the reference); context_cache lifts that to the engine. Admissions
        # whose context_ids match an LRU entry skip prefill + compression
        # entirely and run only the question forward on the stored cache
        # (a KVCache is an immutable pytree — sharing is safe). HBM cost:
        # one kept-bound-sized cache per entry; entries default to 0 (off).
        self.context_cache = int(context_cache)
        self._ctx_lru: "OrderedDict[tuple, tuple]" = OrderedDict()
        self.ctx_hits = 0
        # Contexts with an in-flight (interleaved) prefill: a concurrent
        # same-context admission waits for the first one's LRU store instead
        # of running a duplicate chunked prefill.
        self._ctx_pending: set = set()
        # Context tokens NOT forwarded because an admission hit the LRU —
        # subtracted from last_stats processed_tokens so processed_tok_s
        # reflects device work actually done (advisor r3).
        self._skipped_ctx_tokens = 0
        # Sampling (reference: kvzap/evaluate_aime.py generates with
        # temperature/top-p sampling): per-(step, slot) keys are folded from
        # one base key inside the jitted step; admissions use a separate
        # per-admission counter so first tokens are independent draws.
        self.do_sample = bool(do_sample)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        # Two independent streams split from the seed: folding both from one
        # base key would let a per-admission key collide with some decode
        # step's per-slot key (fold_in is not namespaced).
        self._step_key, self._adm_key = jax.random.split(
            jax.random.PRNGKey(seed)
        )
        self._step_i = 0
        self._adm_i = 0
        self._t_run_start = None    # set per run(); TTFT bookkeeping
        self._ttfts: list = []

    # ---------------- admission ---------------- #

    def _kept_bound(self, ctx_len: int, press=_UNSET) -> int:
        """Static upper bound on kept context entries after compression."""
        if press is _UNSET:
            press = self.press
        bound = (
            press.max_kept(ctx_len, self.runner.cfg)
            if press is not None else ctx_len
        )
        if self.runner.cfg.sliding_window is not None:
            bound = ctx_len   # sliding layers keep everything
        return bound

    def _slots_needed(self, req: Request) -> int:
        """Static upper bound on the cache slots this request occupies once
        admitted: kept context (press.max_kept) + question tokens + the
        token budget + the final-logits slot."""
        return (self._kept_bound(len(req.context_ids))
                + len(req.question_ids) + req.max_new_tokens + 1)

    def _prefill_issue(self, req: Request, press=_UNSET):
        """Dispatch a request's press-compressed prefill + question forward
        + capacity re-bucket WITHOUT any host sync. Returns
        ``(cache, kept_arr, first_arr, lru_key)`` — device values plus the
        LRU key this admission stored under (None if it didn't); the caller
        fetches ``kept``/``first`` at completion time so the round-trip
        overlaps decode compute (admission-time host overlap)."""
        gen = self._prefill_issue_steps(req, press)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    def _prefill_issue_steps(self, req: Request, press=_UNSET):
        """Generator form of :meth:`_prefill_issue`: on the chunked path it
        yields after each bounded dispatch unit (one prefill chunk / one
        compressed layer) so the run loop can interleave decode-step
        dispatches between them (``interleave=True``); non-chunked paths
        return without yielding (one indivisible prefill program).
        ``press`` overrides the engine press (capacity-clamped retries) —
        overridden admissions bypass the LRU entirely (their compression
        differs from what other admissions expect to reuse)."""
        runner, params = self.runner, self.params
        overridden = press is not _UNSET
        if not overridden:
            press = self.press
        ctx = list(req.context_ids)
        # Multimodal admissions join the LRU when they carry a content_key
        # (image fingerprint) — the key is (context_ids, content_key), so
        # identical ids with different images never collide; embeds without
        # a fingerprint still bypass.
        key = None
        if self.context_cache and not overridden:
            if req.inputs_embeds is None:
                key = (tuple(req.context_ids), None)
            elif req.content_key is not None:
                key = (tuple(req.context_ids), req.content_key)
        if key is not None:
            # In-flight prefill dedup (interleave mode): another admission
            # may already be chunk-prefilling this exact context — yield
            # until its LRU store lands instead of running a duplicate
            # prefill (the run loop keeps advancing the first admission's
            # generator between our yields, so this always terminates).
            while key in self._ctx_pending and key not in self._ctx_lru:
                yield
            if key in self._ctx_lru:
                # Compressed-context reuse: skip prefill + compression
                # entirely. The stored cache is an immutable pytree — the
                # question forward below operates on (functional) copies,
                # so sharing is safe.
                cache, pre_row = self._ctx_lru[key]
                self._ctx_lru.move_to_end(key)
                self.ctx_hits += 1
                self._skipped_ctx_tokens += len(req.context_ids)
                return self._finish_issue(req, ctx, cache, pre_row, press,
                                          None)
            self._ctx_pending.add(key)
        try:
            return (yield from self._prefill_issue_miss(req, ctx, key, press))
        finally:
            if key is not None:
                self._ctx_pending.discard(key)

    def _prefill_issue_miss(self, req: Request, ctx: list, key, press):
        """The LRU-miss body of :meth:`_prefill_issue_steps` (same generator
        contract): full press-compressed prefill, multi-pass orchestration,
        LRU store."""
        runner, params = self.runner, self.params
        valid = None
        if self.context_bucket is not None:
            assert req.inputs_embeds is None, (
                "multimodal admissions need context_chunk or exact-length "
                "prefill (bucket pads break the image-span or-mask)"
            )
            pad = -(-len(ctx) // self.context_bucket) * self.context_bucket
            valid = jnp.asarray(len(ctx), jnp.int32)
            ctx = ctx + [0] * (pad - len(ctx))
        ids = jnp.asarray(np.asarray(ctx, np.int32))[None]
        if self.context_chunk is not None:
            # Bounded-activation admission: long contexts stream through the
            # compiled chunk program. max_size bucketed to a chunk multiple
            # so the chunk/compress programs are shared across context
            # lengths (one compile per bucket + one per distinct ragged
            # remainder width — not one exact-length prefill compile per
            # length, the 128K admission cliff). Still zero host syncs: the
            # chunk loop only dispatches.
            need = ids.shape[1]
            if (getattr(press, "multi_pass", None) == "kvcompose"
                    and press.compression_ratio > 0):
                # KVCompose re-feeds the whole context with appends (~2x
                # context KV, the reference's own overhead) — presize.
                need += ids.shape[1]
            if getattr(press, "multi_pass", None) is True:
                # KVzip-family: presize for the repeat passes (pipeline
                # parity) — growing a long-context cache afterwards holds
                # two full copies (measured OOM at 8B/128K int4). The bound
                # is EXACT when the tokenizer is available (the actual
                # repeat prompts are probed host-side — a chat template
                # whose affixes tokenize longer than the press's static
                # budget would otherwise trigger that grow, advisor r4).
                from .pipeline import kvzip_repeat_bound

                need += kvzip_repeat_bound(press, req.context_ids,
                                           self.tokenizer)
            bucketed = -(-need // self.context_chunk) * self.context_chunk
            chunk_gen = runner.prefill_chunked_steps(
                params, ids, press=press,
                chunk_size=self.context_chunk, max_size=bucketed,
                dtype=self.dtype, compute_logits=True,
                quantized=self.quantized, kv_bits=self.kv_bits,
                inputs_embeds=req.inputs_embeds,
                token_types=req.token_types,
                image_span=(self.image_span
                            if req.token_types is not None else None),
            )
            while True:
                try:
                    next(chunk_gen)
                except StopIteration as stop:
                    logits, cache, press_state = stop.value
                    break
                yield
        else:
            from .pipeline import _prefill

            logits, cache, press_state = _prefill(
                params, ids, valid, req.inputs_embeds, req.token_types,
                runner=runner, press=press,
                quantized=self.quantized, kv_bits=self.kv_bits,
                image_span=(self.image_span
                            if req.token_types is not None else None),
            )

        if press is not None and getattr(press, "rerotates", False):
            # Key-rerotation: kept keys renumbered contiguously — subsequent
            # tokens continue from the compressed length (pipeline contract).
            cache = dataclasses.replace(cache, offset=jnp.max(cache.length))
        if self.multi_pass or self.post_mask:
            # Multi-pass (KVzip/KVCompose) / post-mask (FastKVzip) admission:
            # reuse the pipeline's orchestration verbatim (tokenizer unused).
            from .pipeline import KVPressPipeline

            pipe = KVPressPipeline(runner, params, tokenizer=self.tokenizer)
            if self.multi_pass:
                if getattr(press, "multi_pass", None) == "kvcompose":
                    cache = pipe._run_kvcompose(
                        cache, list(req.context_ids), press,
                        context_chunk=self.context_chunk,
                        context_embeds=req.inputs_embeds,
                    )
                else:
                    cache = pipe._run_kvzip(cache, list(req.context_ids),
                                            press, req.max_new_tokens,
                                            context_embeds=req.inputs_embeds)
            if self.post_mask:
                cache = press.apply_post_mask(cache, press_state)
        if press is not None and getattr(press, "host_compact", False):
            # Head-wise compaction (pipeline parity): the slot insert
            # below re-buckets to slot capacity — compaction lets the
            # masked admission actually fit a small slot. DMS(compact=True)
            # masks during the (chunked) prefill itself, so it compacts
            # here too; AdaKV-family wrappers compact inside their own
            # compress.
            from .cache import compact_masked

            cache = compact_masked(cache)

        pre_row = logits[0, -1]
        if key is not None:
            # Store the compressed pre-question cache, shrunk to the static
            # kept bound (entries are front-compacted, so the slice is
            # lossless) — one compact cache per LRU entry of HBM. The last
            # prefill logits row rides along so questionless admissions
            # (and sampling) pick their first token from it. Bound on the
            # UNPADDED length (ctx may carry context_bucket padding; kept is
            # a function of the valid length) so hit- and miss-path question
            # forwards see identical buffer sizes — one compile, less HBM.
            # Compacting presses get a SECOND, measured-length shrink at
            # completion time (_complete_admission): their static bound is
            # the full context, ~2x the live data after compaction.
            bound = min(self._kept_bound(len(req.context_ids), press),
                        cache.max_size)
            if cache.max_size > bound:
                cache = shrink(cache, bound)
            self._ctx_lru[key] = (cache, pre_row)
            while len(self._ctx_lru) > self.context_cache:
                self._ctx_lru.popitem(last=False)
        return self._finish_issue(req, ctx, cache, pre_row, press, key)

    def _pick_first(self, row):
        """First token from a (V,) logits row: argmax, or an independent
        per-admission sampling draw (one jitted dispatch — the admission
        path is deliberately dispatch-only)."""
        if not self.do_sample:
            return jnp.argmax(row).astype(jnp.int32)
        first = _sample_first(
            row, self._adm_key, jnp.asarray(self._adm_i, jnp.int32),
            temperature=self.temperature, top_p=self.top_p,
        )
        self._adm_i += 1
        return first

    def _finish_issue(self, req: Request, ctx: list, cache, pre_row, press,
                      lru_key):
        """Question forward + capacity re-bucket on a compressed-context
        cache (fresh from prefill or reused from the LRU)."""
        runner, params = self.runner, self.params
        q_ids = list(req.question_ids)
        if q_ids:
            qb = self.question_bucket
            qpad = -(-len(q_ids) // qb) * qb
            qvalid = jnp.asarray(len(q_ids), jnp.int32)
            qarr = jnp.asarray(np.asarray(q_ids + [0] * (qpad - len(q_ids)),
                                          np.int32))[None]
            # Static kept bound instead of a device read: growth only needs
            # an upper bound, and the final re-bucket to `capacity`
            # normalizes the buffer anyway — one fewer host sync blocking
            # the decode-issue loop during admission.
            bound = self._kept_bound(len(ctx), press)
            need = min(bound, cache.max_size) + qpad
            if cache.max_size < need:
                cache = grow(cache, need - cache.max_size)
            logits, cache, _ = _question_forward(
                params, qarr, cache, qvalid, runner=runner
            )
            first_arr = self._pick_first(logits[0, -1])
        else:
            first_arr = self._pick_first(pre_row)

        # NO host sync here: kept/first stay on device (async-copied) and
        # are fetched at completion time — the ~25 ms tunneled-backend
        # round-trip (which also waits for the prefill itself to finish)
        # then overlaps decode steps already in the device queue.
        kept_arr = jnp.max(cache.length)
        if cache.max_size > self.capacity:
            cache = shrink(cache, self.capacity)
        elif cache.max_size < self.capacity:
            cache = grow(cache, self.capacity - cache.max_size)
        for a in (kept_arr, first_arr):
            try:
                a.copy_to_host_async()
            except (NotImplementedError, AttributeError):
                pass  # backend lacks async copy; device_get later still works
        return cache, kept_arr, first_arr, lru_key

    def _issue_admission(self, slot: int, req_idx: int, req: Request,
                         press=_UNSET, retried: bool = False) -> dict:
        """Dispatch the prefill and insert the compressed cache into the
        slot — all device work, no host sync. The slot is NOT live yet."""
        cache, kept_arr, first_arr, lru_key = self._prefill_issue(req, press)
        return self._insert_admitted(slot, req_idx, req,
                                     cache, kept_arr, first_arr, lru_key,
                                     retried=retried)

    def _insert_admitted(self, slot: int, req_idx: int, req: Request,
                         cache, kept_arr, first_arr, lru_key=None,
                         retried: bool = False) -> dict:
        """Insert an issued admission's compressed cache into the slot pool
        (device work only; the slot is NOT live until _complete_admission)."""
        self.sc = _insert_slot(self.sc, cache, jnp.asarray(slot, jnp.int32))
        if self.dp_state is not None:
            self.dp_state = _reset_slot_state(
                self.dp_state, jnp.asarray(slot, jnp.int32)
            )
        self.tokens = self.tokens.at[slot].set(first_arr)
        return dict(slot=slot, req_idx=req_idx, req=req,
                    kept=kept_arr, first=first_arr, lru_key=lru_key,
                    retried=retried)

    def _complete_admission(self, adm: dict):
        """Fetch kept/first (the only host-visible admission state) and mark
        the slot live. Runs after the next decode-step issue so the blocking
        device_get overlaps queued decode compute."""
        slot, req = adm["slot"], adm["req"]
        kept, first = jax.device_get((adm["kept"], adm["first"]))
        kept, first = int(kept), int(first)
        key = adm.get("lru_key")
        if (key is not None and key in self._ctx_lru and self.press is not None
                and getattr(self.press, "compact", False)):
            # Measured-length LRU shrink for compacting presses: the store
            # happened sync-free at the static kept bound (full context for
            # KVzip/FastKVzip — base.py max_kept), ~2x the live data after
            # compact_masked. `kept` (= max per-layer/head length, already
            # fetched above) is the exact lossless bound; bucket it so hit-
            # path question forwards share compiles across entries.
            bucket = self.context_chunk or self.question_bucket
            tgt = -(-max(kept, 1) // bucket) * bucket
            entry, pre_row = self._ctx_lru[key]
            if entry.max_size > tgt:
                self._ctx_lru[key] = (shrink(entry, tgt), pre_row)
        if kept + req.max_new_tokens + 1 > self.capacity:
            if (self.press is not None
                    and getattr(self.press, "compact", False)):
                # Optimistic admission miss: the compacted cache was already
                # truncated by the capacity re-bucket. Retry ONCE with the
                # compression ratio clamped so the measured kept fits the
                # slot (scaling the observed kept at the observed ratio);
                # only a failed retry drops the request (empty answer, slot
                # stays dead and reusable, engine unharmed).
                from .presses.dms import DMSPress as _DMS

                self.live[slot] = False
                self.slots[slot] = _SlotState()
                if isinstance(self.press, _DMS):
                    # threshold presses have no ratio to clamp — a
                    # capacity overflow drops directly on first failure
                    logger.warning(
                        "request %d compacted to %d slots but needs %d > "
                        "capacity %d — dropped (threshold presses have no "
                        "compression ratio to clamp for a retry; raise "
                        "capacity or the threshold)", adm["req_idx"], kept,
                        kept + req.max_new_tokens + 1, self.capacity,
                    )
                    self._dropped.append(adm["req_idx"])
                    return
                if not adm.get("retried"):
                    budget = (self.capacity - len(req.question_ids)
                              - req.max_new_tokens - 1)
                    r0 = float(self.press.compression_ratio)
                    # kept ≈ (1-r)·ctx per head at ratio r → aim 5% under
                    # the slot budget; clamp to a real increase and < 1.
                    r2 = 1.0 - (1.0 - r0) * (budget / max(kept, 1)) * 0.95
                    r2 = min(max(r2, min(r0 + 0.05, 0.999)), 0.999)
                    logger.warning(
                        "request %d compacted to %d slots but needs %d > "
                        "capacity %d — retrying once at compression_ratio "
                        "%.3f", adm["req_idx"], kept,
                        kept + req.max_new_tokens + 1, self.capacity, r2,
                    )
                    self._retry_pending.append(dict(
                        req_idx=adm["req_idx"], req=req,
                        press=_with_ratio(self.press, r2),
                    ))
                    self._retries += 1
                    return
                logger.warning(
                    "request %d still needs %d > capacity %d after the "
                    "clamped retry — dropped (empty answer); raise capacity "
                    "or compress more", adm["req_idx"],
                    kept + req.max_new_tokens + 1, self.capacity,
                )
                self._dropped.append(adm["req_idx"])
                return
            raise AssertionError(
                f"request needs {kept + req.max_new_tokens + 1} slots, "
                f"capacity is {self.capacity} — raise capacity or compress "
                "more"
            )
        if self._t_run_start is not None:
            # TTFT (queueing included — every request is available at run
            # start): recorded only when the admission actually goes live —
            # a dropped/retried attempt yielded no first token and must not
            # skew the percentiles.
            import time as _time

            self._ttfts.append(_time.perf_counter() - self._t_run_start)
        self.live[slot] = True
        st = self.slots[slot]
        st.req_idx = adm["req_idx"]
        st.generated = [first]
        st.budget = req.max_new_tokens
        st.in_flight = 0
        st.done_at = 1 if first in self.eos_ids else None
        if self._on_token is not None:
            self._on_token(adm["req_idx"], first, 1)

    def _admit(self, slot: int, req_idx: int, req: Request):
        self._complete_admission(self._issue_admission(slot, req_idx, req))
        while self._retry_pending:        # synchronous retry (run() drives
            r = self._retry_pending.pop(0)  # retries through its own loop)
            self._complete_admission(self._issue_admission(
                slot, r["req_idx"], r["req"], press=r["press"], retried=True
            ))

    # ---------------- main loop ---------------- #

    def run(self, requests: list[Request], progress: bool = False,
            on_token=None) -> list[list[int]]:
        """Serve every request; returns generated token lists (eos included,
        post-eos speculative tokens trimmed).

        ``on_token(req_idx, token_id, n_so_far)``: streaming callback fired
        as tokens DRAIN from the device (first token at admission
        completion, then one call per fetched decode token) — post-eos
        speculative tokens are never delivered, so the streamed sequence
        equals the returned answer exactly. The callback runs on the host
        loop between dispatches: keep it cheap (enqueue to your own
        channel) or it stalls the decode-issue pipeline.

        Liveness: a slot goes dead (no further steps issued for it) as soon
        as its token budget is fully *issued* or an eos is *observed* at
        drain time; it is retired — and its slot reusable — once every
        issued step has drained. The ≤fetch_lag speculative tokens issued
        between an eos being generated and observed land beyond the answer
        and are trimmed.
        """
        # max_new_tokens-aware admission: reject requests that cannot fit a
        # slot BEFORE any device work — the completion-time capacity assert
        # below fires after the over-budget cache is already in the slot
        # pool and leaves the engine unusable (advisor r2). The static
        # bound (press.max_kept) is conservative: a rejected request *might*
        # have fit after compression — raise capacity or compress more.
        # Compacting presses (KVzip/FastKVzip/AdaKV-family compact=True)
        # have no sound static kept bound below ctx (the global budget can
        # concentrate on one head), but their MEASURED kept is typically
        # ~(1-ratio)*ctx — the whole point of compaction is serving from
        # smaller slots. Admission is therefore OPTIMISTIC for them: only
        # the sound floor (question + generation) is pre-checked, and a
        # request whose compacted cache still exceeds the slot is DROPPED
        # cleanly at completion (empty answer + warning, slot reused) —
        # never the old engine-breaking assert.
        optimistic = (
            self.press is not None
            and getattr(self.press, "compact", False)
            and self.runner.cfg.sliding_window is None
        )
        too_big = [
            i for i, r in enumerate(requests)
            if (len(r.question_ids) + r.max_new_tokens + 1 >= self.capacity
                if optimistic else self._slots_needed(r) > self.capacity)
        ]
        if too_big:
            raise ValueError(
                f"requests {too_big} cannot fit capacity={self.capacity}: "
                "static bound kept + question + max_new_tokens + 1 exceeds "
                "the slot — raise capacity or compress more"
            )
        import time as _time

        t_start = _time.perf_counter()
        self._t_run_start = t_start
        self._on_token = on_token
        self._ttfts: list[float] = []
        hits0 = self.ctx_hits
        skipped0 = self._skipped_ctx_tokens
        n_steps = 0
        answers: list[Optional[list]] = [None] * len(requests)
        self._dropped = []
        self._retry_pending = []
        self._retries = 0
        queue = list(range(len(requests)))
        pending: list[tuple[jax.Array, np.ndarray]] = []  # (tokens, live snapshot)
        admits: list[dict] = []      # issued-but-not-completed admissions
        inflight: list[dict] = []    # chunk-interleaved admissions in progress
        rr = 0                       # round-robin cursor over inflight
        reserved: set[int] = set()   # slots held by in-flight admissions
        drain_times: list[float] = []   # per-step fetch timestamps (gap stats)

        def drain_one():
            toks, live_snap = pending.pop(0)
            host = np.asarray(jax.device_get(toks))
            drain_times.append(_time.perf_counter())
            for s in range(self.n_slots):
                if not live_snap[s]:
                    continue
                st = self.slots[s]
                st.in_flight -= 1
                if st.req_idx < 0:
                    continue
                st.generated.append(int(host[s]))
                if st.done_at is None and int(host[s]) in self.eos_ids:
                    st.done_at = len(st.generated)
                    self.live[s] = False
                if on_token is not None and (
                    st.done_at is None or len(st.generated) <= st.done_at
                ) and len(st.generated) <= st.budget:
                    on_token(st.req_idx, int(host[s]), len(st.generated))

        def finish(s: int):
            st = self.slots[s]
            n = st.done_at if st.done_at is not None else st.budget
            answers[st.req_idx] = st.generated[:n]
            if progress:
                print(f"finished request {st.req_idx} "
                      f"({len(answers[st.req_idx])} tokens)", flush=True)
            self.slots[s] = _SlotState()

        # Loop until every admitted request is *retired* (not merely until
        # pending drains — the final drain must still be followed by a
        # retirement sweep).
        while (queue or admits or inflight or self._retry_pending
               or any(st.req_idx >= 0 for st in self.slots)):
            while len(pending) > self.fetch_lag:
                drain_one()
            for s in range(self.n_slots):
                st = self.slots[s]
                if st.req_idx >= 0 and not self.live[s] and st.in_flight == 0:
                    finish(s)
            # Admission-time host overlap: dispatch every free slot's prefill
            # back-to-back with NO host sync (the device queue stays full);
            # the blocking kept/first fetch happens in _complete_admission
            # below, AFTER this iteration's decode-step issue, so the
            # round-trip overlaps queued decode compute.
            for s in range(self.n_slots):
                if (self.max_admissions is not None
                        and len(reserved) >= self.max_admissions):
                    break
                if (self.slots[s].req_idx < 0 and s not in reserved
                        and (queue or self._retry_pending)):
                    if self._retry_pending:
                        # Capacity-clamped retries first: their request is
                        # already partially paid for and blocks an answer.
                        r = self._retry_pending.pop(0)
                        idx, req, press, retried = (
                            r["req_idx"], r["req"], r["press"], True
                        )
                    else:
                        if self.schedule == "sjf":
                            # shortest job first: smallest token budget wins
                            # (tie-break on context length — shorter prefill)
                            pos = min(
                                range(len(queue)),
                                key=lambda j: (
                                    requests[queue[j]].max_new_tokens,
                                    len(requests[queue[j]].context_ids),
                                ),
                            )
                        elif self.schedule == "priority":
                            # highest Request.priority first, fifo on ties
                            pos = min(
                                range(len(queue)),
                                key=lambda j: (
                                    -requests[queue[j]].priority, j
                                ),
                            )
                        else:
                            pos = 0
                        idx = queue.pop(pos)
                        req, press, retried = requests[idx], _UNSET, False
                    if self.interleave:
                        inflight.append(dict(
                            slot=s, req_idx=idx, req=req, retried=retried,
                            gen=self._prefill_issue_steps(req, press),
                        ))
                    else:
                        admits.append(self._issue_admission(
                            s, idx, req, press=press, retried=retried))
                    reserved.add(s)
                    if progress:
                        print(f"admitting request {idx} -> slot {s}",
                              flush=True)
            # Chunk-interleaved admission: advance exactly ONE in-flight
            # admission by one dispatch unit (one prefill chunk / compressed
            # layer) per loop iteration — round-robin across admissions — so
            # this iteration's decode step lands between chunk programs in
            # the device queue and live slots' inter-token stall is bounded
            # by ~one chunk REGARDLESS of how many admissions are in flight
            # (advancing every admission per iteration made the stall ~k
            # chunks at k concurrent admissions; Sarathi-style scheduling,
            # arXiv:2308.16369).
            if inflight:
                rr %= len(inflight)
                st = inflight[rr]
                try:
                    next(st["gen"])
                    rr += 1
                except StopIteration as stop:
                    cache, kept_arr, first_arr, lru_key = stop.value
                    inflight.remove(st)
                    admits.append(self._insert_admitted(
                        st["slot"], st["req_idx"], st["req"],
                        cache, kept_arr, first_arr, lru_key,
                        retried=st.get("retried", False)))
            if any(self.live):
                # A FRESH buffer every issue: jnp.asarray of a numpy array
                # can be ZERO-COPY on the CPU backend, and self.live is
                # mutated in place below while issued steps are still in
                # flight (fetch-lag pipelining) — an aliased buffer makes a
                # pending step read the POST-mutation liveness, freeze the
                # slot's length/offset one step early, and corrupt the final
                # token (observed: last-token-only nondeterministic
                # divergences on the virtual CPU mesh).
                live_dev = jnp.asarray(np.array(self.live))
                step_arr = None
                if self.do_sample:
                    step_arr = jnp.asarray(self._step_i, jnp.int32)
                    self._step_i += 1
                self.tokens, self.sc, self.dp_state = _decode_step(
                    self.params, self.tokens, self.sc, live_dev,
                    self.dp_state, self._step_key if self.do_sample else None,
                    step_arr,
                    runner=self.runner, decode_press=self.decode_press,
                    do_sample=self.do_sample, temperature=self.temperature,
                    top_p=self.top_p,
                )
                n_steps += 1
                snap = self.live.copy()
                pending.append((self.tokens, snap))
                for s in range(self.n_slots):
                    if snap[s]:
                        st = self.slots[s]
                        st.in_flight += 1
                        if len(st.generated) + st.in_flight >= st.budget:
                            self.live[s] = False   # budget fully issued
            elif pending and not admits and not inflight:
                drain_one()
            for adm in admits:
                self._complete_admission(adm)
                reserved.discard(adm["slot"])
                if progress:
                    print(f"admitted request {adm['req_idx']} -> "
                          f"slot {adm['slot']}", flush=True)
            admits.clear()
        wall = _time.perf_counter() - t_start
        for i in self._dropped:
            answers[i] = []          # dropped at optimistic admission
        gen = sum(len(a) for a in answers)
        # Context tokens skipped by LRU hits were never forwarded —
        # processed_tok_s must reflect device work actually done, not the
        # nominal workload size (advisor r3).
        skipped = self._skipped_ctx_tokens - skipped0
        proc = gen + sum(
            len(r.context_ids) + len(r.question_ids) for r in requests
        ) - skipped
        self.last_stats = {
            "wall_s": wall,
            "requests": len(requests),
            "generated_tokens": gen,
            "generated_tok_s": gen / wall if wall > 0 else float("inf"),
            "processed_tokens": proc,
            "processed_tok_s": proc / wall if wall > 0 else float("inf"),
            "decode_steps": n_steps,
            "slot_step_utilization": (
                gen / (n_steps * self.n_slots) if n_steps else 0.0
            ),
            "ctx_hits": self.ctx_hits - hits0,
            "skipped_context_tokens": skipped,
            "dropped_requests": len(self._dropped),
            # Which requests were dropped (callers can retry them against a
            # larger-capacity engine — a [] answer alone is indistinguishable
            # from a genuine zero-token generation, advisor r4) and how many
            # optimistic admissions went through the capacity-clamped retry.
            "dropped": list(self._dropped),
            "retried_admissions": self._retries,
            # Context-LRU footprint: entries × their (measured-shrunk)
            # buffer bytes — the capacity cost of compress-once-serve-many.
            "lru_entries": len(self._ctx_lru),
            "lru_bytes": sum(
                sum(x.nbytes for x in jax.tree_util.tree_leaves(entry))
                for entry, _ in self._ctx_lru.values()
            ),
        }
        # Inter-token stall profile: gaps between consecutive step fetches.
        # The max gap is the latency a live slot saw across a concurrent
        # admission — the number interleave= exists to shrink.
        gaps = sorted(b - a for a, b in zip(drain_times, drain_times[1:]))
        if gaps:
            self.last_stats["p50_intertoken_gap_s"] = gaps[len(gaps) // 2]
            self.last_stats["p99_intertoken_gap_s"] = gaps[
                min(len(gaps) - 1, int(len(gaps) * 0.99))
            ]
            self.last_stats["max_intertoken_gap_s"] = gaps[-1]
        if self._ttfts:
            ts = sorted(self._ttfts)
            self.last_stats["p50_ttft_s"] = ts[len(ts) // 2]
            self.last_stats["p99_ttft_s"] = ts[
                min(len(ts) - 1, int(len(ts) * 0.99))
            ]
            self.last_stats["max_ttft_s"] = ts[-1]
        self._t_run_start = None
        self._on_token = None
        return answers
