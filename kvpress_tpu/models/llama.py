"""Functional Llama-family decoder (Llama/Mistral/Qwen2/Qwen3/Phi3/Gemma-ish).

One scan over stacked layer weights replaces the reference's reliance on HF
module forward hooks: the press is invoked *inside* the layer body during
prefill, with full access to hidden states, pre/post-RoPE Q/K and (optionally)
attention probabilities — everything the reference reconstructs per-press via
``kvpress/utils.py:12-95`` re-projections.

Weights are stored stacked over layers: (L, …) leading axis, so the whole
model is a single `lax.scan` — compile-friendly and trivially shardable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import KVCache, append_layer_kv, init_cache
from ..config import ModelConfig
from ..ops.attention import attention_bias, gqa_attention, quant_gqa_attention
from ..presses.base import BasePress, LayerCtx
from ..rope import apply_rope, compute_inv_freq, rope_cos_sin


def rms_norm(x: jax.Array, w: jax.Array, eps: float, one_offset: bool = False):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    weight = (1.0 + w.astype(jnp.float32)) if one_offset else w.astype(jnp.float32)
    return (normed * weight).astype(x.dtype)


def _act(x: jax.Array, kind: str) -> jax.Array:
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(kind)


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random init (for the tiny-model unit-test substrate, SURVEY §4)."""
    E, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Hq, Hkv, D, V = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
    ks = jax.random.split(key, 16)
    init = lambda k, shape, scale=0.02: (
        jax.random.normal(k, shape, jnp.float32) * scale
    ).astype(dtype)
    layers = {
        "wq": init(ks[0], (L, E, Hq * D)),
        "wk": init(ks[1], (L, E, Hkv * D)),
        "wv": init(ks[2], (L, E, Hkv * D)),
        "wo": init(ks[3], (L, Hq * D, E)),
        "wg": init(ks[4], (L, E, F)),
        "wu": init(ks[5], (L, E, F)),
        "wd": init(ks[6], (L, F, E)),
        "ln1": jnp.ones((L, E), dtype),
        "ln2": jnp.ones((L, E), dtype),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, Hq * D), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * D), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * D), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)
    if cfg.post_norms:
        layers["ln1_post"] = jnp.ones((L, E), dtype)
        layers["ln2_post"] = jnp.ones((L, E), dtype)
    params = {
        "embed": init(ks[7], (V, E)),
        "ln_f": jnp.ones((E,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init(ks[8], (E, V))
    return params


def _lin(h: jax.Array, layer: dict, name: str) -> jax.Array:
    """h @ layer[name], reading int8/int4-quantized weights directly.

    Weight-int8 is the TPU-native counterpart of the reference's FP8 models
    (evaluate.py:370-372, FineGrainedFP8Config): v5e has no fp8 MXU, but XLA
    fuses the int8→bf16 convert into the dot's operand read (measured on the
    KV path, tools/probe_quant_xla.py), so int8 weights halve the weight HBM
    traffic that bounds decode. Scales are per-output-channel:
    ``w ≈ w_int8 * scale[None, :]`` and ``(h @ w_int8) * scale``.

    Weight-int4 (uint8 payload) packs contraction-dim halves into nibbles
    — concatenated halves like the int4 KV cache (cache.py:111-114) — and
    computes two scaled half-width dots with per-half, per-output-channel
    scales (2-group quantization, nearly free). Native-s4 dots miscompile on
    the axon backend (CLAUDE.md round-2 warning); unpack→astype→dot is the
    fastest *correct* path."""
    w = layer[name]
    scale = layer.get(name + "_scale")
    if scale is None:
        return h @ w
    if w.dtype == jnp.uint8:               # int4: (in/2, out) nibble-packed
        E2 = w.shape[-2]
        lo = (w & 0xF).astype(h.dtype) - jnp.asarray(8, h.dtype)
        hi = (w >> 4).astype(h.dtype) - jnp.asarray(8, h.dtype)
        s_lo, s_hi = scale[..., 0, :], scale[..., 1, :]     # (..., out)
        return (
            (h[..., :E2] @ lo) * s_lo.astype(h.dtype)
            + (h[..., E2:] @ hi) * s_hi.astype(h.dtype)
        )
    return (h @ w.astype(h.dtype)) * scale.astype(h.dtype)


def quantize_params_int8(params: dict, include_embeddings: bool = False) -> dict:
    """Per-output-channel int8 quantization of the layer matmuls (norms stay
    bf16). Output params run through the same Runner — ``_lin`` dequantizes
    inside the dot.

    ``include_embeddings=True`` also quantizes the token embedding (per-ROW
    scales, so a gathered row dequantizes with its own scale, and the tied
    lm_head's transposed use sees the same per-output-channel scale) and the
    untied lm_head (per-output-channel). Worth it for large-vocab models
    where embed+head are a large share of decode weight HBM traffic (e.g.
    0.5 GB bf16 each at 128K vocab; reference FP8 analogue, evaluate.py
    FineGrainedFP8Config)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "wg", "wu", "wd"):
        w = layers[name].astype(jnp.float32)                 # (L, in, out)
        amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)    # (L, 1, out)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        layers[name] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        layers[name + "_scale"] = scale.astype(jnp.float32)
    out["layers"] = layers
    if include_embeddings:
        emb = params["embed"].astype(jnp.float32)            # (V, E)
        amax = jnp.max(jnp.abs(emb), axis=1, keepdims=True)  # (V, 1)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        out["embed"] = jnp.clip(
            jnp.round(emb / scale), -127, 127
        ).astype(jnp.int8)
        out["embed_scale"] = scale.astype(jnp.float32)
        if "lm_head" in params:
            w = params["lm_head"].astype(jnp.float32)        # (E, V)
            amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, V)
            scale = jnp.maximum(amax / 127.0, 1e-8)
            out["lm_head"] = jnp.clip(
                jnp.round(w / scale), -127, 127
            ).astype(jnp.int8)
            out["lm_head_scale"] = scale.astype(jnp.float32)
    return out


def dequant_weight(layer: dict, name: str, dtype=jnp.float32) -> jax.Array:
    """Full-precision view of one (possibly int8/int4-quantized) weight
    matrix — for press scoring that needs the actual matrix (CriticalKV's
    ‖Wo·v‖, KVzip+ normalization), where scales must be applied (payload
    values alone are per-channel mis-scaled). Works on a per-layer slice
    (inside the layer scan) or the stacked (L, …) form."""
    w = layer[name]
    scale = layer.get(name + "_scale")
    if scale is None:
        return w.astype(dtype)
    if w.dtype == jnp.uint8:              # int4 concat-halves (see _lin)
        eight = jnp.asarray(8, dtype)
        lo = ((w & 0xF).astype(dtype) - eight) * scale[..., 0, :].astype(dtype)[..., None, :]
        hi = ((w >> 4).astype(dtype) - eight) * scale[..., 1, :].astype(dtype)[..., None, :]
        return jnp.concatenate([lo, hi], axis=-2)
    return w.astype(dtype) * scale.astype(dtype)


def quantize_params_int4(params: dict) -> dict:
    """Per-output-channel, per-contraction-half int4 quantization of the
    layer matmuls (norms/embeddings stay as-is — compose with
    quantize_params_int8(include_embeddings=True) applied FIRST for int8
    embeddings). Payload layout matches the int4 KV cache: contraction-dim
    halves packed as nibbles in uint8 (cache.py:111-114); scales are
    (L, 2, out) — one per half. Counterpart of quanto int4 *weights*
    (beyond the reference's FP8-weights flag, evaluate.py:370-372)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "wg", "wu", "wd"):
        w = layers[name]
        if w.dtype == jnp.int8:           # already int8: dequant first
            w = w.astype(jnp.float32) * layers[name + "_scale"]
        w = w.astype(jnp.float32)                            # (L, in, out)
        I2 = w.shape[1] // 2
        halves = jnp.stack([w[:, :I2], w[:, I2:]], axis=1)   # (L, 2, I2, out)
        amax = jnp.max(jnp.abs(halves), axis=2)              # (L, 2, out)
        scale = jnp.maximum(amax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(halves / scale[:, :, None]), -8, 7) + 8
        q = q.astype(jnp.uint8)
        layers[name] = q[:, 0] | (q[:, 1] << 4)              # (L, in/2, out)
        layers[name + "_scale"] = scale.astype(jnp.float32)
    out["layers"] = layers
    return out


def init_params_int8(cfg: ModelConfig, key: jax.Array,
                     dtype=jnp.bfloat16, bits: int = 8,
                     int8_embeddings: bool = False) -> dict:
    """Random init DIRECTLY in int8/int4 payload + per-channel scale form.

    For benchmarking at scales where a bf16 init + quantize round-trip does
    not fit HBM (an 8B-class model is 14.5 GB bf16 + 7.25 GB int8 during
    conversion on a 16 GB chip). Matches the layout quantize_params_int8 /
    quantize_params_int4 produce, so the same Runner serves it; ``dtype``
    sets the compute dtype via the norm weights.
    ``int8_embeddings=True`` also emits int8 embed/lm_head payloads
    (per-row / per-output-channel scales, the quantize_params_int8
    include_embeddings layout) — the full-vocab (128,256) Llama-3.1-8B
    bench needs it: bf16 embed+head alone are 2.1 GB. Reference scale
    analogue: notebooks/speed_and_memory.ipynb measures Llama-3.1-8B."""
    E, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Hq, Hkv, D, V = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
    ks = jax.random.split(key, 16)

    def qinit(k, shape, scale=0.02):
        if bits == 4:
            payload = jax.random.randint(
                k, (shape[0], shape[1] // 2, shape[2]), 0, 256, jnp.int32
            ).astype(jnp.uint8)
            s = jnp.full((shape[0], 2, shape[2]), scale / 7.0, jnp.float32)
            return payload, s
        payload = jax.random.randint(k, shape, -127, 128, jnp.int8)
        s = jnp.full((shape[0], 1, shape[2]), scale / 127.0, jnp.float32)
        return payload, s

    layers = {}
    for i, name in enumerate(("wq", "wk", "wv", "wo", "wg", "wu", "wd")):
        shape = {
            "wq": (L, E, Hq * D), "wk": (L, E, Hkv * D), "wv": (L, E, Hkv * D),
            "wo": (L, Hq * D, E), "wg": (L, E, F), "wu": (L, E, F),
            "wd": (L, F, E),
        }[name]
        layers[name], layers[name + "_scale"] = qinit(ks[i], shape)
    layers["ln1"] = jnp.ones((L, E), dtype)
    layers["ln2"] = jnp.ones((L, E), dtype)
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, Hq * D), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * D), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * D), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)
    if cfg.post_norms:
        layers["ln1_post"] = jnp.ones((L, E), dtype)
        layers["ln2_post"] = jnp.ones((L, E), dtype)
    params = {
        "ln_f": jnp.ones((E,), dtype),
        "layers": layers,
    }
    if int8_embeddings:
        params["embed"] = jax.random.randint(ks[7], (V, E), -127, 128,
                                             jnp.int32).astype(jnp.int8)
        params["embed_scale"] = jnp.full((V, 1), 0.02 / 127.0, jnp.float32)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jax.random.randint(
                ks[8], (E, V), -127, 128, jnp.int32
            ).astype(jnp.int8)
            params["lm_head_scale"] = jnp.full((1, V), 0.02 / 127.0,
                                               jnp.float32)
    else:
        params["embed"] = (
            jax.random.normal(ks[7], (V, E), jnp.float32) * 0.02
        ).astype(dtype)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = (
                jax.random.normal(ks[8], (E, V), jnp.float32) * 0.02
            ).astype(dtype)
    return params


def param_dtype(params: dict):
    """The model's compute dtype — read from a norm weight, NOT the embedding
    (which may be int8-quantized)."""
    return params["ln_f"].dtype


def embed_tokens(params: dict, ids: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Token embedding lookup, dequantizing per-row int8 embeddings when
    present (gather the int8 rows + their scales — V×E never dequantizes in
    full)."""
    emb = params["embed"]
    x = emb[ids]
    if emb.dtype == jnp.int8:
        dt = param_dtype(params)
        x = x.astype(dt) * params["embed_scale"][ids].astype(dt)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    return x


def lm_head_logits(x: jax.Array, params: dict, cfg: ModelConfig) -> jax.Array:
    """Final-norm'd hidden → f32 logits (+softcap), reading int8 lm_head /
    tied-embedding payloads directly (XLA fuses the convert into the dot's
    operand read, same as ``_lin``)."""
    head = params.get("lm_head")
    if head is not None:
        logits = (x @ head.astype(x.dtype)).astype(jnp.float32)
        scale = params.get("lm_head_scale")
        if scale is not None and head.dtype == jnp.int8:
            logits = logits * scale.astype(jnp.float32)
    else:
        emb = params["embed"]
        logits = (x @ emb.T.astype(x.dtype)).astype(jnp.float32)
        if emb.dtype == jnp.int8:
            # tied head: per-row embed scale == per-output-channel head scale
            logits = logits * params["embed_scale"][:, 0].astype(jnp.float32)
    if cfg.logit_softcap:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    return logits


def _project_qkv(layer: dict, cfg: ModelConfig, h: jax.Array):
    """h (B,S,E) → q (B,Hq,S,D), k/v (B,Hkv,S,D); pre-RoPE, post qk-norm."""
    B, S, _ = h.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _lin(h, layer, "wq")
    k = _lin(h, layer, "wk")
    v = _lin(h, layer, "wv")
    if cfg.attention_bias:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    q = q.reshape(B, S, Hq, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, cfg.rms_one_offset)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, cfg.rms_one_offset)
    return q, k, v


@dataclasses.dataclass(frozen=True)
class Runner:
    """Jit-static bundle: config + host RoPE constants + attention impl."""
    cfg: ModelConfig
    attention_scaling: float
    # "flash": Pallas kernel for multi-token calls (TPU); "xla": jnp reference.
    attn_impl: str = "xla"
    # Route few-token calls through ops/decode.py (block-skipping, fused
    # dequant). Only meaningful with attn_impl="flash". Default OFF: at the
    # flagship b4/32K shape the kernel's (B, Hkv, nb) grid pays per-cell
    # Mosaic overhead on tiny (G*T)-row matmuls and loses to the XLA dense
    # path e2e (tools/bench_decode_e2e.py: 94 vs 285 tok/s bf16) — opt in
    # for quantized/masked caches until the fewer-bigger-cells rework wins.
    decode_kernel: bool = False
    decode_block_k: int = 2048
    # Per-head-length decode attention (ops/decode_headwise.py) for caches
    # with per-head live prefixes (AdaKV/Duo/KVzip compact=True): each
    # (b, h) cell walks only its own prefix blocks — HBM traffic Σ_h len_h
    # instead of H·max_len. Only meaningful with attn_impl="flash"; applies
    # to single-token bf16 decode on non-sliding models.
    headwise_kernel: bool = False

    @staticmethod
    def create(
        cfg: ModelConfig, attn_impl: str = "auto", decode_kernel: bool = False,
        decode_block_k: int = 2048, headwise_kernel: bool = False,
    ) -> "Runner":
        _, scaling = compute_inv_freq(cfg)
        if attn_impl == "auto":
            attn_impl = "flash" if jax.default_backend() not in ("cpu",) else "xla"
        return Runner(
            cfg=cfg, attention_scaling=scaling, attn_impl=attn_impl,
            decode_kernel=decode_kernel, decode_block_k=decode_block_k,
            headwise_kernel=headwise_kernel,
        )

    def inv_freq(self) -> jax.Array:
        inv, _ = compute_inv_freq(self.cfg)
        return jnp.asarray(inv)

    def inv_freq_local(self) -> Optional[jax.Array]:
        """Sliding-window layers' RoPE (Gemma3 rope_local_base_freq): plain
        base frequency, no scaling."""
        if self.cfg.rope_local_base_freq is None:
            return None
        local_cfg = dataclasses.replace(
            self.cfg, rope_theta=self.cfg.rope_local_base_freq, rope_scaling=None
        )
        inv, _ = compute_inv_freq(local_cfg)
        return jnp.asarray(inv)

    # ------------------------------------------------------------------ #

    def _layer_step(
        self,
        x: jax.Array,                  # (B, T, E)
        layer: dict,
        cache_layer: dict,             # keys/values/length/mask for this layer
        positions: jax.Array,          # (B, T)
        inv_freq: jax.Array,
        layer_idx: jax.Array,
        sliding_flag: jax.Array,       # () bool
        press: Optional[BasePress],
        press_state,
        phase: str,
        valid_len: Optional[jax.Array] = None,
        kv_bits: int = 8,
        extra_allow: Optional[jax.Array] = None,   # (B, T, S_buf) image spans
        img_groups: Optional[jax.Array] = None,    # (B, T) ids (flash path)
        image_span: Optional[int] = None,          # static span bound
    ):
        cfg = self.cfg
        apply_press = press is not None and (
            (phase == "prefill" and press.compresses_prefill)
            or (phase == "decode" and press.compresses_decode)
        )
        B, T, E = x.shape
        h = rms_norm(x, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        cos, sin = rope_cos_sin(inv_freq, positions, self.attention_scaling)
        if cfg.rope_local_base_freq is not None:
            # Gemma3: sliding-window layers rotate at the local base frequency.
            cos_l, sin_l = rope_cos_sin(self.inv_freq_local(), positions, 1.0)
            cos = jnp.where(sliding_flag, cos_l, cos)
            sin = jnp.where(sliding_flag, sin_l, sin)
        cos, sin = cos[:, None], sin[:, None]          # (B, 1, T, D)
        q = apply_rope(q_pre, cos, sin)
        k = apply_rope(k_pre, cos, sin)

        prior_len = cache_layer["length"]
        quantized = cache_layer.get("key_scales") is not None
        # DecodingPress-family presses compress the payload buffers directly
        # (dequant only inside their interval cond) — the dense buffer never
        # needs to exist for them (see decode_compress_quantized).
        quant_press_decode = (
            quantized
            and apply_press
            and phase == "decode"
            and getattr(press, "supports_quantized_decode", False)
        )

        scale = (
            cfg.query_pre_attn_scalar ** -0.5
            if cfg.query_pre_attn_scalar is not None
            else cfg.head_dim ** -0.5
        )
        window = cfg.sliding_window if cfg.sliding_window is not None else None
        use_sliding = window is not None
        return_probs = press is not None and apply_press and press.wants_probs(T)

        # Few-token calls (decode loop, question forward) route to the fused
        # decode kernel: reads only live KV tiles (block skipping over the
        # keep-mask) at payload width (int8/int4 dequant fused in) — the
        # decode-bandwidth win the reference's fake eviction / quanto full
        # dequant can't have (VERDICT r1 items 1-2).
        G = cfg.num_heads // cfg.num_kv_heads
        use_decode_kernel = (
            self.attn_impl == "flash"
            and self.decode_kernel
            and not return_probs
            and T <= 128
            and T * G <= 512
            # bucketed calls: prior = length - T no longer holds
            and valid_len is None
        )
        # Per-head-prefix decode kernel: T=1 only (appended tokens absorbed
        # into an all-True prefix would defeat its tail-causality handling).
        use_headwise = (
            self.attn_impl == "flash"
            and self.headwise_kernel
            and not use_decode_kernel
            and not return_probs
            and not apply_press
            and not quantized
            and T == 1
            and valid_len is None
            and not use_sliding
        )

        if quantized:
            # int storage: quantize the new K/V and store payload+scales. The
            # whole buffer is dequantized only when dense K/V are actually
            # needed (press compression or a non-kernel attention path) —
            # reference QuantizedCache interplay, base_press.py:152-157.
            from ..cache import dequantize_kv, quantize_kv

            qk, k_scale = quantize_kv(k, kv_bits)
            qv, v_scale = quantize_kv(v, kv_bits)
            qkeys = jax.lax.dynamic_update_slice_in_dim(
                cache_layer["keys"], qk, prior_len, axis=2
            )
            qvalues = jax.lax.dynamic_update_slice_in_dim(
                cache_layer["values"], qv, prior_len, axis=2
            )
            key_scales = jax.lax.dynamic_update_slice_in_dim(
                cache_layer["key_scales"], k_scale, prior_len, axis=2
            )
            value_scales = jax.lax.dynamic_update_slice_in_dim(
                cache_layer["value_scales"], v_scale, prior_len, axis=2
            )
            new_len = prior_len + T
            # Multi-token flash over the payload (fused dequant): pressless
            # prefill/question forwards and quant-decode-press chunks read
            # the cache at payload width — the dequantized buffer never
            # exists (ops/flash.flash_attention_quant). int8 only: measured
            # speed == bf16 (prefill attention is MXU-bound, the int8 read
            # is free); int4's two half-depth nibble dots are ~30% SLOWER at
            # multi-token shapes (round 3, probe_quant_prefill), so int4
            # keeps the dense-dequant path here — the memory-bound chunked
            # path (_chunk_forward_lean) still fuses int4.
            use_quant_flash = (
                self.attn_impl == "flash" and T > 1
                and kv_bits == 8
                and img_groups is None
                and not use_decode_kernel
                and not return_probs
                and not (apply_press and not quant_press_decode)
                and not (press is not None and apply_press
                         and press.wants_lse(T))
            )
            needs_dense = (
                (apply_press and not quant_press_decode)
                or return_probs
                or (self.attn_impl == "flash" and T > 1
                    and not use_decode_kernel and not use_quant_flash)
            )
            if needs_dense:
                keys = dequantize_kv(qkeys, key_scales, kv_bits, x.dtype)
                values = dequantize_kv(qvalues, value_scales, kv_bits, x.dtype)
                # The current block attends (and is scored on) its ORIGINAL
                # bf16 values — quantization is storage-only for the pass
                # that produced the tokens, exactly the reference's
                # QuantizedCache.update semantics (past dequantized, current
                # fresh). Also keeps the single-device prefill bit-consistent
                # with the context-parallel one (ring attention on fresh k/v,
                # quantize at store).
                keys = jax.lax.dynamic_update_slice_in_dim(
                    keys, k.astype(keys.dtype), prior_len, axis=2
                )
                values = jax.lax.dynamic_update_slice_in_dim(
                    values, v.astype(values.dtype), prior_len, axis=2
                )
            else:
                # Attention reads the payload directly (decode kernel or
                # quant_gqa_attention) — the dequantized buffer never exists,
                # so decode HBM traffic is payload-width (the quanto-int4
                # bandwidth win, done the XLA way; VERDICT r1 item 1).
                keys = values = None
        else:
            keys, values, new_len = append_layer_kv(
                cache_layer["keys"], cache_layer["values"], prior_len, k, v
            )
        if valid_len is not None:
            # Bucketed prefill: only the first valid_len of the T tokens are
            # real; pad slots stay beyond the valid length.
            new_len = prior_len + valid_len
        mask = cache_layer["mask"]                     # (B, Hkv, S_buf)
        # Newly appended tokens are always attendable by every head — the
        # append region may overlap slots a head-compacting press marked dead.
        mask = jax.lax.dynamic_update_slice_in_dim(
            mask, jnp.ones((B, cfg.num_kv_heads, T), bool), prior_len, axis=2
        )

        use_flash = (
            self.attn_impl == "flash" and not return_probs and T > 1
            and not use_decode_kernel
        )
        assert (extra_allow is None and img_groups is None) or not (
            use_decode_kernel or use_headwise
        ), (
            "bidirectional image-span attention (token_types) is a prefill "
            "feature — decode kernels do not support it"
        )
        if use_headwise:
            from ..ops.decode_headwise import (
                decode_attention_headwise, prefix_tail_from_mask,
            )

            pfx, t_start, t_len = prefix_tail_from_mask(mask, new_len)
            attn_out = decode_attention_headwise(
                q, keys, values, pfx, t_start, t_len,
                sm_scale=scale, softcap=cfg.logit_softcap,
                block_k=self.decode_block_k,
            )
            probs = None
            attn_lse = None
        elif use_decode_kernel:
            from ..ops.decode import decode_attention

            if quantized:
                def _dk(win):
                    return decode_attention(
                        q, qkeys, qvalues, new_len, key_scales, value_scales,
                        mask, bits=kv_bits, sm_scale=scale,
                        softcap=cfg.logit_softcap, window=win,
                        block_k=self.decode_block_k,
                    )
            else:
                def _dk(win):
                    return decode_attention(
                        q, keys, values, new_len, mask=mask, sm_scale=scale,
                        softcap=cfg.logit_softcap, window=win,
                        block_k=self.decode_block_k,
                    )

            if use_sliding:
                attn_out = jax.lax.cond(
                    sliding_flag, lambda: _dk(window), lambda: _dk(None)
                )
            else:
                attn_out = _dk(None)
            probs = None
            attn_lse = None
        elif use_flash:
            from ..ops.flash import flash_attention, flash_attention_quant

            want_lse = (
                press is not None and apply_press and press.wants_lse(T)
            )

            if quantized and keys is None:
                def _flash(win):
                    return flash_attention_quant(
                        q, qkeys, qvalues, key_scales, value_scales,
                        prior_len, mask, bits=kv_bits, sm_scale=scale,
                        softcap=cfg.logit_softcap, window=win,
                    )
            else:
                kg = None
                if img_groups is not None:
                    # prefill-from-empty contract: token position == slot
                    S_buf_f = keys.shape[2]
                    kg = jnp.pad(
                        img_groups, ((0, 0), (0, S_buf_f - T)),
                        constant_values=-1,
                    )

                def _flash(win):
                    return flash_attention(
                        q, keys, values, prior_len, mask,
                        q_groups=img_groups, k_groups=kg,
                        sm_scale=scale, softcap=cfg.logit_softcap, window=win,
                        or_span=image_span if img_groups is not None else None,
                        return_lse=want_lse,
                    )

            if use_sliding:
                res = jax.lax.cond(
                    sliding_flag,
                    lambda: _flash(window),
                    lambda: _flash(None),
                )
            else:
                res = _flash(None)
            attn_out, attn_lse = res if want_lse else (res, None)
            probs = None
        else:
            S_buf = (qkeys if keys is None else keys).shape[2]
            bias = attention_bias(
                prior_len,
                T,
                S_buf,
                sliding_window=None,
                head_mask=mask,
                extra_allow=extra_allow,
            )
            if use_sliding:
                # HF applies the image-span or-mask to the sliding mask too
                # (modeling_gemma3.py: mask_kwargs are shared).
                sl_bias = attention_bias(
                    prior_len, T, S_buf, sliding_window=window, head_mask=mask,
                    extra_allow=extra_allow,
                )
                bias = jnp.where(sliding_flag, sl_bias, bias)
            if quantized and keys is None:
                attn_out = quant_gqa_attention(
                    q, qkeys, qvalues, key_scales, value_scales, bias, scale,
                    kv_bits, softcap=cfg.logit_softcap,
                )
                probs = None
            else:
                attn_out, probs = gqa_attention(
                    q, keys, values, bias, scale,
                    softcap=cfg.logit_softcap, return_probs=return_probs,
                )
            attn_lse = None

        new_mask = mask
        new_state = press_state
        if apply_press:
            # Pre-press buffers, restored on sliding-window layers below.
            pk, pv = keys, values
            if quantized:
                pqk, pqv = qkeys, qvalues
                pks, pvs = key_scales, value_scales
            ctx = LayerCtx(
                layer_idx=layer_idx,
                hidden=h,
                queries=q,
                queries_prerope=q_pre,
                keys_prerope=k_pre,
                positions=positions,
                attn_probs=probs,
                layer_params=layer,
                inv_freq=inv_freq,
                cfg=cfg,
                attention_scaling=self.attention_scaling,
                kv_len=valid_len if phase == "prefill" else None,
                attn_lse=attn_lse,
            )
            if phase == "prefill":
                # Prefill into an empty cache: compress over the first T slots.
                ck, cv = keys[:, :, :T], values[:, :, :T]
                cm = mask[:, :, :T]
                nk, nv, nlen, nmask, new_state = press.layer_compress(
                    ctx, ck, cv, new_len, cm, press_state
                )
                keys = jax.lax.dynamic_update_slice_in_dim(keys, nk, 0, axis=2)
                values = jax.lax.dynamic_update_slice_in_dim(values, nv, 0, axis=2)
                new_mask = jax.lax.dynamic_update_slice_in_dim(mask, nmask, 0, axis=2)
            elif quant_press_decode:
                # Payload-width decode compression: the press gathers the
                # int8/int4 payloads + scales directly; dense K/V are built
                # only inside its interval cond (for scoring).
                (qkeys, qvalues, key_scales, value_scales, nlen, new_mask,
                 new_state) = press.decode_compress_quantized(
                    ctx, qkeys, qvalues, key_scales, value_scales, kv_bits,
                    new_len, mask, press_state,
                )
            else:
                # Decode-time: press sees the full padded buffers + traced
                # length (reference DecodingPress hook, decoding_press.py:113-179).
                keys, values, nlen, new_mask, new_state = press.decode_compress(
                    ctx, keys, values, new_len, mask, press_state
                )
            # Sliding-window (local) layers are never compressed
            # (reference base_press.py:195-200 skips them) — restore length,
            # mask AND buffer contents (the press gathered kept entries to
            # the buffer front; with the full length restored those slots
            # must hold the original keys, not the gathered subset).
            if cfg.sliding_window is not None:
                nlen = jnp.where(sliding_flag, new_len, nlen)
                new_mask = jnp.where(sliding_flag, mask, new_mask)
                if keys is not None:
                    keys = jnp.where(sliding_flag, pk, keys)
                    values = jnp.where(sliding_flag, pv, values)
                if quantized and quant_press_decode:
                    qkeys = jnp.where(sliding_flag, pqk, qkeys)
                    qvalues = jnp.where(sliding_flag, pqv, qvalues)
                    key_scales = jnp.where(sliding_flag, pks, key_scales)
                    value_scales = jnp.where(sliding_flag, pvs, value_scales)
            new_len = nlen

        if quantized:
            if apply_press and not quant_press_decode:
                # Press moved/merged entries in the DENSE buffer: requantize.
                qkeys2, key_scales = quantize_kv(keys, kv_bits)
                qvalues2, value_scales = quantize_kv(values, kv_bits)
                if cfg.sliding_window is not None:
                    # Sliding layers: keep the exact append-time payloads
                    # (no requant drift for untouched buffers).
                    qkeys2 = jnp.where(sliding_flag, pqk, qkeys2)
                    qvalues2 = jnp.where(sliding_flag, pqv, qvalues2)
                    key_scales = jnp.where(sliding_flag, pks, key_scales)
                    value_scales = jnp.where(sliding_flag, pvs, value_scales)
                out_keys, out_values = qkeys2, qvalues2
            else:
                # No press, or a payload-width decode press: keep the exact
                # payloads (no int8→f32→int8 drift; decode_compress_quantized
                # already updated qkeys/qvalues/scales in place).
                out_keys, out_values = qkeys, qvalues
            out_scales = dict(key_scales=key_scales, value_scales=value_scales)
        else:
            out_keys, out_values = keys, values
            out_scales = dict(key_scales=None, value_scales=None)

        o = _lin(attn_out.transpose(0, 2, 1, 3).reshape(B, T, -1), layer, "wo")
        if cfg.post_norms:
            o = rms_norm(o, layer["ln1_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        x = x + o

        h2 = rms_norm(x, layer["ln2"], cfg.rms_norm_eps, cfg.rms_one_offset)
        mlp = _act(_lin(h2, layer, "wg"), cfg.act) * _lin(h2, layer, "wu")
        mlp = _lin(mlp, layer, "wd")
        if cfg.post_norms:
            mlp = rms_norm(mlp, layer["ln2_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        x = x + mlp

        new_cache_layer = dict(
            keys=out_keys, values=out_values, length=new_len, mask=new_mask,
            **out_scales,
        )
        return x, new_cache_layer, new_state

    # ------------------------------------------------------------------ #

    def forward(
        self,
        params: dict,
        ids: jax.Array,                 # (B, T)
        cache: KVCache,
        press: Optional[BasePress] = None,
        press_state=None,
        phase: str = "none",
        compute_logits: bool = True,
        logits_last_only: bool = False,
        inputs_embeds: Optional[jax.Array] = None,   # (B, T, E) overrides ids
        valid_len: Optional[jax.Array] = None,       # () int32: bucketed prefill
        token_types: Optional[jax.Array] = None,     # (B, T) 1 = image token
        image_span: Optional[int] = None,            # static: the max image
        # span length (mm_tokens_per_image) — required on the flash path
    ):
        """Run T tokens through all layers against (and appending to) cache.

        Returns (logits|None, cache', press_state'). The press (if any and
        apply_press) compresses each layer's cache in the layer body — the
        functional analogue of the reference's prefill forward hook
        (base_press.py:101-162).

        ``valid_len`` enables bucketed prefill: ids are padded to a bucket
        size but only the first valid_len tokens are real. Causal slot
        masking already keeps valid queries away from pad keys (pads come
        after); cache length/offset advance by valid_len, presses receive
        ctx.kv_len, and last-position logits read slot valid_len-1.
        """
        cfg = self.cfg
        if inputs_embeds is not None:
            x = inputs_embeds
            B, T = x.shape[:2]
        else:
            B, T = ids.shape
            x = embed_tokens(params, ids, cfg)
        positions = cache.offset + jnp.arange(T, dtype=jnp.int32)
        positions = jnp.broadcast_to(positions[None], (B, T))
        inv_freq = self.inv_freq()

        L = cfg.num_layers
        S_buf = cache.max_size
        mask = cache.mask
        if mask is None:
            mask = jnp.ones((L, B, cfg.num_kv_heads, S_buf), bool)
        sliding = jnp.asarray(cfg.sliding_flags())
        layer_ids = jnp.arange(L, dtype=jnp.int32)

        # Gemma3 multimodal: tokens of the same image attend each other
        # bidirectionally (HF token_type_ids_mask_function semantics —
        # group ids from contiguous image runs; prefill-from-empty only, so
        # token position == cache slot). The XLA path gets an (B, T, S)
        # or-mask; the flash path gets group-id vectors + the static span
        # bound (the kernel extends its causal block skip by it).
        extra_allow = None
        img_groups = None
        if token_types is not None:
            is_img = jnp.asarray(token_types) == 1                  # (B, T)
            new_start = is_img & ~jnp.pad(is_img, ((0, 0), (1, 0)))[:, :-1]
            group = jnp.cumsum(new_start, axis=1) - 1
            group = jnp.where(is_img, group, -1)
            # A wants_probs press (ObservedAttention) routes every layer to
            # the dense fallback even on a flash runner — that path consumes
            # the (B, T, S) or-mask, so build it whenever any layer can go
            # dense, not only for attn_impl == "xla" (a flash runner that
            # silently dropped token_types was a confirmed parity bug).
            dense_layers = self.attn_impl == "xla" or (
                press is not None and press.wants_probs(T)
            )
            if dense_layers:
                ea = (group[:, :, None] >= 0) & (
                    group[:, :, None] == group[:, None, :]
                )                                                    # (B, T, T)
                extra_allow = jnp.pad(
                    ea, ((0, 0), (0, 0), (0, S_buf - T)),
                    constant_values=False,
                )
            if self.attn_impl != "xla":
                assert image_span is not None, (
                    "token_types on the flash path needs image_span "
                    "(mm_tokens_per_image) to bound the or-mask's reach"
                )
                img_groups = group.astype(jnp.int32)

        def body(carry, xs):
            xh = carry
            layer, ck, cv, clen, cmask, cks, cvs, lid, sflag, pstate = xs
            cache_layer = dict(
                keys=ck, values=cv, length=clen, mask=cmask,
                key_scales=cks, value_scales=cvs,
            )
            xh, ncl, nstate = self._layer_step(
                xh, layer, cache_layer, positions, inv_freq, lid, sflag,
                press, pstate, phase, valid_len, cache.bits,
                extra_allow=extra_allow, img_groups=img_groups,
                image_span=image_span,
            )
            return xh, (
                ncl["keys"], ncl["values"], ncl["length"], ncl["mask"],
                ncl["key_scales"], ncl["value_scales"], nstate,
            )

        xs = (
            params["layers"], cache.keys, cache.values, cache.length, mask,
            cache.key_scales, cache.value_scales,
            layer_ids, sliding, press_state,
        )
        x, (nkeys, nvalues, nlens, nmasks, nks, nvs, nstate) = jax.lax.scan(
            body, x, xs
        )

        # Raise the overflow flag when the append cannot fit: the write above
        # CLAMPED its start and overwrote tail slots — never silently (the
        # single-device analogue of the distributed decode overflow flag).
        ovf = jnp.max(cache.length) + T > S_buf
        if cache.overflowed is not None:
            ovf = ovf | cache.overflowed
        new_cache = dataclasses.replace(
            cache,
            keys=nkeys, values=nvalues, length=nlens, mask=nmasks,
            key_scales=nks, value_scales=nvs,
            offset=cache.offset + (T if valid_len is None else valid_len),
            overflowed=ovf,
        )

        logits = None
        if compute_logits:
            x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps, cfg.rms_one_offset)
            if logits_last_only:
                if valid_len is not None:
                    x = jax.lax.dynamic_slice_in_dim(x, valid_len - 1, 1, axis=1)
                else:
                    x = x[:, -1:]
            logits = lm_head_logits(x, params, cfg)
        return logits, new_cache, nstate

    # ------------------------------------------------------------------ #

    def prefill(self, params, ids, press=None, max_size=None, dtype=jnp.bfloat16,
                compute_logits=False, quantized=False, valid_len=None,
                kv_bits=8, inputs_embeds=None, token_types=None,
                image_span=None):
        """Compress-on-prefill entry: build a fresh cache for ids (B, S).

        ``valid_len`` (traced) enables bucketed prefill over padded ids.
        ``inputs_embeds`` (B, S, E) overrides the token embedding — the
        multimodal entry (models/convert.py multimodal_embeds scatters
        vision-tower features into the text embedding)."""
        B, S = (ids if inputs_embeds is None else inputs_embeds).shape[:2]
        max_size = max_size or S
        cache = init_cache(
            self.cfg, B, max_size, dtype=dtype, quantized=quantized, bits=kv_bits
        )
        state = (
            press.init_state(self.cfg, B, S, dtype=dtype)
            if press is not None else None
        )
        return self.forward(
            params, ids, cache, press=press, press_state=state,
            phase="prefill", compute_logits=compute_logits,
            logits_last_only=True, valid_len=valid_len,
            inputs_embeds=inputs_embeds, token_types=token_types,
            image_span=image_span,
        )

    def prefill_chunked(self, params, ids, press=None, chunk_size: int = 8192,
                        max_size=None, dtype=jnp.bfloat16, compute_logits=False,
                        quantized=False, kv_bits=8, score_window: int = 1024,
                        fused_kv=None, inputs_embeds=None, token_types=None,
                        image_span=None):
        """Bounded-activation prefill: forward the context in ``chunk_size``
        pieces (host loop over ONE compiled chunk program — per-chunk
        activations replace the full-length ones, e.g. the (S, F) MLP
        intermediate that makes exact 8B@128K prefill OOM on a 16 GB chip),
        then compress ONCE in the final chunk's pass via the decode-press
        machinery: the press's ``dynamic_score`` runs against the last
        chunk's queries with the traced full length, top-k over the whole
        cache, payload-width gather on quantized caches.

        Exact vs ``prefill`` for content scorers (Knorm/Random/KeyDiff/…)
        and window scorers whose window fits the last chunk (SnapKV/TOVA/
        PyramidKV/StreamingLLM — the reference's own observation window
        contract, snapkv paper §3). Full-context-query scorers (Observed/
        NonCausalAttn/Leverage/Compactor) score from the trailing window
        here — supported but not bit-identical to exact prefill.

        NOT a jit target itself (host chunk loop); the two chunk programs
        are jitted per (runner, press, chunk shape, cache shape) and reused
        across calls — pass a bucketed ``max_size`` so different context
        lengths share the same compiled programs."""
        gen = self.prefill_chunked_steps(
            params, ids, press=press, chunk_size=chunk_size,
            max_size=max_size, dtype=dtype, compute_logits=compute_logits,
            quantized=quantized, kv_bits=kv_bits, score_window=score_window,
            fused_kv=fused_kv, inputs_embeds=inputs_embeds,
            token_types=token_types, image_span=image_span,
        )
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    def prefill_chunked_steps(self, params, ids, press=None,
                              chunk_size: int = 8192, max_size=None,
                              dtype=jnp.bfloat16, compute_logits=False,
                              quantized=False, kv_bits=8,
                              score_window: int = 1024, fused_kv=None,
                              inputs_embeds=None, token_types=None,
                              image_span=None):
        """Generator form of :meth:`prefill_chunked`: yields after each
        bounded dispatch unit (one chunk forward; one compressed layer) and
        returns the same ``(logits, cache, press_state)`` triple via
        StopIteration. A serving loop can interleave decode-step dispatches
        between the yields (Sarathi-style chunked-prefill scheduling,
        arXiv:2308.16369) so live slots' inter-token stall is bounded by
        one chunk instead of the whole admission prefill — the device
        executes in dispatch order, so yield granularity IS the scheduling
        granularity. Semantics are identical to prefill_chunked (which
        drives this generator to completion)."""
        from ..presses.base import ScorerPress
        from ..presses.decoding import BudgetDecodingPress

        B, S = (ids if inputs_embeds is None else inputs_embeds).shape[:2]
        # int4 chunk attention: fused nibble dots only when the per-layer
        # dense-dequant transient is too big to afford (8B-class at 128K);
        # int8 fused is free (== bf16 speed, probe_quant_prefill).
        if fused_kv is None:
            dense_bytes = (
                2 * 2 * B * self.cfg.num_kv_heads
                * (max_size or S) * self.cfg.head_dim
            )
            fused_kv = kv_bits == 8 or dense_bytes > (1 << 29)
        groups_full = k_groups_pad = None
        if token_types is not None:
            # Bidirectional image-span attention through the chunked path:
            # group ids from contiguous image runs over the FULL context
            # (slot == position holds — compression runs only after the
            # last chunk); each chunk gets its query-slice, the kernel the
            # padded full-buffer key groups.
            is_img = jnp.asarray(token_types) == 1                  # (B, S)
            new_start = is_img & ~jnp.pad(is_img, ((0, 0), (1, 0)))[:, :-1]
            grp = jnp.cumsum(new_start, axis=1) - 1
            groups_full = jnp.where(is_img, grp, -1).astype(jnp.int32)
            k_groups_pad = jnp.pad(
                groups_full, ((0, 0), (0, (max_size or S) - S)),
                constant_values=-1,
            )
            if self.attn_impl != "xla":
                assert image_span is not None, (
                    "token_types on the flash path needs image_span"
                )
            if quantized:
                # flash_attention_quant has no group-id support — take the
                # dense-dequant kernel for multimodal chunks.
                fused_kv = False
        # Ragged lengths: the ragged remainder runs FIRST (chunk boundaries
        # do not affect exactness — appends are sequential), so the final,
        # compressing chunk is always a full chunk_size and the score window
        # never shrinks. One extra compile per distinct remainder size;
        # bucket contexts (e.g. pipeline context_bucket) to bound that.
        cache = init_cache(
            self.cfg, B, max_size or S, dtype=dtype, quantized=quantized,
            bits=kv_bits,
        )
        wrap = None
        post_press = None
        dms = None
        W = min(score_window, chunk_size, S)
        if press is not None and getattr(press, "post_mask", False):
            # FastKVzip-style presses: gate scores are collected per chunk
            # during the forward (no in-forward compression); the pipeline
            # applies the cross-layer post-mask afterwards.
            post_press = press
            press = None
        from ..presses.dms import DMSPress

        if press is not None and isinstance(press, DMSPress):
            # DMS threshold eviction through chunked prefill (reference
            # dms_press.py:69-130 — the leaderboard threshold protocol):
            # per-token scores are collected chunk by chunk through the
            # wrapped scorer's chunk_score_fn (exact for per-token-local
            # scorers — KVzap's surrogate, Knorm), then the threshold mask
            # outside the protection window and the decode ring state are
            # applied over the full context (press.apply_chunked), matching
            # the one-shot layer_compress bit for bit.
            assert press.press.chunk_score_fn is not None, (
                f"DMSPress over {type(press.press).__name__} cannot run "
                "through prefill_chunked: the wrapped scorer has no "
                "per-token chunk_score_fn (its score for token t depends "
                "on more than that token's own hidden/k/v). Use the "
                "one-shot prefill, or wrap a per-token scorer "
                "(KVzapPress, KnormPress)."
            )
            dms = press
            press = None
        deferred_press = None
        if press is not None and not press.compresses_prefill:
            # Multi-pass presses (KVzip family) and decode-time presses
            # (DecodingPress family): the initial prefill stays
            # uncompressed; the pipeline runs the repeat-pass scoring after
            # (kvzip is natively chunked — reference kvzip_press.py:204-264)
            # and the decode loop threads the press state — which must be
            # INITIALIZED here (one-shot prefill parity; a None state
            # crashes DecodingPress._advance inside the decode trace).
            deferred_press = press
            press = None
        if press is not None:
            if hasattr(press, "chunked_compress"):
                # Wrapper / head-wise presses (AdaKV family, KeyRerotation,
                # Chunk, Composed): their own traced-length compression
                # runs per layer in _compress_layer. Head-wise presses flip
                # keep-mask bits → materialize the cache mask up front.
                wrap = press
                if getattr(press, "headwise_mask", False) and cache.mask is None:
                    cache = dataclasses.replace(
                        cache,
                        mask=jnp.ones(
                            (self.cfg.num_layers, B, self.cfg.num_kv_heads,
                             cache.max_size), bool,
                        ),
                    )
            else:
                from ..presses.wrappers import BlockPress

                assert not isinstance(press, BlockPress), (
                    "BlockPress cannot run through prefill_chunked: its "
                    "streaming top-k re-gathers matched HIDDEN-STATE rows "
                    "for every candidate set (reference block_press.py:"
                    "49-98), which needs every position's hidden states — "
                    "the chunked path only keeps the trailing scoring "
                    "window. Use the one-shot prefill (BlockPress is "
                    "itself streaming, so its peak memory is already "
                    "bounded by block_size)."
                )
                assert isinstance(press, ScorerPress) or getattr(
                    press, "scorer_like", False
                ), (
                    f"prefill_chunked cannot compress with "
                    f"{type(press).__name__}: it compresses with a "
                    "ScorerPress, a scorer-like wrapper (CriticalKV, "
                    "PerLayerCompression) or a chunked-composable wrapper "
                    "(AdaKV family, KeyRerotation, Chunk/ChunkKV, Composed, "
                    "Duo, ThinK, SimLayerKV, Finch, DMS over a per-token "
                    "scorer); multi-pass presses run their repeat passes "
                    "after the chunked prefill (pipeline orchestration)"
                )
                # BudgetDecodingPress: per-layer targets come from the
                # press's own dynamic_budget — budget-shaping scorers
                # (PyramidKV, PerLayerCompression) keep their per-layer
                # shape instead of a flattened uniform target.
                wrap = BudgetDecodingPress(
                    base_press=press,
                    target_compression_ratio=press.compression_ratio,
                    compression_interval=1,
                    hidden_states_buffer_size=W,
                )

        head = S % chunk_size if S > chunk_size else 0
        starts = ([0] if head else []) + list(
            range(head, S, chunk_size)
        )
        if token_types is not None:
            # A chunk boundary must not SPLIT an image span: the span's
            # early tokens attend bidirectionally to its later tokens, which
            # would not exist yet if they fell in the next chunk. Shift each
            # boundary back to the span's first token (spans are
            # mm_tokens_per_image << chunk_size, so widths stay bounded by
            # chunk_size + span; one compile per distinct width).
            tt_np = np.asarray(jax.device_get(token_types))
            img_any = (tt_np != 0).any(axis=0)
            adj = []
            for st in starts:
                while st > 0 and img_any[st] and img_any[st - 1]:
                    st -= 1
                adj.append(st)
            starts = sorted(set(adj))
        logits = hidden_win = None
        collect_fn = collect_arg = None
        if post_press is not None:
            collect_fn = post_press.chunk_score_fn
            collect_arg = post_press.chunk_score_arg
        elif dms is not None:
            collect_fn = dms.press.chunk_score_fn
            collect_arg = dms.press.chunk_score_arg
        all_scores = []
        for i, start in enumerate(starts):
            last = i == len(starts) - 1
            width = (starts[i + 1] if not last else S) - start
            # lean path everywhere: the scan outputs only the chunk's new
            # K/V — no stacked full-buffer copy (the 8B@128K fit depends on
            # it); the final chunk also emits the per-layer scoring window
            logits, cache, hidden_win, chunk_scores = _chunk_forward_lean(
                params,
                ids[:, start:start + width] if ids is not None else None,
                cache, runner=self,
                compute_logits=compute_logits and last,
                hidden_window=W if (last and wrap is not None) else None,
                fused_kv=fused_kv, collect_gates=collect_arg,
                collect_fn=collect_fn,
                chunk_embeds=(
                    inputs_embeds[:, start:start + width]
                    if inputs_embeds is not None else None
                ),
                img_groups=(
                    groups_full[:, start:start + width]
                    if groups_full is not None else None
                ),
                k_groups=k_groups_pad, image_span=image_span,
            )
            if chunk_scores is not None:
                all_scores.append(chunk_scores)
            yield
        if wrap is not None:
            sliding = self.cfg.sliding_flags()
            for l in range(self.cfg.num_layers):
                if sliding[l]:
                    continue    # sliding layers are never compressed
                cache = _compress_layer(
                    params, cache, hidden_win, jnp.asarray(l, jnp.int32),
                    runner=self, wrap=wrap,
                )
                yield
        state = None
        if deferred_press is not None:
            state = deferred_press.init_state(self.cfg, B, S, dtype=dtype)
        if dms is not None:
            mask_full = cache.mask
            if mask_full is None:
                mask_full = jnp.ones(
                    (self.cfg.num_layers, B, self.cfg.num_kv_heads,
                     cache.max_size), bool,
                )
            scores = jnp.concatenate(all_scores, axis=-1)     # (L, B, H, S)
            new_mask, state = dms.apply_chunked(
                scores, S, mask_full, self.cfg.sliding_flags()
            )
            cache = dataclasses.replace(cache, mask=new_mask)
        if post_press is not None:
            # Post-mask (FastKVzip) press state: per-chunk gate scores
            # concatenated over positions, protected window applied over the
            # FULL context length — identical semantics to the one-shot
            # collector (presses/fastkvzip.py layer_compress), so the
            # pipeline's apply_post_mask consumes it unchanged.
            scores = jnp.concatenate(all_scores, axis=-1)     # (L, B, H, S)
            state = {"scores": post_press.protect_scores(scores, S)}
        return logits, cache, state

    def kvzip_repeat_pass(self, params, rep_ids, cache, start: int,
                          sink: int, chunk_len: int,
                          scan_max_bytes: int = 3 << 30, rep_embeds=None):
        """One KVzip repeat-chunk scoring pass over the lean chunk forward
        (reference score_kvzip, kvzip_press.py:287-358).

        Returns ``(cache, scores)`` with scores (L, B, Hkv, chunk_len) and
        the cache object passed straight through UNTOUCHED: the repeat KV
        exists only as per-layer transients, so there is no xs+ys
        double-cache copy (the 8B@64K OOM) and no rollback bookkeeping.
        Two forms, picked by cache size (``scan_max_bytes``): the SCAN form
        (one fused program, fastest — measured 22.0s vs 28.1s for the 8B
        32K compress) packs the buffers into while-loop state, which XLA
        realizes as ONE padded copy of the key buffer — affordable up to a
        few GB, a compile-time OOM at 8B/128K int4 (4.06 GB temp). Above
        the threshold the pass runs as a HOST LOOP of per-layer jits
        (``_kvzip_score_layer``, the _compress_layer pattern) whose peak
        extra memory is one layer's transients. ``start`` and the layer
        index are traced — every full-size chunk shares one compile per
        form. The buffer must have room for the repeat tokens (presize or
        grow beforehand); ``sink``/``chunk_len`` are static. Requires a
        plain (non-plus) KVzip scorer."""
        fused = True
        if cache.key_scales is not None:
            dense_bytes = (
                2 * 2 * rep_ids.shape[0] * self.cfg.num_kv_heads
                * cache.max_size * self.cfg.head_dim
            )
            fused = cache.bits == 8 or dense_bytes > (1 << 29)
        payload = cache.keys.nbytes + cache.values.nbytes
        if payload <= scan_max_bytes:
            _, _, _, scores = _chunk_forward_score(
                params, rep_ids, cache,
                kvzip_start=jnp.asarray(start, jnp.int32),
                chunk_embeds=rep_embeds,
                runner=self, compute_logits=False, fused_kv=fused,
                kvzip_spec=(sink, chunk_len),
            )
            return cache, scores
        x = (rep_embeds if rep_embeds is not None
             else _embed_for_score(params, rep_ids, runner=self))
        l_start = jnp.asarray(start, jnp.int32)
        scores = []
        for l in range(self.cfg.num_layers):
            x, sc = _kvzip_score_layer(
                params, x, cache, jnp.asarray(l, jnp.int32), l_start,
                runner=self, fused_kv=fused, kvzip_spec=(sink, chunk_len),
            )
            scores.append(sc)
        return cache, jnp.stack(scores)

    def kvcompose_refeed_pass(self, params, ids_chunk, cache, ctx_len: int,
                              agg_task: str, chunk_embeds=None):
        """One KVCompose scoring-pass chunk (reference kvcompose_press.py
        new_forward + forward_hook, :197-219, :384-424 — the extra full
        pass over the context, here in bounded chunks): the chunk's KV
        APPENDS to the donated cache (later chunks' queries attend to it —
        exact one-shot causality over the doubled sequence), and the lean
        scan emits each layer's aggregated attention onto the original
        ``ctx_len`` columns via the flash-lse blockwise sweep
        (ops/attention.refeed_colagg). Returns ``(cache, part)`` with part
        (L, B, Hq, ctx_len) f32 — combine across chunks by max / running
        sum, roll back by restoring length/offset afterwards (the first
        ctx_len slots are untouched)."""
        assert self.cfg.sliding_window is None, (
            "KVCompose chunked re-feed does not support sliding-window "
            "models (the press skips sliding layers; use one-shot prefill)"
        )
        fused = True
        if cache.key_scales is not None:
            dense_bytes = (
                2 * 2 * ids_chunk.shape[0] * self.cfg.num_kv_heads
                * cache.max_size * self.cfg.head_dim
            )
            fused = cache.bits == 8 or dense_bytes > (1 << 29)
        _, cache, _, part = _chunk_forward_lean(
            params, ids_chunk, cache, chunk_embeds=chunk_embeds,
            runner=self, compute_logits=False,
            fused_kv=fused, kvcompose_spec=(ctx_len, agg_task),
        )
        return cache, part


def _chunk_forward_lean_impl(params, chunk_ids, cache, collect_gates=None,
                             chunk_embeds=None, img_groups=None,
                             k_groups=None, kvzip_start=None, *,
                             runner, compute_logits=False, hidden_window=None,
                             fused_kv=True, image_span=None, kvzip_spec=None,
                             collect_fn=None, kvcompose_spec=None):
    """Pressless chunk append with O(chunk) scan outputs.

    The standard forward's layer scan threads the FULL cache buffers as both
    xs and ys — at 8B/128K that is 2 x 4.3 GB of int4 payload live at once,
    which (plus weights) OOMs a 16 GB chip. Here the scan emits only the
    chunk's NEW K/V (L, B, H, T, ·) and ONE batched dynamic_update_slice
    outside the scan writes them into the donated cache — the full buffers
    are read-only xs, no stacked output copy exists.

    Quantized caches: attention reads the payload at payload width
    (flash_attention_quant / quant_gqa_attention — the dequantized buffer
    never exists; int4 = 4x fewer attention HBM bytes than bf16).

    ``hidden_window=W`` additionally emits each layer's last-W post-ln1
    hidden states (L, B, W, E) — the scoring window for the host-loop
    compression pass (_compress_layer). ``compute_logits`` returns the last
    position's logits. ``collect_gates`` (FastKVzip gate pytree — an ARG,
    not a closure capture: gates as HLO constants would bloat/hang the axon
    remote-compile POST) additionally emits each layer's per-position gate
    scores for this chunk (L, B, Hkv, T). Returns
    (logits | None, cache, hidden_win | None, chunk_scores | None).

    Multimodal chunks: ``chunk_embeds`` (B, T, E) overrides the token
    embedding; ``img_groups`` (B, T) / ``k_groups`` (B, S_buf) carry
    image-group ids for bidirectional image-span attention (slot == position
    holds through the whole chunked prefill — compression runs only after
    the last chunk), with ``image_span`` the static span bound for the flash
    kernel's extended block skip."""
    cfg: ModelConfig = runner.cfg
    B, T = (chunk_ids if chunk_embeds is None else chunk_embeds).shape[:2]
    quantized = cache.key_scales is not None
    x = chunk_embeds if chunk_embeds is not None else \
        embed_tokens(params, chunk_ids, cfg)
    positions = jnp.broadcast_to(
        (cache.offset + jnp.arange(T, dtype=jnp.int32))[None], (B, T)
    )
    inv_freq = runner.inv_freq()
    cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
    if cfg.rope_local_base_freq is not None:
        cos_l, sin_l = rope_cos_sin(runner.inv_freq_local(), positions, 1.0)
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None else cfg.head_dim ** -0.5
    )
    window = cfg.sliding_window
    sliding = jnp.asarray(cfg.sliding_flags())
    mask = cache.mask
    if mask is None:
        mask = jnp.ones(
            (cfg.num_layers, B, cfg.num_kv_heads, cache.max_size), bool
        )
    use_flash = runner.attn_impl == "flash" and T > 1
    extra_allow = None
    if img_groups is not None:
        assert k_groups is not None
        assert not (quantized and fused_kv and use_flash), (
            "image-span chunks need the dense attention path "
            "(flash_attention_quant has no group-id support) — "
            "prefill_chunked sets fused_kv=False for multimodal"
        )
        if not use_flash:
            # XLA path: (B, T, S_buf) or-mask from group-id equality
            # (slot == position through the whole chunked prefill).
            extra_allow = (img_groups[:, :, None] >= 0) & (
                img_groups[:, :, None] == k_groups[:, None, :]
            )

    if kvcompose_spec is not None:
        # KVCompose re-feed pass: needs each chunk query's lse (flash) or
        # probs (XLA); sliding-window layers would need per-layer window
        # masks inside the column sweep — unsupported (the press never
        # compresses them anyway).
        assert window is None and kvzip_spec is None and collect_fn is None
        assert not use_flash or runner.attn_impl == "flash"

    def body(xh, xs):
        (layer, kb, vb, ks, vs, lmask, ln, sflag, lid) = xs
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        c, sn = cos, sin
        if cfg.rope_local_base_freq is not None:
            c = jnp.where(sflag, cos_l, cos)
            sn = jnp.where(sflag, sin_l, sin)
        c, sn = c[:, None], sn[:, None]
        q = apply_rope(q_pre, c, sn)
        k = apply_rope(k_pre, c, sn)

        if quantized:
            from ..cache import quantize_kv

            qk, k_scale = quantize_kv(k, cache.bits)
            qv, v_scale = quantize_kv(v, cache.bits)
            # transient per-layer payload update; attention reads payload
            # width (current block quantized — the XLA quant-path semantics)
            kb2 = jax.lax.dynamic_update_slice_in_dim(kb, qk, ln, axis=2)
            vb2 = jax.lax.dynamic_update_slice_in_dim(vb, qv, ln, axis=2)
            ks2 = jax.lax.dynamic_update_slice_in_dim(ks, k_scale, ln, axis=2)
            vs2 = jax.lax.dynamic_update_slice_in_dim(vs, v_scale, ln, axis=2)
            ys = (qk, qv, k_scale, v_scale)
            if use_flash and not fused_kv:
                # dense-dequant attention: int4's fused nibble dots measured
                # ~30% slower (probe_quant_prefill); when the per-layer
                # dense transient is affordable (prefill_chunked auto
                # heuristic), dequantize and run the bf16 kernel instead
                from ..cache import dequantize_kv
                from ..ops.flash import flash_attention

                kd = dequantize_kv(kb2, ks2, cache.bits, xh.dtype)
                vd = dequantize_kv(vb2, vs2, cache.bits, xh.dtype)

                def _fld(win):
                    return flash_attention(
                        q, kd, vd, ln, lmask, sm_scale=scale,
                        softcap=cfg.logit_softcap, window=win,
                        q_groups=img_groups, k_groups=k_groups,
                        or_span=image_span if img_groups is not None else None,
                        return_lse=kvcompose_spec is not None,
                    )

                if window is not None:
                    o = jax.lax.cond(sflag, lambda: _fld(window),
                                     lambda: _fld(None))
                else:
                    o = _fld(None)
                if kvcompose_spec is not None:
                    o, attn_lse = o
            elif use_flash:
                from ..ops.flash import flash_attention_quant

                def _flq(win):
                    return flash_attention_quant(
                        q, kb2, vb2, ks2, vs2, ln, lmask, bits=cache.bits,
                        sm_scale=scale, softcap=cfg.logit_softcap, window=win,
                        return_lse=kvcompose_spec is not None,
                    )

                if window is not None:
                    o = jax.lax.cond(sflag, lambda: _flq(window),
                                     lambda: _flq(None))
                else:
                    o = _flq(None)
                if kvcompose_spec is not None:
                    o, attn_lse = o
            else:
                S_buf = kb2.shape[2]
                bias = attention_bias(ln, T, S_buf, sliding_window=None,
                                      head_mask=lmask, extra_allow=extra_allow)
                if window is not None:
                    sl_bias = attention_bias(
                        ln, T, S_buf, sliding_window=window, head_mask=lmask,
                        extra_allow=extra_allow,
                    )
                    bias = jnp.where(sflag, sl_bias, bias)
                if kvcompose_spec is not None:
                    # re-feed scoring on the XLA (small-scale) path: probs
                    # materialize anyway — aggregate them directly, exactly
                    # the one-shot collector math
                    from ..cache import dequantize_kv as _dq

                    kd_ = _dq(kb2, ks2, cache.bits, xh.dtype)
                    vd_ = _dq(vb2, vs2, cache.bits, xh.dtype)
                    o, attn_probs = gqa_attention(
                        q, kd_, vd_, bias, scale,
                        softcap=cfg.logit_softcap, return_probs=True,
                    )
                else:
                    o = quant_gqa_attention(
                        q, kb2, vb2, ks2, vs2, bias, scale, cache.bits,
                        softcap=cfg.logit_softcap,
                    )
        else:
            ys = (k.astype(kb.dtype), v.astype(vb.dtype), None, None)
            keys = jax.lax.dynamic_update_slice_in_dim(
                kb, k.astype(kb.dtype), ln, axis=2
            )
            values = jax.lax.dynamic_update_slice_in_dim(
                vb, v.astype(vb.dtype), ln, axis=2
            )
            if use_flash:
                from ..ops.flash import flash_attention

                def _fl(win):
                    return flash_attention(
                        q, keys, values, ln, lmask, sm_scale=scale,
                        softcap=cfg.logit_softcap, window=win,
                        q_groups=img_groups, k_groups=k_groups,
                        or_span=image_span if img_groups is not None else None,
                        return_lse=kvcompose_spec is not None,
                    )

                if window is not None:
                    o = jax.lax.cond(sflag, lambda: _fl(window),
                                     lambda: _fl(None))
                else:
                    o = _fl(None)
                if kvcompose_spec is not None:
                    o, attn_lse = o
            else:
                S_buf = keys.shape[2]
                bias = attention_bias(ln, T, S_buf, sliding_window=None,
                                      head_mask=lmask, extra_allow=extra_allow)
                if window is not None:
                    sl_bias = attention_bias(
                        ln, T, S_buf, sliding_window=window, head_mask=lmask,
                        extra_allow=extra_allow,
                    )
                    bias = jnp.where(sflag, sl_bias, bias)
                o, attn_probs = gqa_attention(
                    q, keys, values, bias, scale, softcap=cfg.logit_softcap,
                    return_probs=kvcompose_spec is not None,
                )

        if kvcompose_spec is not None:
            # Per-layer partial aggregation of this chunk's attention onto
            # the original context columns (KVCompose scoring pass): flash
            # paths sweep blockwise with the pass's own lse (the (T, ctx)
            # prob matrix never materializes); the XLA path aggregates the
            # probs it already built. Chunks combine outside by max /
            # running sum (task aggregation is per attention head; group
            # aggregation happens once at the end — mixed agg modes do not
            # commute through chunks otherwise).
            from ..ops.attention import refeed_colagg

            zctx, zagg = kvcompose_spec
            red = "max" if zagg == "max" else "sum"
            big = zctx >= (1 << 16)
            if use_flash:
                kb_s = kb2 if quantized else keys
                part = refeed_colagg(
                    q, kb_s, ks2 if quantized else None, cache.bits,
                    attn_lse, zctx, red, scale, cfg.logit_softcap,
                    block=256 if big else 512,
                )
            else:
                pc = attn_probs[..., :zctx].astype(jnp.float32)
                part = pc.max(axis=2) if zagg == "max" else pc.sum(axis=2)
            if big and red == "max":
                # 128K-class: the stacked (L, B, Hq, ctx) partials are the
                # peak transient next to the 2x-ctx buffer + weights — max
                # aggregation is monotone, bf16 halves them (sum stays f32
                # for precision)
                part = part.astype(jnp.bfloat16)
            ys = ys + (part,)

        if hidden_window is not None:
            ys = ys + (h[:, -hidden_window:],)
        if collect_fn is not None:
            # Per-token chunk scoring (FastKVzip gates / DMS-wrapped
            # scorers): token t's score depends only on its own
            # (hidden, k, v), so each chunk scores its own tokens exactly.
            # ``collect_gates`` is the press's array pytree, a jit ARG —
            # never a closure capture (HLO-constant hazard, CLAUDE.md).
            # Score the keys at CACHE width (dequantized when quantized)
            # for bit-parity with the one-shot path's cache-read scoring.
            if quantized:
                from ..cache import dequantize_kv

                k_sc = dequantize_kv(qk, k_scale, cache.bits, xh.dtype)
                v_sc = dequantize_kv(qv, v_scale, cache.bits, xh.dtype)
            else:
                k_sc = k.astype(kb.dtype)
                v_sc = v.astype(vb.dtype)
            ys = ys + (collect_fn(collect_gates, lid, h, k_sc, v_sc),)
        if kvzip_spec is not None:
            # KVzip repeat-chunk scoring, in-body (scan form — see
            # kvzip_repeat_pass for when this form applies): the
            # [sink | chunk] keys come from the read-only buffer
            # (dequantized at subset width), the T repeat keys are the
            # exact bf16 `k` already in registers. The chunk start is
            # TRACED, so every full-size chunk shares one compile.
            from ..presses.kvzip import subset_max_scores

            zsink, zcl = kvzip_spec
            if quantized:
                from ..cache import dequantize_kv

                parts = []
                if zsink:
                    parts.append(dequantize_kv(
                        kb[:, :, :zsink], ks[:, :, :zsink], cache.bits,
                        xh.dtype))
                kc = jax.lax.dynamic_slice_in_dim(kb, kvzip_start, zcl, axis=2)
                kcs = jax.lax.dynamic_slice_in_dim(ks, kvzip_start, zcl,
                                                   axis=2)
                parts.append(dequantize_kv(kc, kcs, cache.bits, xh.dtype))
            else:
                parts = ([kb[:, :, :zsink]] if zsink else []) + [
                    jax.lax.dynamic_slice_in_dim(kb, kvzip_start, zcl, axis=2)
                ]
            parts.append(k.astype(parts[-1].dtype))
            ys = ys + (subset_max_scores(
                q, jnp.concatenate(parts, axis=2), zsink, zcl),)
        o = _lin(o.transpose(0, 2, 1, 3).reshape(B, T, -1), layer, "wo")
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
        return xh + mlp, ys

    xs = (params["layers"], cache.keys, cache.values, cache.key_scales,
          cache.value_scales, mask, cache.length, sliding,
          jnp.arange(cfg.num_layers, dtype=jnp.int32))
    x, out_ys = jax.lax.scan(body, x, xs)
    out_ys = list(out_ys)
    nk, nv, nks, nvs = out_ys[:4]
    rest = out_ys[4:]
    # ys order past the K/V quartet: [kvcompose part][hidden window][scores]
    kvcompose_part = rest.pop(0) if kvcompose_spec is not None else None
    hidden_win = rest.pop(0) if hidden_window is not None else None
    assert not (collect_fn is not None and kvzip_spec is not None)
    chunk_scores = rest.pop(0) if (
        collect_fn is not None or kvzip_spec is not None
    ) else None
    if kvcompose_part is not None:
        chunk_scores = kvcompose_part

    if kvzip_spec is not None:
        # Scoring pass (scan form): the repeat KV lived only in per-layer
        # transients — cache content, length and offset are all unchanged,
        # so the KVzip rollback between passes is free. The cache is NOT
        # returned: a passthrough output makes XLA copy the padded key
        # buffer inside the program on top of the loop-state copy.
        return None, None, hidden_win, chunk_scores

    start = (0, 0, 0, cache.length[0], 0)
    keys = jax.lax.dynamic_update_slice(cache.keys, nk, start)
    values = jax.lax.dynamic_update_slice(cache.values, nv, start)
    key_scales = value_scales = None
    if quantized:
        key_scales = jax.lax.dynamic_update_slice(
            cache.key_scales, nks, start
        )
        value_scales = jax.lax.dynamic_update_slice(
            cache.value_scales, nvs, start
        )
    logits = None
    if compute_logits:
        xl = rms_norm(x[:, -1:], params["ln_f"], cfg.rms_norm_eps,
                      cfg.rms_one_offset)
        logits = lm_head_logits(xl, params, cfg)
    return logits, dataclasses.replace(
        cache,
        keys=keys, values=values,
        key_scales=key_scales, value_scales=value_scales,
        length=cache.length + T, offset=cache.offset + T,
    ), hidden_win, chunk_scores


# Chunk-append form (prefill_chunked): the cache is donated — the batched
# DUS writes the chunk's new K/V in place.
_LEAN_STATICS = ("runner", "compute_logits", "hidden_window", "fused_kv",
                 "image_span", "kvzip_spec", "collect_fn", "kvcompose_spec")
_chunk_forward_lean = functools.partial(
    jax.jit, static_argnames=_LEAN_STATICS, donate_argnums=(2,)
)(_chunk_forward_lean_impl)
# Scan-form scoring (kvzip_repeat_pass, small/mid caches): no donation and
# no cache output. XLA still materializes ONE padded copy of the key buffer
# to pack the scan xs into while-loop state — affordable below the
# size threshold in kvzip_repeat_pass, fatal at 8B/128K (4.06 GB).
_chunk_forward_score = jax.jit(
    _chunk_forward_lean_impl, static_argnames=_LEAN_STATICS
)


@functools.partial(jax.jit, static_argnames=("runner",))
def _embed_for_score(params, ids, *, runner):
    return embed_tokens(params, ids, runner.cfg)


@functools.partial(
    jax.jit, static_argnames=("runner", "fused_kv", "kvzip_spec"))
def _kvzip_score_layer(params, xh, cache, l_idx, kvzip_start, *,
                       runner, fused_kv, kvzip_spec):
    """One layer of the KVzip repeat pass, host-loop form (the
    _compress_layer pattern): the stacked cache buffers are read as plain
    jit parameters with a traced per-layer slice — NO layer scan, because
    a scan packs its xs into the while-loop state and XLA materializes a
    full (2x-padded) copy of the 8B/128K key buffer to do so (4.06 GB
    temp, compile-time OOM; donation lets the prefill variant alias, but
    the scoring pass must leave the caller's cache alive across passes).
    Peak extra memory here is one layer's transients. Returns
    ``(xh', scores_l)``; the appended repeat KV is a per-layer transient —
    the cache is never modified (KVzip rollback is free)."""
    from ..cache import dequantize_kv, quantize_kv
    from ..ops.flash import flash_attention, flash_attention_quant

    cfg: ModelConfig = runner.cfg
    B, T = xh.shape[:2]
    quantized = cache.key_scales is not None
    zsink, zcl = kvzip_spec
    layer = jax.tree_util.tree_map(lambda a: a[l_idx], params["layers"])
    kb = cache.keys[l_idx]
    vb = cache.values[l_idx]
    ks = cache.key_scales[l_idx] if quantized else None
    vs = cache.value_scales[l_idx] if quantized else None
    lmask = (cache.mask[l_idx] if cache.mask is not None
             else jnp.ones((B, cfg.num_kv_heads, kb.shape[2]), bool))
    ln = cache.length[l_idx]
    sflag = jnp.asarray(cfg.sliding_flags())[l_idx]
    positions = jnp.broadcast_to(
        (cache.offset + jnp.arange(T, dtype=jnp.int32))[None], (B, T)
    )
    cos, sin = rope_cos_sin(runner.inv_freq(), positions,
                            runner.attention_scaling)
    if cfg.rope_local_base_freq is not None:
        cos_l, sin_l = rope_cos_sin(runner.inv_freq_local(), positions, 1.0)
        cos = jnp.where(sflag, cos_l, cos)
        sin = jnp.where(sflag, sin_l, sin)
    cos, sin = cos[:, None], sin[:, None]
    scale = (cfg.query_pre_attn_scalar ** -0.5
             if cfg.query_pre_attn_scalar is not None
             else cfg.head_dim ** -0.5)
    window = cfg.sliding_window

    h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
    q_pre, k_pre, v = _project_qkv(layer, cfg, h)
    q = apply_rope(q_pre, cos, sin)
    k = apply_rope(k_pre, cos, sin)

    use_flash = runner.attn_impl == "flash" and T > 1
    if quantized:
        qk, k_scale = quantize_kv(k, cache.bits)
        qv, v_scale = quantize_kv(v, cache.bits)
        kb2 = jax.lax.dynamic_update_slice_in_dim(kb, qk, ln, axis=2)
        vb2 = jax.lax.dynamic_update_slice_in_dim(vb, qv, ln, axis=2)
        ks2 = jax.lax.dynamic_update_slice_in_dim(ks, k_scale, ln, axis=2)
        vs2 = jax.lax.dynamic_update_slice_in_dim(vs, v_scale, ln, axis=2)
        if use_flash and not fused_kv:
            kd = dequantize_kv(kb2, ks2, cache.bits, xh.dtype)
            vd = dequantize_kv(vb2, vs2, cache.bits, xh.dtype)

            def _fld(win):
                return flash_attention(q, kd, vd, ln, lmask, sm_scale=scale,
                                       softcap=cfg.logit_softcap, window=win)

            if window is not None:
                o = jax.lax.cond(sflag, lambda: _fld(window),
                                 lambda: _fld(None))
            else:
                o = _fld(None)
        elif use_flash:
            def _flq(win):
                return flash_attention_quant(
                    q, kb2, vb2, ks2, vs2, ln, lmask, bits=cache.bits,
                    sm_scale=scale, softcap=cfg.logit_softcap, window=win,
                )

            if window is not None:
                o = jax.lax.cond(sflag, lambda: _flq(window),
                                 lambda: _flq(None))
            else:
                o = _flq(None)
        else:
            S_buf = kb2.shape[2]
            bias = attention_bias(ln, T, S_buf, sliding_window=None,
                                  head_mask=lmask)
            if window is not None:
                sl_bias = attention_bias(ln, T, S_buf, sliding_window=window,
                                         head_mask=lmask)
                bias = jnp.where(sflag, sl_bias, bias)
            o = quant_gqa_attention(q, kb2, vb2, ks2, vs2, bias, scale,
                                    cache.bits, softcap=cfg.logit_softcap)
    else:
        keys = jax.lax.dynamic_update_slice_in_dim(
            kb, k.astype(kb.dtype), ln, axis=2
        )
        values = jax.lax.dynamic_update_slice_in_dim(
            vb, v.astype(vb.dtype), ln, axis=2
        )
        if use_flash:
            def _fl(win):
                return flash_attention(q, keys, values, ln, lmask,
                                       sm_scale=scale,
                                       softcap=cfg.logit_softcap, window=win)

            if window is not None:
                o = jax.lax.cond(sflag, lambda: _fl(window),
                                 lambda: _fl(None))
            else:
                o = _fl(None)
        else:
            S_buf = keys.shape[2]
            bias = attention_bias(ln, T, S_buf, sliding_window=None,
                                  head_mask=lmask)
            if window is not None:
                sl_bias = attention_bias(ln, T, S_buf, sliding_window=window,
                                         head_mask=lmask)
                bias = jnp.where(sflag, sl_bias, bias)
            o, _ = gqa_attention(q, keys, values, bias, scale,
                                 softcap=cfg.logit_softcap)

    # KVzip subset scores: [sink | chunk] keys from the read-only buffer
    # (dequantized at subset width), repeat keys exact bf16 in registers.
    from ..presses.kvzip import subset_max_scores

    if quantized:
        parts = []
        if zsink:
            parts.append(dequantize_kv(kb[:, :, :zsink], ks[:, :, :zsink],
                                       cache.bits, xh.dtype))
        kc = jax.lax.dynamic_slice_in_dim(kb, kvzip_start, zcl, axis=2)
        kcs = jax.lax.dynamic_slice_in_dim(ks, kvzip_start, zcl, axis=2)
        parts.append(dequantize_kv(kc, kcs, cache.bits, xh.dtype))
    else:
        parts = ([kb[:, :, :zsink]] if zsink else []) + [
            jax.lax.dynamic_slice_in_dim(kb, kvzip_start, zcl, axis=2)
        ]
    parts.append(k.astype(parts[-1].dtype))
    scores = subset_max_scores(q, jnp.concatenate(parts, axis=2), zsink, zcl)

    o = _lin(o.transpose(0, 2, 1, 3).reshape(B, T, -1), layer, "wo")
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
    return xh + mlp, scores


@functools.partial(
    jax.jit, static_argnames=("runner", "wrap"), donate_argnums=(1,))
def _compress_layer(params, cache, hidden_all, l_idx, *, runner, wrap):
    """One layer's chunked-prefill compression, in place on the donated
    cache: score the full (quantized) buffer against the re-projected
    window queries (the DecodingPress contract), top-k gather at payload
    width, write the layer back with one dynamic_update_slice.

    A host loop over layers (one compile total — l_idx is traced) replaces
    the in-forward compression whose layer scan held TWO full cache copies
    (xs + ys): peak memory here is the single donated cache + one layer's
    transients. ~1 ms dispatch x L layers is noise next to the prefill."""
    from ..presses.base import LayerCtx
    from ..presses.decoding import _buffer_queries

    cfg = runner.cfg
    layer = jax.tree_util.tree_map(lambda a: a[l_idx], params["layers"])
    hidden_l = hidden_all[l_idx]                     # (B, W, E)
    B, W, _ = hidden_l.shape
    length = cache.length[l_idx]
    last_pos = (cache.offset if cache.offset.ndim == 0
                else jnp.max(cache.offset)).astype(jnp.int32) - 1
    positions = jnp.broadcast_to(
        (last_pos - jnp.arange(W - 1, -1, -1, dtype=jnp.int32))[None], (B, W)
    )
    ctx = LayerCtx(
        layer_idx=l_idx, hidden=hidden_l, queries=None, queries_prerope=None,
        keys_prerope=None, positions=positions, attn_probs=None,
        layer_params=layer, inv_freq=runner.inv_freq(), cfg=cfg,
        attention_scaling=runner.attention_scaling,
    )
    ctx = dataclasses.replace(
        ctx, queries=_buffer_queries(ctx, hidden_l, positions)
    )
    state = {
        "buffer": jnp.zeros((B, W, cfg.hidden_size), hidden_l.dtype),
        "buf_len": jnp.asarray(0, jnp.int32),
        "steps": jnp.asarray(0, jnp.int32),
    }
    keys_l = cache.keys[l_idx]
    values_l = cache.values[l_idx]
    mask_l = (
        cache.mask[l_idx] if cache.mask is not None
        else jnp.ones((B, cfg.num_kv_heads, keys_l.shape[2]), bool)
    )
    at = (l_idx, 0, 0, 0, 0)
    is_wrapper = hasattr(wrap, "chunked_compress")
    new_mask_l = None
    if cache.key_scales is not None:
        if is_wrapper:
            (k2, v2, ks2, vs2, nlen,
             new_mask_l) = wrap.chunked_compress_quantized(
                ctx, keys_l, values_l, cache.key_scales[l_idx],
                cache.value_scales[l_idx], cache.bits, length, mask_l,
            )
        else:
            (k2, v2, ks2, vs2, nlen, _, _) = wrap.decode_compress_quantized(
                ctx, keys_l, values_l, cache.key_scales[l_idx],
                cache.value_scales[l_idx], cache.bits, length, mask_l, state,
            )
        cache = dataclasses.replace(
            cache,
            keys=jax.lax.dynamic_update_slice(cache.keys, k2[None], at),
            values=jax.lax.dynamic_update_slice(cache.values, v2[None], at),
            key_scales=jax.lax.dynamic_update_slice(
                cache.key_scales, ks2[None], at
            ),
            value_scales=jax.lax.dynamic_update_slice(
                cache.value_scales, vs2[None], at
            ),
            length=cache.length.at[l_idx].set(nlen),
        )
    else:
        if is_wrapper:
            k2, v2, nlen, new_mask_l = wrap.chunked_compress(
                ctx, keys_l, values_l, length, mask_l
            )
        else:
            k2, v2, nlen, _, _ = wrap.decode_compress(
                ctx, keys_l, values_l, length, mask_l, state
            )
        cache = dataclasses.replace(
            cache,
            keys=jax.lax.dynamic_update_slice(cache.keys, k2[None], at),
            values=jax.lax.dynamic_update_slice(cache.values, v2[None], at),
            length=cache.length.at[l_idx].set(nlen),
        )
    if new_mask_l is not None and cache.mask is not None:
        cache = dataclasses.replace(
            cache,
            mask=jax.lax.dynamic_update_slice(
                cache.mask, new_mask_l[None], (l_idx, 0, 0, 0)
            ),
        )
    return cache
