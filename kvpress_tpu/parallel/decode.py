"""Distributed decode against context-parallel KV shards.

Closes the loop on ``context_parallel_prefill``: after the sequence-sharded
prefill (+ shard-local compression), decode proceeds WITHOUT gathering the
cache to one device. Every device runs the (replicated) dense compute for the
new token and attends its local KV shard only; the per-shard softmax partials
are combined with one ``pmax`` + ``psum`` pair per layer — the flash-decoding
split-KV reduction, expressed as XLA collectives over the mesh's ICI axis
(the reference has no distributed serving path at all; its device_map spreads
layers, SURVEY §2.8).

The new token's K/V are appended to the LAST shard's buffer (shard-local
compression leaves tail slack in every shard, so the buffer grows into the
space the press freed). Positions are logical: the caller threads ``offset``
(original context length + tokens decoded so far) exactly like the
single-device cache offset.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import (
    Runner, _act, _lin, _project_qkv, embed_tokens, lm_head_logits, rms_norm,
)
from ..ops.attention import NEG_INF
from ..rope import apply_rope, rope_cos_sin


def _local_decode(
    params: dict,
    tok: jax.Array,                    # (B, 1) next-token ids, replicated
    keys: jax.Array,                   # (L, B, H_local, Sl, D) local shard
    values: jax.Array,
    lengths: jax.Array,                # (L,) local per-layer valid lengths
    masks: jax.Array,                  # (L, B, H_local, Sl) local keep-masks
    offset: jax.Array,                 # () int32 — logical position of tok
    press_state,                       # per-layer press state pytree (or dummy)
    scales=None,                       # (key_scales, value_scales) if quantized
    shard_len0=None,                   # () int32 per-shard PREFILL length —
    #                                    needed by sliding-window layers only
    runner: Runner = None,
    axis_name: str = "seq",
    model_axis: Optional[str] = None,
    model_size: int = 1,
    seq_tp: bool = False,
    press=None,
    kv_bits: int = 8,
):
    import dataclasses

    cfg = runner.cfg
    if model_size > 1:
        # 2D sp×tp: local head/ffn counts, exactly as the prefill side.
        cfg = dataclasses.replace(
            cfg,
            num_heads=cfg.num_heads // model_size,
            num_kv_heads=cfg.num_kv_heads // model_size,
            intermediate_size=cfg.intermediate_size // model_size,
        )
        runner = dataclasses.replace(runner, cfg=cfg)
    B = tok.shape[0]
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    is_last = idx == n_shards - 1
    inv_freq = runner.inv_freq()
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None else cfg.head_dim ** -0.5
    )
    G = cfg.num_heads // cfg.num_kv_heads
    Sl = keys.shape[3]
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    window = cfg.sliding_window
    sflags = jnp.asarray(cfg.sliding_flags())
    if window is not None:
        # Sliding layers are never compressed and appends land on the last
        # shard's contiguous tail, so slot → global position is just
        # idx*shard_len0 + slot on every shard (see context_parallel_
        # decode_step docstring).
        slot_pos = idx * shard_len0 + jnp.arange(Sl, dtype=jnp.int32)

    def _cols(w, n):
        c = w.shape[-1] // n
        return jax.lax.dynamic_slice_in_dim(w, idx * c, c, axis=-1)

    def _rows(w, n):
        r = w.shape[0] // n
        return jax.lax.dynamic_slice_in_dim(w, idx * r, r, axis=0)

    x = embed_tokens(params, tok, cfg)
    positions = jnp.broadcast_to(offset[None, None], (B, 1)).astype(jnp.int32)

    quantized = scales is not None

    def body(carry, xs):
        xh = carry
        if quantized:
            layer, k_loc, v_loc, length, mask, lid, pstate, ks_l, vs_l = xs
        else:
            layer, k_loc, v_loc, length, mask, lid, pstate = xs
            ks_l = vs_l = None
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if seq_tp:
            # 1D-seq decode would otherwise run the full dense compute on
            # every shard (VERDICT r1 weak 4). Decode is weight-HBM-bound, so
            # reuse the idle seq shards as tensor parallelism over the
            # *replicated* weights: each shard reads only its head/ffn column
            # block (1/n of the weight bytes), and the sharded q/k/v heads are
            # re-assembled with one tiny all_gather (B·H·D ≪ weight bytes).
            sub = dict(
                layer,
                wq=_cols(layer["wq"], n_shards),
                wk=_cols(layer["wk"], n_shards),
                wv=_cols(layer["wv"], n_shards),
            )
            for b in ("bq", "bk", "bv"):
                if b in layer:
                    sub[b] = _rows(layer[b], n_shards)
            for w in ("wq", "wk", "wv"):
                # int8-weight scales are per-output-channel — slice with the
                # weight's column block (quantize_params_int8)
                if w + "_scale" in layer:
                    sub[w + "_scale"] = _cols(layer[w + "_scale"], n_shards)
            sub_cfg = dataclasses.replace(
                cfg, num_heads=Hq // n_shards, num_kv_heads=Hkv // n_shards
            )
            q_pre, k_pre, v = _project_qkv(sub, sub_cfg, h)
            q_pre = jax.lax.all_gather(q_pre, axis_name, axis=1, tiled=True)
            k_pre = jax.lax.all_gather(k_pre, axis_name, axis=1, tiled=True)
            v = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
        else:
            q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        sliding_flag = sflags[lid]
        cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
        if cfg.rope_local_base_freq is not None:
            cos_l, sin_l = rope_cos_sin(
                runner.inv_freq_local(), positions, 1.0
            )
            cos = jnp.where(sliding_flag, cos_l, cos)
            sin = jnp.where(sliding_flag, sin_l, sin)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q_pre, cos, sin)                     # (B, Hq, 1, D)
        k_new = apply_rope(k_pre, cos, sin)                 # (B, Hkv, 1, D)

        # Append onto the last shard only (it owns the decode tail). When the
        # tail buffer is exhausted the write is SKIPPED and an overflow flag
        # raised (never silently overwrite the final slot) — callers grow the
        # shards (grow_shards) and retry.
        can_write = length < Sl
        slot = jnp.minimum(length, Sl - 1)
        if quantized:
            from ..cache import quantize_kv

            k_store, sk = quantize_kv(k_new, kv_bits)
            v_store, sv = quantize_kv(v, kv_bits)
            ks_app = jax.lax.dynamic_update_slice_in_dim(
                ks_l, sk, slot, axis=2
            )
            vs_app = jax.lax.dynamic_update_slice_in_dim(
                vs_l, sv, slot, axis=2
            )
        else:
            k_store, v_store = k_new, v
        k_app = jax.lax.dynamic_update_slice_in_dim(
            k_loc, k_store.astype(k_loc.dtype), slot, axis=2
        )
        v_app = jax.lax.dynamic_update_slice_in_dim(
            v_loc, v_store.astype(v_loc.dtype), slot, axis=2
        )
        m_app = jax.lax.dynamic_update_slice_in_dim(
            mask, jnp.ones((B, cfg.num_kv_heads, 1), bool), slot, axis=2
        )
        write = is_last & can_write
        k_loc = jnp.where(write, k_app, k_loc)
        v_loc = jnp.where(write, v_app, v_loc)
        if quantized:
            ks_l = jnp.where(write, ks_app, ks_l)
            vs_l = jnp.where(write, vs_app, vs_l)
        mask_n = jnp.where(write, m_app, mask)
        length_n = jnp.where(write, length + 1, length)
        overflow = is_last & ~can_write

        # Shard-local softmax partials, then the split-KV combine:
        # m_g = pmax(m_s);  out = psum(exp(s - m_g) @ V) / psum(sum exp(s - m_g))
        qg = q.reshape(B, cfg.num_kv_heads, G, cfg.head_dim)
        if quantized:
            # Payload-width HBM reads on every shard (quant_gqa_attention's
            # algebra, split-KV style): scales factor out of the reductions.
            from ..ops.attention import quant_pv_out, quant_qk_logits

            s = quant_qk_logits(qg, k_loc, ks_l, kv_bits) * scale
        else:
            s = jnp.einsum(
                "bhgd,bhsd->bhgs", qg, k_loc,
                preferred_element_type=jnp.float32,
            ) * scale
        if cfg.logit_softcap is not None:
            s = jnp.tanh(s / cfg.logit_softcap) * cfg.logit_softcap
        valid = mask_n & (jnp.arange(Sl)[None, None] < length_n)
        if window is not None:
            # Sliding layers: only keys within `window` positions of the
            # current token (global position = offset) are attendable.
            in_win = slot_pos[None, None] > offset - window
            valid = valid & (~sliding_flag | in_win)
        s = jnp.where(valid[:, :, None], s, NEG_INF)
        m_s = jnp.max(s, axis=-1)                            # (B, Hkv, G)
        m_g = jax.lax.pmax(m_s, axis_name)
        p = jnp.exp(s - m_g[..., None])
        l_s = jnp.sum(p, axis=-1)
        if quantized:
            acc_s = quant_pv_out(p, v_loc, vs_l, kv_bits, xh.dtype)
            acc_s = acc_s.astype(jnp.float32)
        else:
            acc_s = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v_loc.dtype), v_loc,
                               preferred_element_type=jnp.float32)
        l_g = jax.lax.psum(l_s, axis_name)
        acc_g = jax.lax.psum(acc_s, axis_name)
        attn = (acc_g / jnp.maximum(l_g, 1e-30)[..., None]).astype(xh.dtype)
        attn = attn.reshape(B, cfg.num_heads, 1, cfg.head_dim)

        if seq_tp:
            # Row-parallel output projection over the seq shards: this shard's
            # head block × its wo row block, partial-summed across the axis.
            Hq_l = Hq // n_shards
            attn_l = jax.lax.dynamic_slice_in_dim(attn, idx * Hq_l, Hq_l, axis=1)
            sub_o = {"wo": _rows(layer["wo"], n_shards)}
            if "wo_scale" in layer:
                # per-output-channel scale commutes with the psum (row split
                # keeps the output dim whole) — same scale on every shard
                sub_o["wo_scale"] = layer["wo_scale"]
            o = _lin(attn_l.transpose(0, 2, 1, 3).reshape(B, 1, -1), sub_o, "wo")
            o = jax.lax.psum(o, axis_name)
        else:
            o = _lin(attn.transpose(0, 2, 1, 3).reshape(B, 1, -1), layer, "wo")
        if model_axis is not None:
            o = jax.lax.psum(o, model_axis)
        if cfg.post_norms:
            o = rms_norm(o, layer["ln1_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        xh = xh + o
        h2 = rms_norm(xh, layer["ln2"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if seq_tp:
            sub_m = {
                "wg": _cols(layer["wg"], n_shards),
                "wu": _cols(layer["wu"], n_shards),
                "wd": _rows(layer["wd"], n_shards),
            }
            for w in ("wg", "wu"):
                if w + "_scale" in layer:
                    sub_m[w + "_scale"] = _cols(layer[w + "_scale"], n_shards)
            if "wd_scale" in layer:
                sub_m["wd_scale"] = layer["wd_scale"]
            mlp = _act(_lin(h2, sub_m, "wg"), cfg.act) * _lin(h2, sub_m, "wu")
            mlp = _lin(mlp, sub_m, "wd")
            mlp = jax.lax.psum(mlp, axis_name)
        else:
            mlp = _act(_lin(h2, layer, "wg"), cfg.act) * _lin(h2, layer, "wu")
            mlp = _lin(mlp, layer, "wd")
        if model_axis is not None:
            mlp = jax.lax.psum(mlp, model_axis)
        if cfg.post_norms:
            mlp = rms_norm(mlp, layer["ln2_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        xh = xh + mlp

        nstate = pstate
        if press is not None and window is not None:
            # Sliding layers are never compressed (the slot→position map
            # relies on it) — save the pre-press buffers for the restore.
            pk_loc, pv_loc, plen, pmask = k_loc, v_loc, length_n, mask_n
            if quantized:
                pks_l, pvs_l = ks_l, vs_l
        if press is not None:
            # Shard-local decode-phase compression (reference DecodingPress,
            # decoding_press.py — here each shard compresses ITS slice, so
            # press targets are per-shard budgets; sync_state keeps the step
            # counters replicated across shards).
            from ..presses.base import LayerCtx

            ctx = LayerCtx(
                layer_idx=lid,
                hidden=h,
                queries=q,
                queries_prerope=q_pre,
                keys_prerope=k_pre,
                positions=positions,
                attn_probs=None,
                layer_params=layer,
                inv_freq=inv_freq,
                cfg=cfg,
                attention_scaling=runner.attention_scaling,
            )
            if quantized:
                # Payload-width shard-local compression: dequant only inside
                # the press's interval cond; kept payloads + scales ride the
                # same top-k gather (decode_compress_quantized).
                (k_loc, v_loc, ks_l, vs_l, length_n, mask_n,
                 nstate) = press.decode_compress_quantized(
                    ctx, k_loc, v_loc, ks_l, vs_l, kv_bits, length_n, mask_n,
                    pstate, sync_state=True,
                )
            else:
                k_loc, v_loc, length_n, mask_n, nstate = press.decode_compress(
                    ctx, k_loc, v_loc, length_n, mask_n, pstate, sync_state=True
                )
            if window is not None:
                k_loc = jnp.where(sliding_flag, pk_loc, k_loc)
                v_loc = jnp.where(sliding_flag, pv_loc, v_loc)
                length_n = jnp.where(sliding_flag, plen, length_n)
                mask_n = jnp.where(sliding_flag, pmask, mask_n)
                if quantized:
                    ks_l = jnp.where(sliding_flag, pks_l, ks_l)
                    vs_l = jnp.where(sliding_flag, pvs_l, vs_l)
        if quantized:
            return xh, (k_loc, v_loc, length_n, mask_n, overflow, nstate,
                        ks_l, vs_l)
        return xh, (k_loc, v_loc, length_n, mask_n, overflow, nstate)

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    if quantized:
        assert press is None or getattr(
            press, "supports_quantized_decode", False
        ), (
            "this decode-phase press needs dense buffers every step (e.g. "
            "CAM) — decode bf16, or use a DecodingPress-family press"
        )
        key_scales, value_scales = scales
        x, (keys, values, lengths, masks, overflows, press_state,
            key_scales, value_scales) = jax.lax.scan(
            body, x,
            (params["layers"], keys, values, lengths, masks, layer_ids,
             press_state, key_scales, value_scales),
        )
        scales = (key_scales, value_scales)
    else:
        x, (keys, values, lengths, masks, overflows, press_state) = jax.lax.scan(
            body, x,
            (params["layers"], keys, values, lengths, masks, layer_ids,
             press_state),
        )
    # Replicate the flag (it is only raised on the last shard).
    overflow = jax.lax.pmax(jnp.any(overflows).astype(jnp.int32), axis_name)
    if model_axis is not None:
        overflow = jax.lax.pmax(overflow, model_axis)
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = lm_head_logits(x, params, cfg)
    return logits, keys, values, lengths, masks, overflow, press_state, scales


@functools.partial(
    jax.jit, static_argnames=("runner", "mesh", "axis", "model_axis", "press")
)
def context_parallel_decode_step(
    params: dict,
    tok: jax.Array,                     # (B, 1)
    shards,                             # (keys, values, lengths, masks) from prefill
    offset: jax.Array,                  # () int32 logical position of tok
    *,
    runner: Runner,
    mesh: Mesh,
    axis: str = "seq",
    model_axis: Optional[str] = None,
    press=None,                         # DecodingPress-family: shard-local
    press_state=None,                   # press.init_state(cfg, B, 1) pytree
    prefill_shard_len=None,             # () int32 — required for sliding-window
):
    """One decode step against sequence-sharded KV. Returns
    (logits (B, 1, V), updated shards, offset+1, overflow () int32). Pair
    ``axis``/``model_axis`` with the same arguments given to
    context_parallel_prefill (1D seq, or 2D sp×tp with heads/ffn over
    ``model_axis``).

    overflow != 0 means the last shard's tail buffer was full: the step's
    logits did NOT see the new token's K/V and the cache was left unchanged
    for that layer — call ``grow_shards`` and re-run the step (the generate
    loop does this automatically).

    In 1D-seq mode the dense compute is *tensor-parallel over the seq axis*
    (weight-column slices of the replicated parameters + an all_gather of the
    tiny q/k/v and two psums per layer) whenever head/ffn counts divide the
    axis size — decode is weight-HBM-bound, so this cuts per-device weight
    reads n×; without it every shard would replicate the full dense compute
    (VERDICT r1 weak 4).

    ``press`` (DecodingPress family) applies decode-phase compression
    SHARD-LOCALLY: each shard's slice is compressed against the press's
    targets, i.e. ``target_size`` is a per-shard budget (the distributed
    analogue of the prefill side's shard-local/ChunkPress semantics). Thread
    ``press_state`` through successive steps; it stays replicated
    (sync_state resets the counters identically on every shard).

    Quantized shards (the 6-tuple from ``context_parallel_prefill(...,
    quantized=True)``) decode with payload-width HBM reads on every shard
    (int8 / packed-int4 detected from the payload dtype); appends are
    quantized in place. DecodingPress-family presses compose via
    ``decode_compress_quantized`` (payload-width gather; dense K/V built only
    inside the interval cond); dense-per-step presses (CAM) are rejected.

    Sliding-window models (Gemma3): pass ``prefill_shard_len`` = the
    per-shard PREFILL sequence length (S // n_seq). Sliding layers are never
    compressed and appends land on the last shard's contiguous tail, so each
    key's global position is ``shard_idx * prefill_shard_len + slot`` — the
    window test needs no stored position array."""
    if len(shards) == 6:
        keys, values, lengths, masks, key_scales, value_scales = shards
        scales = (key_scales, value_scales)
        kv_bits = 4 if keys.dtype == jnp.uint8 else 8
    else:
        keys, values, lengths, masks = shards
        scales = None
        kv_bits = 8
    if runner.cfg.sliding_window is not None:
        assert prefill_shard_len is not None, (
            "sliding-window models need prefill_shard_len (= prefill S // "
            "n_seq) to map shard slots to global positions"
        )
        psl = jnp.asarray(prefill_shard_len, jnp.int32)
    else:
        psl = jnp.asarray(0, jnp.int32)
    model_size = mesh.shape[model_axis] if model_axis is not None else 1
    mp = model_axis
    cfg = runner.cfg
    n_seq = mesh.shape[axis]
    seq_tp = (
        model_axis is None
        and n_seq > 1
        and cfg.num_heads % n_seq == 0
        and cfg.num_kv_heads % n_seq == 0
        and cfg.intermediate_size % n_seq == 0
        # int4 weights pack contraction-dim halves into nibbles (models/
        # llama.py _lin): the manual row split in _local_decode would slice
        # PACKED rows, pairing wrong lo/hi channels — fall back to
        # replicated compute (int8/bf16 weights keep the seq-tp read split).
        and params["layers"]["wo"].dtype != jnp.uint8
    )

    from .mesh import layer_param_specs

    params_spec = {
        "embed": P(),
        "ln_f": P(),
        "layers": layer_param_specs(params["layers"], mp),
    }
    if "lm_head" in params:
        params_spec["lm_head"] = P()
    if "embed_scale" in params:
        params_spec["embed_scale"] = P()
    if "lm_head_scale" in params:
        params_spec["lm_head_scale"] = P()
    kv_spec = (
        P(None, None, mp, axis, None) if mp is not None
        else P(None, None, None, axis, None)
    )
    mask_spec = (
        P(None, None, mp, axis) if mp is not None else P(None, None, None, axis)
    )
    len_spec = P(axis) if mp is None else P((mp, axis))
    if press_state is None:
        # scan xs must be a pytree of arrays — dummy per-layer zeros when no
        # press rides along
        press_state = jnp.zeros((runner.cfg.num_layers,), jnp.int32)
    state_spec = jax.tree_util.tree_map(lambda _: P(), press_state)
    scales_spec = None if scales is None else (kv_spec, kv_spec)
    fn = shard_map(
        functools.partial(
            _local_decode, runner=runner, axis_name=axis,
            model_axis=model_axis, model_size=model_size, seq_tp=seq_tp,
            press=press, kv_bits=kv_bits,
        ),
        mesh=mesh,
        in_specs=(params_spec, P(), kv_spec, kv_spec, len_spec, mask_spec,
                  P(), state_spec, scales_spec, P()),
        out_specs=(P(), kv_spec, kv_spec, len_spec, mask_spec, P(), state_spec,
                   scales_spec),
        check_vma=False,
    )
    logits, keys, values, lengths, masks, overflow, press_state, scales = fn(
        params, tok, keys, values, lengths, masks, offset, press_state, scales,
        psl,
    )
    out_shards = (
        (keys, values, lengths, masks) if scales is None
        else (keys, values, lengths, masks) + tuple(scales)
    )
    return logits, out_shards, offset + 1, overflow, press_state


@functools.partial(
    jax.jit,
    static_argnames=("runner", "mesh", "axis", "model_axis", "press",
                     "max_new_tokens", "eos_id"),
)
def context_parallel_generate_fused(
    params: dict,
    tok: jax.Array,                     # (B, 1) first decode input token
    shards,
    offset: jax.Array,                  # () int32 logical position of tok
    *,
    runner: Runner,
    mesh: Mesh,
    axis: str = "seq",
    model_axis: Optional[str] = None,
    press=None,
    press_state=None,
    max_new_tokens: int = 32,
    eos_id: Optional[int] = None,
    prefill_shard_len=None,
):
    """Greedy-decode ``max_new_tokens`` in ONE dispatch: the per-token loop is
    a ``lax.scan`` *inside* the shard_map, so the host issues a single program
    instead of one per token — on a real pod the per-step host dispatch
    (~1 ms, CLAUDE.md) otherwise dominates short-context decode.

    Returns (tokens (B, max_new_tokens), shards, offset+N, overflow, state).
    Rows that hit ``eos_id`` keep emitting ``eos_id``; their K/V appends
    continue (cannot be skipped under jit) but are never read by the returned
    tokens. The tail buffer must hold all N appends — callers pre-grow
    (``ensure_tail_capacity``); on overflow the remaining appends are dropped
    and the flag is returned (never a silent overwrite).
    """
    if len(shards) == 6:
        keys, values, lengths, masks, key_scales, value_scales = shards
        scales = (key_scales, value_scales)
        kv_bits = 4 if keys.dtype == jnp.uint8 else 8
    else:
        keys, values, lengths, masks = shards
        scales = None
        kv_bits = 8
    if runner.cfg.sliding_window is not None:
        assert prefill_shard_len is not None, (
            "sliding-window models need prefill_shard_len (= prefill S // "
            "n_seq) to map shard slots to global positions"
        )
        psl = jnp.asarray(prefill_shard_len, jnp.int32)
    else:
        psl = jnp.asarray(0, jnp.int32)
    model_size = mesh.shape[model_axis] if model_axis is not None else 1
    mp = model_axis
    cfg = runner.cfg
    n_seq = mesh.shape[axis]
    seq_tp = (
        model_axis is None
        and n_seq > 1
        and cfg.num_heads % n_seq == 0
        and cfg.num_kv_heads % n_seq == 0
        and cfg.intermediate_size % n_seq == 0
        # int4 weights pack contraction-dim halves into nibbles (models/
        # llama.py _lin): the manual row split in _local_decode would slice
        # PACKED rows, pairing wrong lo/hi channels — fall back to
        # replicated compute (int8/bf16 weights keep the seq-tp read split).
        and params["layers"]["wo"].dtype != jnp.uint8
    )

    from .mesh import layer_param_specs

    params_spec = {
        "embed": P(),
        "ln_f": P(),
        "layers": layer_param_specs(params["layers"], mp),
    }
    if "lm_head" in params:
        params_spec["lm_head"] = P()
    if "embed_scale" in params:
        params_spec["embed_scale"] = P()
    if "lm_head_scale" in params:
        params_spec["lm_head_scale"] = P()
    kv_spec = (
        P(None, None, mp, axis, None) if mp is not None
        else P(None, None, None, axis, None)
    )
    mask_spec = (
        P(None, None, mp, axis) if mp is not None else P(None, None, None, axis)
    )
    len_spec = P(axis) if mp is None else P((mp, axis))
    if press_state is None:
        press_state = jnp.zeros((runner.cfg.num_layers,), jnp.int32)
    state_spec = jax.tree_util.tree_map(lambda _: P(), press_state)
    scales_spec = None if scales is None else (kv_spec, kv_spec)

    def local(params, tok, keys, values, lengths, masks, offset, pstate, scs,
              psl):
        def step(carry, _):
            tok, keys, values, lengths, masks, off, pstate, done, scs = carry
            (logits, keys, values, lengths, masks, ovf, pstate,
             scs) = _local_decode(
                params, tok, keys, values, lengths, masks, off, pstate, scs,
                psl,
                runner=runner, axis_name=axis, model_axis=model_axis,
                model_size=model_size, seq_tp=seq_tp, press=press,
                kv_bits=kv_bits,
            )
            ntok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            if eos_id is not None:
                ntok = jnp.where(done[:, None], jnp.int32(eos_id), ntok)
                done = done | (ntok[:, 0] == eos_id)
            carry = (ntok, keys, values, lengths, masks, off + 1, pstate,
                     done, scs)
            return carry, (ntok[:, 0], ovf)

        done0 = jnp.zeros((tok.shape[0],), bool)
        carry0 = (tok, keys, values, lengths, masks, offset, pstate, done0, scs)
        carry, (toks, ovfs) = jax.lax.scan(
            step, carry0, None, length=max_new_tokens
        )
        _, keys, values, lengths, masks, off, pstate, _, scs = carry
        return (toks.T, keys, values, lengths, masks, off,
                jnp.max(ovfs), pstate, scs)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(params_spec, P(), kv_spec, kv_spec, len_spec, mask_spec,
                  P(), state_spec, scales_spec, P()),
        out_specs=(P(), kv_spec, kv_spec, len_spec, mask_spec, P(), P(),
                   state_spec, scales_spec),
        check_vma=False,
    )
    (toks, keys, values, lengths, masks, offset, overflow, press_state,
     scales) = fn(
        params, tok, keys, values, lengths, masks, offset, press_state, scales,
        psl,
    )
    out_shards = (
        (keys, values, lengths, masks) if scales is None
        else (keys, values, lengths, masks) + tuple(scales)
    )
    return toks, out_shards, offset, overflow, press_state


def ensure_tail_capacity(shards, n_shards: int, extra: int):
    """Grow shard tail buffers (host-side, one small transfer) so ``extra``
    appends fit on the last shard without overflow. No-op when slack exists."""
    import numpy as np

    lengths = np.asarray(shards[2]).reshape(-1)
    Sl = shards[0].shape[3] // n_shards       # per-shard slots (global seq dim)
    need = int(lengths.max()) + extra - Sl
    if need <= 0:
        return shards
    return grow_shards(shards, n_shards, need)


def grow_shards(shards, n_shards: int, extra: int):
    """Extend every shard's tail buffer by ``extra`` slots (zero-filled, mask
    False, scales 1.0). The seq-sharded global buffer interleaves shards
    contiguously, so padding must go inside each shard's block, not at the
    global end. Accepts the bf16 4-tuple or the quantized 6-tuple."""
    keys, values, lengths, masks = shards[:4]

    def pad_block(a, fill):
        # (..., n*Sl, ...) on the seq dim → (..., n, Sl, ...) → pad → back.
        seq_dim = 3 if a.ndim == 5 else a.ndim - 1
        Sg = a.shape[seq_dim]
        Sl = Sg // n_shards
        shape = a.shape[:seq_dim] + (n_shards, Sl) + a.shape[seq_dim + 1:]
        a = a.reshape(shape)
        pad = [(0, 0)] * a.ndim
        pad[seq_dim + 1] = (0, extra)
        a = jnp.pad(a, pad, constant_values=fill)
        out_shape = (
            a.shape[:seq_dim] + (n_shards * (Sl + extra),) + a.shape[seq_dim + 2:]
        )
        return a.reshape(out_shape)

    out = (
        pad_block(keys, 0),
        pad_block(values, 0),
        lengths,
        pad_block(masks, False),
    )
    if len(shards) == 6:
        out = out + (pad_block(shards[4], 1.0), pad_block(shards[5], 1.0))
    return out


def context_parallel_generate(
    params: dict,
    ids: jax.Array,                     # (B, S) context token ids
    *,
    runner: Runner,
    mesh: Mesh,
    press=None,
    decode_press=None,                  # DecodingPress-family, shard-local
    axis: str = "seq",
    model_axis: Optional[str] = None,
    max_new_tokens: int = 32,
    eos_id: Optional[int] = None,
    fused: bool = False,
    quantized: bool = False,            # int8/int4 KV shards end to end
    kv_bits: int = 8,
):
    """Compress-then-generate entirely on the mesh: context-parallel prefill
    (shard-local compression), then greedy decode with the split-KV combine —
    the KV cache never leaves its shards. Returns (B, <=max_new_tokens) ids.

    ``fused=True`` runs the whole token loop in one dispatch
    (context_parallel_generate_fused) after pre-growing the tail buffers —
    use on real pods where per-step host dispatch dominates.

    ``decode_press`` compresses DURING generation, shard-locally (its
    target_size is a per-shard budget — see context_parallel_decode_step).

    The first generated token is produced from the last context token
    re-projected against the sharded cache (matching the single-device
    pipeline's uncompressed-question decode contract)."""
    from .context_prefill import context_parallel_prefill

    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh,
        axis=axis, model_axis=model_axis, quantized=quantized, kv_bits=kv_bits,
    )
    S = ids.shape[1]
    offset = jnp.asarray(S, jnp.int32)
    tok = ids[:, -1:]
    out = []
    n_seq = mesh.shape[axis]
    psl = jnp.asarray(S // n_seq, jnp.int32)
    dstate = (
        decode_press.init_state(runner.cfg, ids.shape[0], 1)
        if decode_press is not None else None
    )
    if fused:
        shards = ensure_tail_capacity(shards, n_seq, max_new_tokens + 1)
        toks, shards, offset, overflow, dstate = context_parallel_generate_fused(
            params, tok, shards, offset,
            runner=runner, mesh=mesh, axis=axis, model_axis=model_axis,
            press=decode_press, press_state=dstate,
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            prefill_shard_len=psl,
        )
        assert not int(overflow)
        if eos_id is not None:
            # match the host loop's contract: stop after the first eos row-0
            arr = list(toks[0])
            if eos_id in [int(t) for t in arr]:
                n = [int(t) for t in arr].index(eos_id) + 1
                return toks[:, :n]
        return toks
    for _ in range(max_new_tokens):
        prev = shards
        logits, shards, offset2, overflow, dstate = context_parallel_decode_step(
            params, tok, shards, offset,
            runner=runner, mesh=mesh, axis=axis, model_axis=model_axis,
            press=decode_press, press_state=dstate, prefill_shard_len=psl,
        )
        if int(overflow):
            # Tail buffer exhausted: the step neither stored the token's K/V
            # nor attended it — grow every shard and redo the step exactly.
            shards = grow_shards(prev, n_seq, max(32, max_new_tokens))
            logits, shards, offset2, overflow, dstate = context_parallel_decode_step(
                params, tok, shards, offset,
                runner=runner, mesh=mesh, axis=axis, model_axis=model_axis,
                press=decode_press, press_state=dstate, prefill_shard_len=psl,
            )
            assert not int(overflow)
        offset = offset2
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(tok)
        if eos_id is not None and int(tok[0, 0]) == eos_id:
            break
    return jnp.concatenate(out, axis=1)
