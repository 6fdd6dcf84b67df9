"""Context-parallel prefill: the full model forward with the *sequence* axis
sharded over the mesh, ring attention across shards, and shard-local press
compaction (SURVEY §2.8/§5: the reference has no sequence parallelism; its
nearest analogue is algorithmic chunking).

Semantics: compression is applied per sequence shard — identical math to the
single-device ``ChunkPress(press, chunk_length=S/N)`` (uniform compression
along the sequence), which the equivalence test exploits. Dense layers run
purely shard-local; the only cross-shard communication is the ring rotation
of K/V blocks inside attention (point-to-point over ICI).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import Runner, _act, _lin, _project_qkv, embed_tokens, rms_norm
from ..presses.base import BasePress, LayerCtx
from ..rope import apply_rope, rope_cos_sin
from .ring import ring_flash_self_attention, ring_self_attention


def _local_forward(
    params: dict,
    ids_local: jax.Array,              # (B, S_local)
    runner: Runner,
    press: Optional[BasePress],
    axis_name: str,
    model_axis: Optional[str] = None,
    model_size: int = 1,
    quantized: bool = False,
    kv_bits: int = 8,
):
    cfg = runner.cfg
    if model_size > 1:
        # Tensor parallel within each sequence shard: local head/ffn counts.
        cfg = dataclasses.replace(
            cfg,
            num_heads=cfg.num_heads // model_size,
            num_kv_heads=cfg.num_kv_heads // model_size,
            intermediate_size=cfg.intermediate_size // model_size,
        )
        runner = dataclasses.replace(runner, cfg=cfg)
    B, Sl = ids_local.shape
    idx = jax.lax.axis_index(axis_name)
    positions = idx * Sl + jnp.arange(Sl, dtype=jnp.int32)
    positions = jnp.broadcast_to(positions[None], (B, Sl))
    inv_freq = runner.inv_freq()
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None else cfg.head_dim ** -0.5
    )

    x = embed_tokens(params, ids_local, cfg)

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    sflags = jnp.asarray(cfg.sliding_flags())
    window = cfg.sliding_window

    def body(carry, xs):
        xh = carry
        layer, lid = xs
        sliding_flag = sflags[lid]
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
        if cfg.rope_local_base_freq is not None:
            # Gemma3: sliding layers rotate at the local base frequency.
            cos_l, sin_l = rope_cos_sin(
                runner.inv_freq_local(), positions, 1.0
            )
            cos = jnp.where(sliding_flag, cos_l, cos)
            sin = jnp.where(sliding_flag, sin_l, sin)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q_pre, cos, sin)
        k = apply_rope(k_pre, cos, sin)

        if runner.attn_impl == "flash":
            # Pallas flash inside the ring step — the only path that fits
            # 128K-class shards (naive blocks are O(Sl²) f32).
            attn_out = ring_flash_self_attention(
                q, k, v, axis_name=axis_name, sm_scale=scale,
                softcap=cfg.logit_softcap,
                window=window, window_active=sliding_flag,
            )
        else:
            attn_out = ring_self_attention(
                q, k, v, axis_name=axis_name, sm_scale=scale,
                window=window, window_active=sliding_flag,
            )

        keys, values = k, v
        length = jnp.asarray(Sl, jnp.int32)
        mask = jnp.ones((B, cfg.num_kv_heads, Sl), bool)
        if press is not None:
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
            keys, values, length, mask, _ = press.layer_compress(
                ctx, keys, values, length, mask, None
            )
            if window is not None:
                # Sliding layers are never compressed (reference
                # base_press.py:195-200): restore contents, length AND mask —
                # the distributed decode relies on slot==position on sliding
                # layers for its window test (parallel/decode.py).
                keys = jnp.where(sliding_flag, k, keys)
                values = jnp.where(sliding_flag, v, values)
                length = jnp.where(
                    sliding_flag, jnp.asarray(Sl, jnp.int32), length
                )
                mask = jnp.where(
                    sliding_flag, jnp.ones((B, cfg.num_kv_heads, Sl), bool),
                    mask,
                )

        o = _lin(attn_out.transpose(0, 2, 1, 3).reshape(B, Sl, -1), layer, "wo")
        if model_axis is not None:
            o = jax.lax.psum(o, model_axis)          # combine head shards
        if cfg.post_norms:
            o = rms_norm(o, layer["ln1_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        xh = xh + o
        h2 = rms_norm(xh, layer["ln2"], cfg.rms_norm_eps, cfg.rms_one_offset)
        mlp = _act(_lin(h2, layer, "wg"), cfg.act) * _lin(h2, layer, "wu")
        mlp = _lin(mlp, layer, "wd")
        if model_axis is not None:
            mlp = jax.lax.psum(mlp, model_axis)      # combine ffn shards
        if cfg.post_norms:
            mlp = rms_norm(mlp, layer["ln2_post"], cfg.rms_norm_eps, cfg.rms_one_offset)
        xh = xh + mlp
        if quantized:
            # Quantized STORAGE only (attention above ran on the fresh bf16
            # projections): per-token payload+scales, identical math to the
            # single-device quantized cache — quantize_kv is per-(token,
            # head), so shard-local quantization == global quantization.
            from ..cache import quantize_kv

            pk, sk = quantize_kv(keys, kv_bits)
            pv, sv = quantize_kv(values, kv_bits)
            return xh, (pk, pv, length, mask, sk, sv)
        return xh, (keys, values, length, mask)

    if quantized:
        x, (keys, values, lengths, masks, ks, vs) = jax.lax.scan(
            body, x, (params["layers"], layer_ids)
        )
        return keys, values, lengths, masks, ks, vs
    x, (keys, values, lengths, masks) = jax.lax.scan(
        body, x, (params["layers"], layer_ids)
    )
    return keys, values, lengths, masks


@functools.partial(
    jax.jit,
    static_argnames=("runner", "press", "mesh", "axis", "model_axis",
                     "quantized", "kv_bits"),
)
def context_parallel_prefill(
    params: dict,
    ids: jax.Array,                     # (B, S), S divisible by mesh axis size
    *,
    runner: Runner,
    press: Optional[BasePress] = None,
    mesh: Mesh,
    axis: str = "seq",
    model_axis: Optional[str] = None,
    quantized: bool = False,
    kv_bits: int = 8,
):
    """Returns per-layer (keys, values, lengths, masks) with the sequence
    dimension sharded over ``axis`` and (optionally) heads/ffn sharded over
    ``model_axis`` — 2D sp×tp: ring attention over ICI on the sequence axis,
    one psum per attention/MLP block on the model axis. Each shard's valid
    prefix holds its locally-kept entries.

    ``quantized=True`` stores int8 (``kv_bits=8``) or packed-int4 payloads
    plus per-token scales — the tuple gains (key_scales, value_scales) and
    pairs with the quantized distributed decode (parallel/decode.py). At the
    128K north star this composes the two big levers: sequence parallelism
    for the prefill and payload-width HBM reads for decode."""
    model_size = mesh.shape[model_axis] if model_axis is not None else 1
    mp = model_axis
    assert press is None or not getattr(press, "rerotates", False), (
        "key-rerotating presses (KeyRerotation/Finch) renumber kept keys to "
        "contiguous positions PER SHARD — every shard would claim the same "
        "position range, which the split-KV decode combine cannot reconcile. "
        "Use them on the single-device pipeline or a (data, model) mesh."
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

    out_specs = (
        kv_spec,                           # keys   (L,B,H,S,D) | payload
        kv_spec,                           # values
        P(axis) if mp is None else P((mp, axis)),  # per-shard lengths
        mask_spec,                         # masks
    )
    if quantized:
        out_specs = out_specs + (kv_spec, kv_spec)     # per-token scales
    fn = shard_map(
        functools.partial(
            _local_forward, runner=runner, press=press, axis_name=axis,
            model_axis=model_axis, model_size=model_size,
            quantized=quantized, kv_bits=kv_bits,
        ),
        mesh=mesh,
        in_specs=(params_spec, P(None, axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(params, ids)


def _local_forward_kvcompose(
    params: dict,
    ids_local: jax.Array,              # (B, S_local) of the DOUBLED sequence
    runner: Runner,
    axis_name: str,
    ctx_len: int,
    agg: str,
):
    """Shard-local body of :func:`context_parallel_kvcompose`: a pressless
    forward over the doubled sequence with, per layer, (a) ring attention
    returning each local query's logsumexp and (b) the query-rotating
    column-aggregation sweep (ring_colagg) that accumulates the re-fed
    copy's attention onto this shard's columns."""
    from .ring import ring_colagg, ring_self_attention_lse

    cfg = runner.cfg
    B, Sl = ids_local.shape
    idx = jax.lax.axis_index(axis_name)
    positions = idx * Sl + jnp.arange(Sl, dtype=jnp.int32)
    positions = jnp.broadcast_to(positions[None], (B, Sl))
    inv_freq = runner.inv_freq()
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None else cfg.head_dim ** -0.5
    )
    x = embed_tokens(params, ids_local, cfg)

    def body(xh, layer):
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q_pre, cos, sin)
        k = apply_rope(k_pre, cos, sin)
        attn_out, lse = ring_self_attention_lse(
            q, k, v, axis_name=axis_name, sm_scale=scale,
        )
        part = ring_colagg(
            q, k, lse, axis_name=axis_name, sm_scale=scale,
            ctx_len=ctx_len, agg=agg,
        )
        o = _lin(attn_out.transpose(0, 2, 1, 3).reshape(B, Sl, -1),
                 layer, "wo")
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
        return xh + mlp, (k, v, part)

    _, (keys, values, scores) = jax.lax.scan(body, x, params["layers"])
    return keys, values, scores


def context_parallel_kvcompose(
    params: dict,
    ids: jax.Array,                     # (B=1, S); 2S divisible by axis size
    *,
    runner: Runner,
    press,                              # KVComposePress (unstructured)
    mesh: Mesh,
    axis: str = "seq",
):
    """KVCompose over a sequence mesh — the multi-chip form of the press
    whose scoring pass (~2x context KV, reference kvcompose_press.py:
    377-379) exceeds a single 16 GB chip at 128K.

    ONE ring pass over the DOUBLED sequence ``[ctx | ctx]`` — the re-fed
    copy sits at positions S..2S-1, so causal attention over the doubled
    sequence gives the second copy exactly the single-device re-feed's
    semantics (context + previously re-fed tokens) while the first half
    produces the context KV. Per layer, a query-rotating second ring sweep
    (ring_colagg) accumulates each shard's columns' attention aggregation
    from the re-fed queries — the distributed analogue of
    ops/attention.refeed_colagg. Budgets/masks run host-side on the
    gathered (L, H, S) scores (press.budgets_and_masks, identical to the
    single-device path), and the result is returned as a
    ``context_parallel_prefill``-layout (keys, values, lengths, masks)
    tuple — resharded over the FULL axis and masked by the KVCompose
    unstructured keep — ready for ``context_parallel_decode_step``.

    Unstructured mode only: a structured (physically rebuilt) cache would
    need a global cross-shard repack that breaks the slot==position map the
    distributed decode relies on; the unstructured mask has identical
    attention semantics. add_v_norm is unsupported here (it would gather
    the full value tensor host-side)."""
    import numpy as np
    from jax.sharding import NamedSharding

    cfg = runner.cfg
    assert not press.structured, (
        "context_parallel_kvcompose supports unstructured mode only "
        "(structured rebuild would repack slots across shards, breaking "
        "the distributed decode's slot==position map)"
    )
    assert not press.add_v_norm, "add_v_norm unsupported on the mesh path"
    assert cfg.sliding_window is None, (
        "KVCompose does not run on sliding-window models"
    )
    N = mesh.shape[axis]
    B, S = ids.shape
    assert B == 1, "the scoring pass is per-request (B=1), like the pipeline"
    assert N % 2 == 0 and (2 * S) % N == 0 and S % N == 0, (
        f"need an even axis ({N}) dividing both S ({S}) and 2S"
    )
    ids2 = jnp.concatenate([ids, ids], axis=1)

    from .mesh import layer_param_specs

    params_spec = {
        "embed": P(),
        "ln_f": P(),
        "layers": layer_param_specs(params["layers"], None),
    }
    for extra in ("lm_head", "embed_scale", "lm_head_scale"):
        if extra in params:
            params_spec[extra] = P()
    kv_spec = P(None, None, None, axis, None)
    fn = shard_map(
        functools.partial(
            _local_forward_kvcompose, runner=runner, axis_name=axis,
            ctx_len=S, agg=press.agg_task,
        ),
        mesh=mesh,
        in_specs=(params_spec, P(None, axis)),
        out_specs=(kv_spec, kv_spec, P(None, None, None, axis)),
        check_vma=False,
    )
    keys2, values2, scores2 = fn(params, ids2)

    # host: group aggregation + global budgets/masks (the exact
    # single-device code path — budgets_and_masks is shared)
    sc = np.asarray(jax.device_get(scores2))[..., :S]      # (L, B, Hq, S)
    task = sc if press.agg_task == "max" else sc / S
    L, _, Hq, _ = task.shape
    Hkv = cfg.num_kv_heads
    grouped = task.reshape(L, 1, Hkv, Hq // Hkv, S)
    sc_h = (grouped.max(axis=3) if press.agg_group == "max"
            else grouped.mean(axis=3))[:, 0]               # (L, Hkv, S)
    _, keep = press.budgets_and_masks(sc_h, None)          # (L, Hkv, S) bool

    kv_sh = NamedSharding(mesh, kv_spec)
    mask_sh = NamedSharding(mesh, P(None, None, None, axis))
    keys_ctx = jax.device_put(keys2[:, :, :, :S], kv_sh)
    values_ctx = jax.device_put(values2[:, :, :, :S], kv_sh)
    masks = jax.device_put(
        jnp.broadcast_to(jnp.asarray(keep)[:, None], (L, B, Hkv, S)), mask_sh
    )
    lengths = shard_map(
        lambda: jnp.full((cfg.num_layers,), S // N, jnp.int32),
        mesh=mesh, in_specs=(), out_specs=P(axis), check_vma=False,
    )()
    return keys_ctx, values_ctx, lengths, masks
