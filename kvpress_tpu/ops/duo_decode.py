"""Split-cache decode for head-static contiguous eviction (DuoAttention).

Duo's structure is static per (layer, kv-head): streaming heads keep ONLY
sink + recent (+ whatever decode appends), retrieval heads keep everything
(reference duo_attention_press.py:88-118 masks the middle via
masked_key_indices — bandwidth it can never reclaim,
attention_patch.py:47). Dense masked decode here had the same flaw: the
-inf bias skips FLOPs XLA-side but still READS every evicted slot's bytes.

The round-2 paged-kernel experiment (ops/decode_attention.py, retired this
round) proved page tables cannot win under SCATTERED masks — pages only
skip under CONTIGUOUS eviction. Duo's eviction is exactly that, and it is
HEAD-STATIC, so no tables are needed at all: split the cache into

  retrieval buffer  (L, B, Hr_max, S_full, D)   — appends at length
  streaming buffer  (L, B, Hs_max, sink+recent+room, D)

run two dense attentions per layer, and merge outputs by a static head
permutation. Streaming heads' HBM reads drop from S_full to ~sink+recent:
at head_ratio 0.5 the decode attention bytes halve — exact, pure XLA, no
kernels, no masks (every slot in each buffer is live).

Per-layer head membership differs (Duo's budget is a global bottom-k across
L×H), so head-index arrays are per-layer scan inputs padded to the max
count; padded lanes compute garbage that the merge permutation simply never
gathers.

Decode semantics match the dense path exactly: the keep-set is fixed at
compress time and new decode tokens are visible to every head (the
reference's masked_key_indices are likewise frozen after prefill).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import KVCache
from ..config import ModelConfig
from ..ops.attention import NEG_INF, gqa_attention
from ..rope import apply_rope, rope_cos_sin


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DuoSplitCache:
    keys_r: jax.Array        # (L, B, Hr_max, S_r, D)
    values_r: jax.Array
    keys_s: jax.Array        # (L, B, Hs_max, S_s, D)
    values_s: jax.Array
    len_r: jax.Array         # (L,) int32 valid length in retrieval buffers
    len_s: jax.Array         # (L,) int32 valid length in streaming buffers
    retr_idx: jax.Array      # (L, Hr_max) int32 kv-head ids (padded w/ 0)
    stream_idx: jax.Array    # (L, Hs_max) int32
    inv_idx: jax.Array       # (L, Hkv) int32 into concat(retr, stream) rows
    offset: jax.Array        # () int32 logical position of the next token


def build_duo_split(cache: KVCache, streaming_mask: np.ndarray,
                    sink: int, recent: int, room: int) -> DuoSplitCache:
    """Split a prefill cache (AFTER Duo's layer_compress set the keep-mask)
    into retrieval/streaming buffers. ``streaming_mask`` is the press's
    static (L, Hkv) bool (DuoAttentionPress.streaming_mask()); ``room``
    reserves append slots for decode."""
    sm = np.asarray(streaming_mask, bool)
    L, B, Hkv, S, D = cache.keys.shape
    assert S >= sink + recent, (
        f"buffer ({S}) smaller than sink+recent ({sink}+{recent}) — a split "
        "cache cannot hold the streaming window; use the dense masked path"
    )
    n_s = sm.sum(axis=1)
    hs_max = int(n_s.max(initial=0))
    hr_max = Hkv - int(n_s.min(initial=0))

    retr_idx = np.zeros((L, hr_max), np.int32)
    stream_idx = np.zeros((L, max(hs_max, 1)), np.int32)
    inv_idx = np.zeros((L, Hkv), np.int32)
    for l in range(L):
        r = np.flatnonzero(~sm[l])
        s = np.flatnonzero(sm[l])
        retr_idx[l, :len(r)] = r
        stream_idx[l, :len(s)] = s
        inv_idx[l, r] = np.arange(len(r))
        inv_idx[l, s] = hr_max + np.arange(len(s))

    ri = jnp.asarray(retr_idx)
    si = jnp.asarray(stream_idx)

    def take_heads(a, idx):
        # a (L,B,H,S,D), idx (L,Hm) → (L,B,Hm,S,D)
        return jax.vmap(lambda al, il: al[:, il])(a, idx)

    keys_r = take_heads(cache.keys, ri)
    values_r = take_heads(cache.values, ri)

    # streaming content: first `sink` slots + the `recent` slots ending at
    # each layer's valid length (Duo leaves length untouched, but another
    # composed press may not — slice per layer)
    s_cap = sink + recent + room

    def slice_stream(a, ln):
        head = a[:, :, :sink]
        # tail starts no earlier than `sink`: for sink <= ln < sink+recent
        # the recent window would otherwise overlap the head (duplicating
        # early tokens and DROPPING the most recent ones); starting at sink
        # keeps slot sink+j == token sink+j, contiguous with the head, and
        # len_s = min(ln, sink+recent) masks the unfilled remainder.
        tail = jax.vmap(
            lambda ab: jax.lax.dynamic_slice_in_dim(
                ab, jnp.maximum(ln - recent, sink), recent, axis=1),
            in_axes=1, out_axes=1,
        )(a)
        pad = jnp.zeros(a.shape[:2] + (room,) + a.shape[3:], a.dtype)
        return jnp.concatenate([head, tail, pad], axis=2)

    keys_s = jax.vmap(slice_stream)(take_heads(cache.keys, si), cache.length)
    values_s = jax.vmap(slice_stream)(
        take_heads(cache.values, si), cache.length)

    len_s = jnp.minimum(cache.length, sink + recent).astype(jnp.int32)
    # Reserve `room` append slots in the retrieval buffer relative to the
    # LONGEST layer's valid length (host-eager: cache.length is concrete) —
    # comparing room against the whole buffer silently left zero free slots
    # on a full prefill cache and decode appends clamped onto the last
    # context token.
    free = S - int(np.max(np.asarray(cache.length)))
    if free < room:
        pad = room - free
        keys_r = jnp.pad(keys_r, ((0, 0),) * 3 + ((0, pad), (0, 0)))
        values_r = jnp.pad(values_r, ((0, 0),) * 3 + ((0, pad), (0, 0)))
    return DuoSplitCache(
        keys_r=keys_r, values_r=values_r,
        keys_s=keys_s, values_s=values_s,
        len_r=cache.length.astype(jnp.int32), len_s=len_s,
        retr_idx=ri, stream_idx=si, inv_idx=jnp.asarray(inv_idx),
        offset=(cache.offset if cache.offset.ndim == 0
                else jnp.max(cache.offset)).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("runner",))
def duo_decode_step(params, tok: jax.Array, ds: DuoSplitCache, *, runner):
    """One greedy token over the split cache:
    tok (B, 1) → (next (B, 1), logits (B, V) f32, ds).

    Mirrors the dense decode layer step (models/llama.py _layer_step /
    serving._decode_step) with the attention split per head class. bf16
    buffers only; sliding-window models are rejected (their window layers
    already have the contiguous structure natively)."""
    from ..models.llama import (
        _act,
        _lin,
        _project_qkv,
        embed_tokens,
        lm_head_logits,
        rms_norm,
    )

    cfg: ModelConfig = runner.cfg
    assert cfg.sliding_window is None, (
        "duo_decode_step supports full-attention models; sliding-window "
        "layers already keep a windowed buffer natively"
    )
    B = tok.shape[0]
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = Hq // Hkv
    hr = ds.retr_idx.shape[1]
    x = embed_tokens(params, tok, cfg)                       # (B, 1, E)
    positions = jnp.broadcast_to(ds.offset[None, None], (B, 1))
    inv_freq = runner.inv_freq()
    scale = (cfg.query_pre_attn_scalar ** -0.5
             if cfg.query_pre_attn_scalar is not None else D ** -0.5)
    cos, sin = rope_cos_sin(inv_freq, positions, runner.attention_scaling)
    cos, sin = cos[:, None], sin[:, None]
    kr_slot = jnp.arange(ds.keys_r.shape[3], dtype=jnp.int32)
    ks_slot = jnp.arange(ds.keys_s.shape[3], dtype=jnp.int32)

    def body(xh, xs):
        (layer, kr, vr, ks_, vs_, lnr, lns, ridx, sidx, iidx) = xs
        h = rms_norm(xh, layer["ln1"], cfg.rms_norm_eps, cfg.rms_one_offset)
        q_pre, k_pre, v = _project_qkv(layer, cfg, h)
        q = apply_rope(q_pre, cos, sin)                      # (B, Hq, 1, D)
        k = apply_rope(k_pre, cos, sin)                      # (B, Hkv, 1, D)

        k_r, v_r = k[:, ridx], v[:, ridx]                    # (B, hr, 1, D)
        k_s, v_s = k[:, sidx], v[:, sidx]
        kr = jax.lax.dynamic_update_slice_in_dim(kr, k_r.astype(kr.dtype),
                                                 lnr, axis=2)
        vr = jax.lax.dynamic_update_slice_in_dim(vr, v_r.astype(vr.dtype),
                                                 lnr, axis=2)
        ks_ = jax.lax.dynamic_update_slice_in_dim(ks_, k_s.astype(ks_.dtype),
                                                  lns, axis=2)
        vs_ = jax.lax.dynamic_update_slice_in_dim(vs_, v_s.astype(vs_.dtype),
                                                  lns, axis=2)

        qg = q.reshape(B, Hkv, G, D)
        q_r = qg[:, ridx].reshape(B, hr * G, 1, D)
        q_s = qg[:, sidx].reshape(B, -1, 1, D)
        bias_r = jnp.where(kr_slot <= lnr, 0.0, NEG_INF)[None, :]   # (1, S_r)
        bias_s = jnp.where(ks_slot <= lns, 0.0, NEG_INF)[None, :]
        o_r, _ = gqa_attention(q_r, kr, vr, bias_r, scale,
                               softcap=cfg.logit_softcap)
        o_s, _ = gqa_attention(q_s, ks_, vs_, bias_s, scale,
                               softcap=cfg.logit_softcap)
        o = jnp.concatenate(
            [o_r.reshape(B, hr, G, D), o_s.reshape(B, -1, G, D)], axis=1
        )[:, iidx].reshape(B, 1, Hq * D)

        o = _lin(o, layer, "wo")
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
        return xh, (kr, vr, ks_, vs_, lnr + 1, lns + 1)

    xs = (params["layers"], ds.keys_r, ds.values_r, ds.keys_s, ds.values_s,
          ds.len_r, ds.len_s, ds.retr_idx, ds.stream_idx, ds.inv_idx)
    x, (nkr, nvr, nks, nvs, nlnr, nlns) = jax.lax.scan(body, x, xs)
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = lm_head_logits(x[:, 0], params, cfg)
    nds = dataclasses.replace(
        ds, keys_r=nkr, values_r=nvr, keys_s=nks, values_s=nvs,
        len_r=nlnr, len_s=nlns, offset=ds.offset + 1,
    )
    return (jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32),
            logits, nds)
