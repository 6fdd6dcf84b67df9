"""KV cache as an explicit pytree value.

The reference mutates HF ``DynamicCache`` objects in place from forward hooks
(``kvpress/presses/base_press.py:139-161``) and fakes head-wise eviction by
overwriting masked keys with an adversarial vector
(``kvpress/attention_patch.py:43-87``). On TPU/XLA neither is possible nor
desirable: shapes must be static and arrays immutable. Instead:

- keys/values are stacked over layers: ``(L, B, H_kv, S_max, D)`` with a
  per-layer valid ``length (L,)`` — eviction = gather-into-front + length drop.
- head-wise eviction is a boolean keep-``mask (L, B, H_kv, S_max)`` consumed by
  the attention kernel as ``-inf`` bias (strictly better than the reference's
  fake-key trick, which "does not reduce peak memory", attention_patch.py:47).
- an optional int8 per-token quantization codec stores keys/values packed with
  scales; dequantization fuses into attention (reference: optimum-quanto
  QuantizedCache, SURVEY §2 item 2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    keys: jax.Array                       # (L, B, H_kv, S_max, D) or int payload
    values: jax.Array                     # same shape as keys
    length: jax.Array                     # (L,) int32: valid entries per layer
    offset: jax.Array                     # () int32: logical (uncompressed) seq len
    # True = attendable. Starts all-True up to length; head-wise presses clear bits.
    mask: Optional[jax.Array] = None      # (L, B, H_kv, S_max) bool
    key_scales: Optional[jax.Array] = None    # (L, B, H_kv, S_max, 1) f32 if quantized
    value_scales: Optional[jax.Array] = None
    # Quantization width: 8 = int8 payload, 4 = two nibbles packed per uint8
    # (payload last dim = D//2). Static pytree metadata.
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    # () bool — raised by Runner.forward when an append would not fit in
    # max_size (the write CLAMPS and overwrites tail slots — results from
    # that step on are invalid). Check after decode loops; ``grow`` first to
    # reserve room. None (host-constructed caches) reads as False.
    overflowed: Optional[jax.Array] = None

    @property
    def is_quantized(self) -> bool:
        return self.key_scales is not None

    @property
    def max_size(self) -> int:
        return self.keys.shape[3]

    @property
    def num_layers(self) -> int:
        return self.keys.shape[0]

    def layer_kv(self, layer_keys, layer_values, layer_key_scales=None,
                 layer_value_scales=None, dtype=jnp.bfloat16):
        """Dequantize one layer's (B, H_kv, S, D) K/V if needed."""
        if self.is_quantized:
            k = layer_keys.astype(jnp.float32) * layer_key_scales
            v = layer_values.astype(jnp.float32) * layer_value_scales
            return k.astype(dtype), v.astype(dtype)
        return layer_keys, layer_values


def init_cache(
    cfg: ModelConfig,
    batch: int,
    max_size: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    bits: int = 8,
) -> KVCache:
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    if quantized:
        assert bits in (8, 4)
        payload_d = D if bits == 8 else D // 2
        payload_t = jnp.int8 if bits == 8 else jnp.uint8
        keys = jnp.zeros((L, batch, H, max_size, payload_d), payload_t)
        values = jnp.zeros((L, batch, H, max_size, payload_d), payload_t)
        ks = jnp.ones((L, batch, H, max_size, 1), jnp.float32)
        vs = jnp.ones((L, batch, H, max_size, 1), jnp.float32)
    else:
        keys = jnp.zeros((L, batch, H, max_size, D), dtype)
        values = jnp.zeros((L, batch, H, max_size, D), dtype)
        ks = vs = None
    return KVCache(
        keys=keys,
        values=values,
        length=jnp.zeros((L,), jnp.int32),
        offset=jnp.zeros((), jnp.int32),
        mask=None,
        key_scales=ks,
        value_scales=vs,
        bits=bits,
        overflowed=jnp.zeros((), bool),
    )


def quantize_kv(x: jax.Array, bits: int = 8) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric quantization along head_dim.

    bits=8 → int8 payload; bits=4 → two nibbles packed per uint8 (payload
    last dim D//2), the int4 analogue of the reference's quanto cache.
    int4 packs channel ``c`` (low nibble) with channel ``c + D/2`` (high
    nibble) — concatenated halves, not interleaved, so the fused decode
    kernel (ops/decode.py) unpacks with two contiguous half-width dots
    instead of a lane-interleave relayout Mosaic can't do."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if bits == 8:
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale
    assert bits == 4 and x.shape[-1] % 2 == 0
    D2 = x.shape[-1] // 2
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7).astype(jnp.int32)
    q = q + 8                                               # [0, 15]
    lo, hi = q[..., :D2], q[..., D2:]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def dequantize_kv(payload: jax.Array, scale: jax.Array, bits: int, dtype):
    if bits == 8:
        return (payload.astype(jnp.float32) * scale).astype(dtype)
    p = payload.astype(jnp.int32) & 0xFF
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    out = jnp.concatenate(
        [lo.astype(jnp.float32), hi.astype(jnp.float32)], axis=-1
    )
    return (out * scale).astype(dtype)


def valid_mask(cache: KVCache) -> jax.Array:
    """(L, B, H_kv, S_max) bool — attendable slots (length- and head-mask-aware)."""
    L, B, H, S, _ = cache.keys.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    m = pos[None, :] < cache.length[:, None]          # (L, S)
    m = jnp.broadcast_to(m[:, None, None, :], (L, B, H, S))
    if cache.mask is not None:
        m = m & cache.mask
    return m


def masked_fraction(cache: KVCache) -> jax.Array:
    """Fraction of valid slots masked out head-wise — the measured compression
    ratio of mask-based presses (AdaKV/DMS; reference dms_press.py:122-127)."""
    L, B, H, S, _ = cache.keys.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    valid = pos[None, :] < cache.length[:, None]              # (L, S)
    valid = jnp.broadcast_to(valid[:, None, None, :], (L, B, H, S))
    if cache.mask is None:
        return jnp.asarray(0.0)
    masked = valid & ~cache.mask
    return jnp.sum(masked) / jnp.maximum(jnp.sum(valid), 1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_masked_layer(cache: KVCache, l_idx) -> KVCache:
    """One layer's head-wise compaction, written back in place on the
    DONATED cache (peak memory = the single cache + one layer's transients;
    an all-layer gather would need a full second cache next to 8B weights).
    ``l_idx`` is traced — the host loop compiles once."""
    mask_l = cache.mask[l_idx]                                   # (B, H, S)
    S = mask_l.shape[-1]
    pos = jnp.arange(S, dtype=jnp.int32)
    # Invalid slots (>= length) carry mask=True by convention — exclude
    # them or they would count into (and interleave with) the kept set.
    keep = mask_l & (pos[None, None] < cache.length[l_idx])
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)

    def g(buf):
        if buf is None:
            return None
        layer = jnp.take_along_axis(buf[l_idx], order[..., None], axis=2)
        return jax.lax.dynamic_update_slice(
            buf, layer[None], (l_idx, 0, 0, 0, 0)
        )

    counts = jnp.sum(keep, axis=-1)                              # (B, H)
    new_mask_l = pos[None, None] < counts[..., None]
    return dataclasses.replace(
        cache,
        keys=g(cache.keys), values=g(cache.values),
        key_scales=g(cache.key_scales), value_scales=g(cache.value_scales),
        mask=jax.lax.dynamic_update_slice(
            cache.mask, new_mask_l[None], (l_idx, 0, 0, 0)
        ),
        length=cache.length.at[l_idx].set(jnp.max(counts).astype(jnp.int32)),
    )


def compact_masked(cache: KVCache) -> KVCache:
    """Gather each head's kept (mask-True, valid) entries to its buffer
    front and drop per-layer length to the max per-head kept count — the
    stacked-cache counterpart of AdaKV's ``compact=True`` for presses that
    evict via mask bits after prefill (KVzip / FastKVzip; the reference's
    fake-key eviction cannot reclaim memory, attention_patch.py:47).
    Kept entries preserve relative order (stable sort), so slot-based
    causality and stored post-RoPE keys are untouched — identical
    semantics to scorer-press gather-to-front eviction. Follow with the
    host-level shrink/resize to realize the HBM saving; at 8B/128K that
    halves decode-step cache traffic AND makes the decode fit at all
    (2 non-donated copies of the full masked buffer do not)."""
    if cache.mask is None:
        return cache
    for l in range(cache.keys.shape[0]):
        cache = _compact_masked_layer(cache, jnp.asarray(l, jnp.int32))
    return cache


def shrink(cache: KVCache, new_size: int) -> KVCache:
    """Host-level re-bucketing: slice buffers down to ``new_size`` slots.

    Valid entries are always front-compacted, so a plain slice preserves them.
    Call outside jit after compression to realize the memory saving before the
    decode loop (static-shape equivalent of the reference's in-place shrink).
    """
    def cut(x):
        return None if x is None else x[:, :, :, :new_size]
    return dataclasses.replace(
        cache,
        keys=cut(cache.keys),
        values=cut(cache.values),
        mask=cut(cache.mask),
        key_scales=cut(cache.key_scales),
        value_scales=cut(cache.value_scales),
    )


def resize(cache: KVCache, new_size: int) -> KVCache:
    """Re-bucket to EXACTLY ``new_size`` slots: shrink when the buffer is
    larger, grow when it is smaller. ``shrink`` alone silently no-ops when
    asked to enlarge — callers sizing for question + generation appends must
    use this (the decode append would otherwise clamp into the last slots
    and corrupt them)."""
    if cache.max_size > new_size:
        return shrink(cache, new_size)
    if cache.max_size < new_size:
        return grow(cache, new_size - cache.max_size)
    return cache


def grow(cache: KVCache, extra: int) -> KVCache:
    """Pad the sequence axis with ``extra`` empty slots (for decode appends)."""
    def pad(x, fill):
        if x is None:
            return None
        pads = [(0, 0)] * x.ndim
        pads[3] = (0, extra)
        return jnp.pad(x, pads, constant_values=fill)
    return dataclasses.replace(
        cache,
        keys=pad(cache.keys, 0),
        values=pad(cache.values, 0),
        mask=pad(cache.mask, True),
        key_scales=pad(cache.key_scales, 1.0),
        value_scales=pad(cache.value_scales, 1.0),
    )


def append_layer_kv(
    cache_layer_keys: jax.Array,
    cache_layer_values: jax.Array,
    length: jax.Array,
    new_keys: jax.Array,
    new_values: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Write (B, H, T, D) new K/V at slot ``length`` of one layer's buffers."""
    T = new_keys.shape[2]
    keys = jax.lax.dynamic_update_slice_in_dim(
        cache_layer_keys, new_keys.astype(cache_layer_keys.dtype), length, axis=2
    )
    values = jax.lax.dynamic_update_slice_in_dim(
        cache_layer_values, new_values.astype(cache_layer_values.dtype), length, axis=2
    )
    return keys, values, length + T
