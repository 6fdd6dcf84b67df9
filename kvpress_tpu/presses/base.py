"""Press API — pure functions over cache values, the TPU-native inversion of the
reference's forward-hook design (``kvpress/presses/base_press.py:44-207``).

A press is a frozen dataclass (hashable, static under jit). The model runner
calls ``press.layer_compress`` once per layer *inside* the jitted prefill, with
a ``LayerCtx`` carrying everything any press might need; XLA dead-code-
eliminates whatever a given press does not touch, so providing the full context
costs nothing. Compression never reshapes: kept entries are gathered to the
front of the (static-shape) buffer and ``length`` drops; head-wise eviction
flips bits in a keep-mask consumed by the attention kernel.

Correspondence:
  reference BasePress.compress(module, hidden_states, keys, values, attentions,
  kwargs) -> (keys, values)            (base_press.py:61-99)
  here      press.layer_compress(ctx, keys, values, length, mask)
            -> (keys, values, length, mask)
  reference ScorerPress.score -> topk+gather (scorer_press.py:76-102)
  here      ScorerPress.score(ctx, keys, values) -> (B, H_kv, S) then
            static-k top_k + take_along_axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

# Finite -inf sentinel for score masking: finite so 0*NEG_INF stays 0 (a
# true -inf would make NaNs against zero pad values), large enough to lose
# every top-k against any real score.
NEG_INF = -2.0e38


def _field_fingerprint(v):
    """Hashable content fingerprint of one press field value.

    Arrays / pytrees-of-arrays (loaded artifacts: surrogates, gates, stats,
    budget curves, head scores, LoRA weights) fingerprint by *content*;
    plain Python values and nested presses hash by value already.
    """
    if v is None or isinstance(v, (int, float, bool, str, bytes, frozenset)):
        return v
    if isinstance(v, BasePress):
        return v
    if isinstance(v, dict):
        return tuple(sorted((k, _field_fingerprint(x)) for k, x in v.items()))
    if isinstance(v, (tuple, list)):
        return tuple(_field_fingerprint(x) for x in v)
    a = np.asarray(v)
    return (a.shape, str(a.dtype), hash(a.tobytes()))


def _field_equal(a, b):
    """Exact value equality for press fields (array_equal for arrays — no
    fingerprint-collision risk on the jit-cache __eq__ path)."""
    if a is b:
        return True
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_field_equal(a[k], b[k]) for k in a)
    if isinstance(a, (tuple, list)) and isinstance(b, (tuple, list)):
        return len(a) == len(b) and all(map(_field_equal, a, b))
    if hasattr(a, "shape") or hasattr(b, "shape"):
        try:
            return np.array_equal(np.asarray(a), np.asarray(b))
        except Exception:
            return False
    return a == b


def content_hash_eq(cls):
    """Class decorator: content-based ``__hash__``/``__eq__`` over all
    dataclass fields for presses carrying loaded artifacts (arrays/pytrees,
    which break the frozen-dataclass default hash).

    Presses are STATIC jit arguments, so identity hashing (``id``) makes
    every instance loaded from the same artifact a fresh jit cache key — a
    silent full-model recompile per instance (minutes at 32K). The
    fingerprint is computed once and cached on the instance; ``__eq__``
    compares arrays exactly (array_equal), so a hash collision can never
    alias two different artifacts onto one compiled program.
    """

    def _key(self):
        k = self.__dict__.get("_content_key")
        if k is None:
            k = tuple(
                (f.name, _field_fingerprint(getattr(self, f.name)))
                for f in dataclasses.fields(self)
            )
            object.__setattr__(self, "_content_key", k)
        return k

    def __hash__(self):
        h = self.__dict__.get("_content_hash")
        if h is None:
            h = hash((type(self).__name__, _key(self)))
            object.__setattr__(self, "_content_hash", h)
        return h

    def __eq__(self, other):
        if type(other) is not type(self):
            return NotImplemented
        if _key(self) != _key(other):
            return False
        return all(
            _field_equal(getattr(self, f.name), getattr(other, f.name))
            for f in dataclasses.fields(self)
        )

    cls.__hash__ = __hash__
    cls.__eq__ = __eq__
    return cls


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerCtx:
    """Everything a press may need, computed in the layer body.

    Static fields are carried via dataclasses.field(metadata) registration:
    cfg / seq_len are Python-static; the rest are traced arrays.
    """
    layer_idx: jax.Array                 # () int32
    hidden: jax.Array                    # (B, S, E) post-input-layernorm
    queries: jax.Array                   # (B, Hq, S, D) post-RoPE
    queries_prerope: jax.Array           # (B, Hq, S, D) pre-RoPE (post qk-norm)
    keys_prerope: jax.Array              # (B, Hkv, S, D)
    positions: jax.Array                 # (B, S) int32
    attn_probs: Optional[jax.Array]      # (B, Hq, S, S) if press.needs_attn_probs
    layer_params: Any                    # this layer's weight dict (wq, wo, …)
    inv_freq: jax.Array                  # (D/2,) f32
    cfg: ModelConfig = dataclasses.field(metadata=dict(static=True), default=None)
    attention_scaling: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    window_size: Optional[jax.Array] = None  # dynamic observation window (Finch)
    kv_len: Optional[jax.Array] = None       # traced valid cache length (decode)
    attn_lse: Optional[jax.Array] = None     # (B, Hq, S) f32 row logsumexp from
    # the flash prefill pass (press.wants_lse) — lets colsum scoring skip its
    # own LSE sweep (ops/observed_colsum.py pass 1).

    @property
    def seq_len(self) -> int:
        return self.hidden.shape[1]

    @property
    def scale(self) -> float:
        if self.cfg.query_pre_attn_scalar is not None:
            return self.cfg.query_pre_attn_scalar ** -0.5
        return self.cfg.head_dim ** -0.5


@dataclasses.dataclass(frozen=True)
class BasePress:
    """No-op base. Frozen → hashable → safe as a static jit argument."""

    # Static trace-time signals for the runner (plain class attributes, not
    # dataclass fields, so subclasses override freely):
    needs_attn_probs = False
    # Which phases this press compresses in (reference is_prefilling routing,
    # base_press.py:37-40 / decoding_press.py:129-131).
    compresses_prefill = True
    compresses_decode = False
    # True when the press implements decode_compress_quantized (payload-width
    # decode compression over int8/int4 buffers — DecodingPress family).
    supports_quantized_decode = False
    # Per-token chunk scoring (DMSPress / FastKVzip through prefill_chunked):
    # a press whose score for token t depends ONLY on that token's own
    # (hidden, k, v) sets ``chunk_score_fn`` to a MODULE-LEVEL function
    # ``(arg, layer_idx, hidden (B,T,E), keys (B,H,T,D), values) ->
    # (B, H_kv, T)`` and exposes its array pytree via ``chunk_score_arg``
    # (passed as a jit ARGUMENT, never closed over — press arrays as HLO
    # constants bloat/hang the axon remote compile, CLAUDE.md). None =
    # not per-token-scorable; the chunked prefill rejects DMS over it.
    chunk_score_fn = None

    @property
    def chunk_score_arg(self):
        return None

    # Mask presses whose eviction should PHYSICALLY compact after prefill
    # (cache.compact_masked applied by the pipeline / serving / bench
    # orchestration) override this to their ``compact`` field — one
    # declarative routing attribute instead of per-caller isinstance
    # checks. Presses that compact inside their own compress (AdaKV
    # family) leave it False.
    @property
    def host_compact(self) -> bool:
        return False

    def wants_probs(self, q_len: int) -> bool:
        """Whether the runner should use the probs-materializing (O(S²)
        memory) attention path for a ``q_len``-token call. Presses with a
        chunked long-context scorer override this to cap the cost."""
        return self.needs_attn_probs

    def wants_lse(self, q_len: int) -> bool:
        """Whether the flash prefill pass should also emit per-row logsumexp
        (ctx.attn_lse) — colsum-scoring presses reuse it to skip their own
        LSE sweep."""
        return False

    def init_state(self, cfg: ModelConfig, batch: int, seq_len: int,
                   dtype=None):
        """Per-layer press state pytree, stacked over layers (leading dim L),
        threaded through the layer scan. None if stateless."""
        return None

    def decode_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        """Compression inside the decode loop (full padded buffers + traced
        length). Default: no-op."""
        return keys, values, length, mask, state

    def max_kept(self, seq_len: int, cfg: ModelConfig) -> int:
        """Static upper bound on kept entries per layer after compression —
        sizing for post-compression cache shrink."""
        return seq_len

    def layer_compress(
        self,
        ctx: LayerCtx,
        keys: jax.Array,              # (B, Hkv, S, D) post-RoPE
        values: jax.Array,
        length: jax.Array,            # () int32 valid length (== S in prefill)
        mask: jax.Array,              # (B, Hkv, S) bool keep-mask
        state=None,
    ):
        return keys, values, length, mask, state

    # Convenience mirror of the reference's observable (scorer_press.py:32).
    @property
    def compression_ratio_obs(self) -> Optional[float]:
        return getattr(self, "compression_ratio", None)


def topk_keep(
    scores: jax.Array,            # (B, H, S) — higher = keep
    keys: jax.Array,              # (B, H, S, D)
    values: jax.Array,
    n_kept: int,
    sort_by_position: bool = False,
):
    """Keep the top-``n_kept`` scored entries per (batch, kv-head), gathered to
    the buffer front. Returns (keys, values) with the tail positions unchanged
    (callers must mask/shrink via the returned length).

    Matches reference scorer_press.py:76-102 (topk + gather along seq).
    """
    B, H, S, D = keys.shape
    _, idx = jax.lax.top_k(scores, n_kept)                  # (B, H, n_kept)
    if sort_by_position:
        idx = jnp.sort(idx, axis=-1)
    kept_k = jnp.take_along_axis(keys, idx[..., None], axis=2)
    kept_v = jnp.take_along_axis(values, idx[..., None], axis=2)
    new_keys = jax.lax.dynamic_update_slice_in_dim(keys, kept_k, 0, axis=2)
    new_values = jax.lax.dynamic_update_slice_in_dim(values, kept_v, 0, axis=2)
    return new_keys, new_values, idx


@dataclasses.dataclass(frozen=True)
class ScorerPress(BasePress):
    """Score-then-keep-top-k (reference scorer_press.py:17-102).

    ``compression_ratio`` is a Python float → static; ``n_kept`` uses the same
    int() floor as the reference so kept lengths match exactly.
    """
    compression_ratio: float = 0.0

    def __post_init__(self):
        assert 0.0 <= self.compression_ratio < 1.0, self.compression_ratio

    def score(self, ctx: LayerCtx, keys, values) -> jax.Array:
        raise NotImplementedError

    def n_kept(self, seq_len: int) -> int:
        return max(1, int(seq_len * (1 - self.compression_ratio)))

    def max_kept(self, seq_len: int, cfg: ModelConfig) -> int:
        return self.n_kept(seq_len)

    def exact_kept(self, seq_len: int) -> Optional[int]:
        """Statically-known kept length, or None if budget is layer/data
        dependent. Used by ComposedPress for static shape chaining."""
        return self.n_kept(seq_len)

    def budget(self, ctx: LayerCtx, seq_len: int) -> jax.Array:
        """Per-layer kept count (traced). Default: the static n_kept.
        Budget-shaping presses (PyramidKV) override."""
        return jnp.asarray(self.n_kept(seq_len), jnp.int32)

    # Whether the press scores correctly over bucket-padded prefill when the
    # pad slots are masked out (true for per-token content scorers; presses
    # whose statistics pool over the whole sequence must opt out or override
    # dynamic_score).
    supports_padding = True

    def dynamic_score(self, ctx: LayerCtx, keys, values, length) -> jax.Array:
        """Score against a traced valid ``length`` (bucketed prefill /
        decode-time use). Default: plain score — sufficient for per-token
        content scorers; the caller masks slots >= length."""
        return self.score(ctx, keys, values)

    def dynamic_budget(self, ctx: LayerCtx, length) -> jax.Array:
        """Traced kept count for bucketed prefill (same int() floor as the
        reference). Budget-shaping presses (PyramidKV) override."""
        return jnp.maximum(
            (length.astype(jnp.float32)
             * (1 - self.compression_ratio)).astype(jnp.int32),
            1,
        )

    def layer_compress(self, ctx, keys, values, length, mask, state=None):
        if self.compression_ratio == 0.0:
            return keys, values, length, mask, state
        S = keys.shape[2]
        n_top = self.max_kept(S, ctx.cfg)
        B, H, _, _ = keys.shape
        if ctx.kv_len is None:
            scores = self.score(ctx, keys, values).astype(jnp.float32)
            budget = self.budget(ctx, S)
        else:
            # Bucketed prefill: pad slots scored -inf; budget from the traced
            # valid length (same int() floor as the reference).
            assert self.supports_padding, (
                f"{type(self).__name__} does not support bucketed prefill"
            )
            kv_len = jnp.asarray(ctx.kv_len, jnp.int32)
            scores = self.dynamic_score(ctx, keys, values, kv_len)
            scores = jnp.where(
                jnp.arange(S)[None, None] < kv_len, scores.astype(jnp.float32),
                -jnp.inf,
            )
            budget = self.dynamic_budget(ctx, kv_len)
        keys, values, idx = topk_keep(scores, keys, values, n_top)
        new_length = jnp.minimum(budget, n_top).astype(jnp.int32)
        # Per-layer budgets below n_top are realized through length; the mask
        # stays all-True over the valid prefix.
        new_mask = jnp.ones((B, H, keys.shape[2]), bool)
        return keys, values, new_length, new_mask, state
