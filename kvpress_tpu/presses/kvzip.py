"""KVzipPress: query-agnostic scoring via context reconstruction
(reference kvzip_press.py, arXiv:2505.23416).

The reference overrides the press context manager to (1) capture the prefill,
(2) re-feed the context in 2048-token chunks with "Repeat the previous
context exactly." prompts, scoring cached keys by max cross-attention from
the repeat queries, then (3) evict bottom-k across layers and heads via
masked_key_indices. Cost: 2-3x prefill.

Here the orchestration is explicit pipeline code (pipeline._run_kvzip):
each repeat chunk is one jitted forward with a chunk-scorer press attached
(phase="decode", cache already full), after which the cache length/offset
simply rolls back — no monkey-patching, no fake keys. All chunk spans are
trace-static, so the subsampled-key attention compiles to fixed shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .base import NEG_INF, BasePress, LayerCtx



@dataclasses.dataclass(frozen=True)
class KVzipPress(BasePress):
    compression_ratio: float = 0.0
    layerwise: bool = False
    n_sink: int = 4
    kvzip_plus_normalization: bool = False
    chunk_size: int = 2048
    prev_postfix_size: int = 8
    # Head-wise compaction after the eviction mask (cache.compact_masked):
    # kept entries move to each head's buffer front so the buffer shrinks
    # to the max per-head count — real memory/bandwidth reclaim the
    # reference's fake eviction cannot have (and the 8B@128K decode
    # enabler: two non-donated copies of the full masked buffer OOM).
    # Off by default to keep the exact reference-observable mask layout.
    compact: bool = False

    # Pipeline routing flags:
    multi_pass = True                 # run the reconstruction procedure
    compresses_prefill = False        # the initial prefill stays uncompressed

    @property
    def host_compact(self) -> bool:
        return self.compact

    def __post_init__(self):
        assert 0 <= self.compression_ratio < 1

    def repeat_room(self) -> int:
        """Upper bound on one repeat-prompt length (chunk + repeat question
        + chat suffix + prev-postfix, plus restore tokens for RestoreKV) —
        lets the pipeline PRESIZE the prefill buffer so ``_run_kvzip``
        never has to ``grow`` the full cache (the grow copy holds TWO full
        caches: measured OOM at 8B/128K int4 next to the weights). The
        grow fallback remains for pathological chat templates."""
        return (self.chunk_size + self.prev_postfix_size + 64
                + getattr(self, "num_restore_tokens", 0))

    def chunk_pairs(self, context_ids: list[int], prefix_length: int,
                    suffix_ids: list[int], tokenizer) -> list[tuple[list, list]]:
        """[(chunk_ids, repeat_ids)] (reference prepare(), :225-264)."""
        ctx = context_ids[prefix_length:]
        chunks = [
            ctx[i : i + self.chunk_size]
            for i in range(0, max(len(ctx), 1), self.chunk_size)
        ]
        chunks = [c for c in chunks if c]
        pairs = []
        for i, chunk in enumerate(chunks):
            if i == 0:
                q = tokenizer.encode(
                    "\n\nRepeat the previous context exactly.",
                    add_special_tokens=False,
                )
            else:
                q = tokenizer.encode(
                    "\n\nRepeat the part of the previous context exactly, starting with",
                    add_special_tokens=False,
                )
                q = q + chunks[i - 1][-self.prev_postfix_size :]
            pairs.append((chunk, q + list(suffix_ids) + chunk))
        return pairs

    def head_mask_from_scores(self, score_val: np.ndarray) -> np.ndarray:
        """Global (or layerwise) bottom-k eviction mask from (L, B, H, S)
        scores (reference compress_post, :360-394). True = keep."""
        L, B, H, S = score_val.shape
        if self.compression_ratio <= 0:
            return np.ones_like(score_val, dtype=bool)
        per_layer = B * H * S
        if self.layerwise:
            n_pruned_layers = np.full(L, int(per_layer * self.compression_ratio))
        else:
            n_total = int(score_val.size * self.compression_ratio)
            order = np.argsort(score_val.reshape(-1))[:n_total]
            n_pruned_layers = np.bincount(order // per_layer, minlength=L)
        keep = np.ones((L, B, H, S), dtype=bool)
        for layer in range(L):
            n = int(n_pruned_layers[layer])
            if n == 0:
                continue
            flat = score_val[layer].reshape(B, -1)
            idx = np.argsort(flat, axis=1)[:, :n]
            for b in range(B):
                h_idx = idx[b] // S
                s_idx = idx[b] % S
                keep[layer, b, h_idx, s_idx] = False
        return keep


def subset_max_scores(q, ks_sub, sink: int, cl: int) -> jax.Array:
    """Max softmax-prob of repeat queries onto the chunk columns, over the
    ``[sink | chunk | repeat]`` key subset (reference score_kvzip, :287-358;
    the lse is over the SUBSET — reference semantics).

    q: (B, Hq, T, D) post-RoPE repeat queries; ks_sub: (B, Hkv, sink+cl+T, D)
    with the T repeat keys LAST (causal within that block). Returns
    (B, Hkv, cl). exp is monotone so max-then-exp == exp-then-max — the
    (B,Hkv,G,T,n_sub) probs tensor never materializes (one logsumexp sweep
    + one masked max; the 8B repeat passes are bound on exactly this
    traffic). Shared by KVzipChunkScorer.decode_compress and the lean
    chunked repeat pass (models/llama.py _chunk_forward_lean)."""
    B, Hkv, n_sub, D = ks_sub.shape
    T = q.shape[2]
    G = q.shape[1] // Hkv
    q5 = q.reshape(B, Hkv, G, T, D)
    attn = jnp.einsum(
        "bhgtd,bhsd->bhgts", q5, ks_sub,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(D * 1.0)
    # Causal mask inside the trailing repeat block: a broadcast add that
    # fuses into the reductions (an .at[...].add copies the full 1+ GB
    # logits tensor at 8B scale).
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    block = jnp.where(cols <= rows, 0.0, NEG_INF)                # (T, T)
    mask2d = jnp.concatenate(
        [jnp.zeros((T, n_sub - T), jnp.float32), block], axis=1
    )
    attn = attn + mask2d[None, None, None]
    lse = jax.nn.logsumexp(attn, axis=-1, keepdims=True)         # (...,T,1)
    logp_chunk = attn[..., sink:sink + cl] - lse                 # (...,T,cl)
    return jnp.exp(jnp.max(logp_chunk, axis=(2, 3)))


@dataclasses.dataclass(frozen=True)
class KVzipChunkScorer(BasePress):
    """Per-chunk scoring press applied during the repeat forward: max
    cross-attention of repeat queries onto the cached chunk keys
    (reference score_kvzip, :287-358). All spans static."""

    start_idx: int = 0
    end_idx: int = 0
    context_length: int = 0
    n_sink: int = 4
    plus: bool = False

    compresses_prefill = False
    compresses_decode = True

    def init_state(self, cfg, batch, seq_len, dtype=None):
        L = cfg.num_layers
        n = self.end_idx - self.start_idx
        return {"scores": jnp.zeros((L, batch, cfg.num_kv_heads, n), jnp.float32)}

    def decode_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        cfg = ctx.cfg
        B, Hkv, S, D = keys.shape
        Hq = cfg.num_heads
        G = Hq // Hkv
        T = ctx.queries.shape[2]
        sink = min(self.n_sink, self.start_idx)
        cl = self.end_idx - self.start_idx
        ctx_len = self.context_length

        def sub(x):
            return jnp.concatenate(
                [
                    x[:, :, :sink],
                    x[:, :, self.start_idx : self.end_idx],
                    x[:, :, ctx_len : ctx_len + T],
                ],
                axis=2,
            )

        if not self.plus:
            return keys, values, length, mask, {
                "scores": subset_max_scores(ctx.queries, sub(keys), sink, cl)
            }

        # Dot at native (bf16) width with f32 accumulation — casting the
        # operands to f32 first would halve MXU rate for no extra info (the
        # cache is bf16 anyway); f32-model tests keep an f32 dot unchanged.
        ks = sub(keys)                                           # (B,Hkv,n_sub,D)
        q = ctx.queries.reshape(B, Hkv, G, T, D)
        attn = jnp.einsum(
            "bhgtd,bhsd->bhgts", q, ks,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(D * 1.0)

        # Causal mask inside the trailing repeat block: a broadcast add that
        # fuses into the reductions (an .at[...].add copies the full 1+ GB
        # logits tensor at 8B scale).
        rows = jnp.arange(T)[:, None]
        cols = jnp.arange(T)[None, :]
        block = jnp.where(cols <= rows, 0.0, NEG_INF)            # (T, T)
        n_sub = attn.shape[-1]
        mask2d = jnp.concatenate(
            [jnp.zeros((T, n_sub - T), jnp.float32), block], axis=1
        )
        attn = attn + mask2d[None, None, None]

        attn = jax.nn.softmax(attn, axis=-1)

        if self.plus:
            h_norm = jnp.linalg.norm(ctx.hidden.astype(jnp.float32), axis=-1)  # (B,T)
            attn = attn / h_norm[:, None, None, :, None]
            from ..models.llama import dequant_weight

            Wo = dequant_weight(ctx.layer_params, "wo", jnp.float32).reshape(
                Hkv, G, D, cfg.hidden_size
            )
            vs = sub(values).astype(jnp.float32)                 # (B,Hkv,n_sub,D)
            WoV = jnp.einsum("hgij,bhsi->bhgsj", Wo, vs)
            WoV_norm = jnp.linalg.norm(WoV, axis=-1)             # (B,Hkv,G,n_sub)
            attn = attn * WoV_norm[:, :, :, None, :]

        chunk_scores = attn[..., sink : sink + cl]               # (B,Hkv,G,T,cl)
        scores = chunk_scores.max(axis=(2, 3))                   # (B,Hkv,cl)
        return keys, values, length, mask, {"scores": scores}
