"""Break down KVzip multi-pass cost on the real chip (16K flagship).

bench_kvzip measured the full pipe() at 5.4x plain prefill; the reference
warns 2-3x (kvzip_press.py:57-62). This probe times each phase after a
warmup pass: prefill, the 8 repeat-chunk scored forwards (with per-chunk
host sync vs deferred fetch), the host-side bottom-k mask, and the answer.

Usage: python tools/probe_kvzip_cost.py [ctx_tokens]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KVzipPress, Runner, init_params
from kvpress_tpu.cache import grow
from kvpress_tpu.pipeline import KVPressPipeline, _prefill, _scored_forward
from kvpress_tpu.presses.kvzip import KVzipChunkScorer
from toy_tokenizer import ToyTokenizer

from __graft_entry__ import flagship_config

CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 16384


def sync(tree):
    jax.device_get(jax.tree_util.tree_leaves(tree)[0])


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tok = ToyTokenizer(cfg.vocab_size)
    pipe = KVPressPipeline(runner, params, tok)
    press = KVzipPress(compression_ratio=0.5)

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in rng.integers(0, 30000, CTX - 8)]
    context = " ".join(words)
    question = "what is w3 ?"

    # warm everything once (compiles)
    t0 = time.perf_counter()
    pipe(context, question=question, press=press, max_new_tokens=8)
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s", flush=True)

    context_ids = tok.encode(context)
    ctx_len = len(context_ids) + 1
    ids = jnp.asarray(
        np.asarray([tok.bos_token_id] + context_ids, np.int32))[None]

    # ---- prefill ----
    t0 = time.perf_counter()
    logits, cache, _ = _prefill(params, ids, None, runner=runner, press=None,
                                quantized=False, kv_bits=8)
    sync(cache.length)
    t_prefill = time.perf_counter() - t0
    print(f"prefill              {t_prefill:6.2f}s", flush=True)

    # ---- chunk pairs ----
    suffix_ids = tok.encode("\n", add_special_tokens=False)
    pairs = press.chunk_pairs([tok.bos_token_id] + list(context_ids), 0,
                              suffix_ids, tok)
    max_rep = max(len(r) for _, r in pairs)
    if cache.max_size < ctx_len + max_rep:
        cache = grow(cache, ctx_len + max_rep - cache.max_size)
    print(f"{len(pairs)} chunks, repeat lens "
          f"{sorted(set(len(r) for _, r in pairs))}", flush=True)

    def run_passes(deferred: bool):
        score_val = np.zeros(
            (cfg.num_layers, 1, cfg.num_kv_heads, ctx_len), np.float32)
        t0 = time.perf_counter()
        start = 0
        outs = []
        for chunk, repeat in pairs:
            end = start + len(chunk)
            scorer = KVzipChunkScorer(
                start_idx=start, end_idx=end, context_length=ctx_len,
                n_sink=press.n_sink, plus=press.kvzip_plus_normalization)
            state = scorer.init_state(cfg, 1, ctx_len)
            rep = jnp.asarray(np.asarray(repeat, np.int32))[None]
            _, _, out_state = _scored_forward(
                params, rep, cache, state, runner=runner, press=scorer)
            if deferred:
                outs.append((start, end, out_state["scores"]))
            else:
                score_val[..., start:end] = np.asarray(out_state["scores"])
            start = end
        if deferred:
            fetched = jax.device_get([o[2] for o in outs])
            for (s, e, _), arr in zip(outs, fetched):
                score_val[..., s:e] = arr
        return score_val, time.perf_counter() - t0

    sv_sync, t_sync = run_passes(deferred=False)
    sv_def, t_def = run_passes(deferred=True)
    assert np.allclose(sv_sync, sv_def)
    print(f"repeat passes sync   {t_sync:6.2f}s "
          f"({t_sync / t_prefill:4.1f}x prefill)", flush=True)
    print(f"repeat passes defer  {t_def:6.2f}s "
          f"({t_def / t_prefill:4.1f}x prefill)", flush=True)

    t0 = time.perf_counter()
    keep = press.head_mask_from_scores(sv_sync)
    t_mask = time.perf_counter() - t0
    print(f"host bottom-k mask   {t_mask:6.2f}s", flush=True)

    t0 = time.perf_counter()
    cache2 = pipe._apply_keep_mask(cache, keep)
    sync(cache2.mask)
    print(f"apply mask           {time.perf_counter() - t0:6.2f}s", flush=True)

    total = t_prefill + t_def + t_mask
    print(f"TOTAL (deferred)     {total:6.2f}s = "
          f"{total / t_prefill:.1f}x prefill", flush=True)


if __name__ == "__main__":
    main()
