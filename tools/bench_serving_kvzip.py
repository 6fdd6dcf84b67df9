"""Serving throughput with KVzip (query-agnostic multi-pass) admissions.

KVzip's pitch is compress-once-serve-many: the engine runs the repeat-pass
scoring at admission (pipeline._run_kvzip through the lean repeat passes)
and serves every question from the masked/compacted cache. This measures
what that admission costs end-to-end on the serving path vs a plain
scorer press (Knorm) at the same ratio, and what context reuse
(context_cache LRU) buys when questions share a context — the reference's
one-cache-many-questions UX (kvzip_press.py:57-62 cost warning) at engine
level.

Usage: python tools/bench_serving_kvzip.py [--ctx 16384] [--n 4]
       [--slots 4] [--gen 64]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

from __graft_entry__ import flagship_config
from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.presses import KVzipPress
from kvpress_tpu.serving import Request, ServingEngine
from toy_tokenizer import ToyTokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tok = ToyTokenizer(cfg.vocab_size)
    rng = np.random.default_rng(0)

    def reqs(shared_context: bool):
        ctxs = []
        for i in range(args.n):
            key = 0 if shared_context else i
            if len(ctxs) <= key:
                ctxs.append(rng.integers(0, cfg.vocab_size,
                                         args.ctx).tolist())
            q = rng.integers(0, cfg.vocab_size, 16).tolist()
            yield Request(ctxs[key], q, max_new_tokens=args.gen), key

    presses = {
        "knorm-0.5": KnormPress(compression_ratio=0.5),
        "kvzip-0.5-compact": KVzipPress(compression_ratio=0.5, compact=True),
    }
    total_tokens = args.n * (args.ctx + 16 + args.gen)
    for name, press in presses.items():
        eng = ServingEngine(
            runner, params, n_slots=args.slots,
            capacity=press.n_kept(args.ctx) + 16 + args.gen + 8
            if name.startswith("knorm") else args.ctx + 16 + args.gen + 8,
            press=press, tokenizer=tok, fetch_lag=4,
            quantized=True, kv_bits=4,
        )
        rs = [r for r, _ in reqs(False)]
        eng.run(rs[:1])                       # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            eng.run(rs)
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{name:18s} {args.n}x{args.ctx//1024}K +{args.gen}gen "
              f"{args.slots} slots: {t:6.1f}s  "
              f"({total_tokens / t:7.0f} tok/s processed)", flush=True)

    # Context reuse: n requests SHARING one context — admissions after the
    # first skip prefill+scoring entirely (LRU hit).
    press = KVzipPress(compression_ratio=0.5, compact=True)
    eng = ServingEngine(
        runner, params, n_slots=args.slots,
        capacity=args.ctx + 16 + args.gen + 8,
        press=press, tokenizer=tok, fetch_lag=4,
        quantized=True, kv_bits=4, context_cache=4,
    )
    rs = [r for r, _ in reqs(True)]          # LRU keys on context_ids
    eng.run(rs[:1])
    t0 = time.perf_counter()
    eng.run(rs)
    t = time.perf_counter() - t0

    def lru_bytes(e):
        return sum(
            sum(x.nbytes for x in jax.tree_util.tree_leaves(entry))
            for entry, _ in e._ctx_lru.values()
        )

    # Measured-length LRU shrink (round-5): compacting presses store entries
    # at the measured kept length (bucketed), not the static full-context
    # bound — report bytes/entry and what the static bound would have cost.
    entries = list(eng._ctx_lru.values())
    entry_slots = entries[0][0].max_size if entries else 0
    print(f"kvzip shared-ctx reuse ({args.n} reqs, 1 context): {t:6.1f}s  "
          f"ctx_hits={eng.ctx_hits}  LRU {lru_bytes(eng)/2**20:.0f} MiB / "
          f"{max(1, len(entries))} entries (entry buffer {entry_slots} "
          f"slots vs static bound {args.ctx})", flush=True)

    # Capacity-win geometry (optimistic admission): at FIXED slot-pool HBM,
    # compaction lets ~0.6*ctx slots hold a ratio-0.5 KVzip cache, so the
    # same bytes buy ~2x the slots — measured on a decode-heavy reuse
    # workload (1 admission, 2n generate-heavy requests).
    gen = 256
    many = [Request(rs[0].context_ids,
                    rng.integers(0, cfg.vocab_size, 16).tolist(),
                    max_new_tokens=gen) for _ in range(2 * args.n)]
    for label, slots, cap in (
        ("full-cap slots", args.n, args.ctx + 16 + gen + 8),
        ("compact-cap slots", 2 * args.n,
         int(args.ctx * 0.55) + 16 + gen + 8),
    ):
        eng = ServingEngine(
            runner, params, n_slots=slots, capacity=cap, press=press,
            tokenizer=tok, fetch_lag=4, quantized=True, kv_bits=4,
            context_cache=2,
        )
        eng.run(many[:1])                     # compile + warm the LRU
        t0 = time.perf_counter()
        eng.run(many)
        t = time.perf_counter() - t0
        hbm = slots * cap
        print(f"{label:18s} {slots}x{cap} (pool {hbm//1024}K slots-tokens): "
              f"{t:6.1f}s ({2 * args.n * gen / t:6.0f} gen tok/s)",
              flush=True)


if __name__ == "__main__":
    main()
