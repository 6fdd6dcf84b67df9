"""Paired serving bench at FIXED KV-HBM (VERDICT r3 'what's weak' #3 / item
5): on one chip, how much serving throughput does compression buy when every
arm gets the SAME cache-pool budget? Uncompressed bf16-KV fits few slots;
Knorm-0.5 doubles them; +int4 quadruples again — the throughput/chip ratio
is the serving-side north-star claim, measured rather than asserted.

Arms (8B-class body, int8 weights, chunked admission):
  A  uncompressed bf16 KV          — slots = budget // bytes(ctx)
  B  knorm-0.5, bf16 KV            — slots = budget // bytes(ctx/2)
  C  knorm-0.5, int4 KV            — slots = budget // bytes4(ctx/2), cap 8

Reports per arm: slots, KV pool GiB, processed & generated tok/s, TTFT
p50/p99, inter-token gap p50/p99 (engine last_stats).

Usage: python tools/bench_serving_paired.py [--ctx 8192] [--gen 128]
       [--requests 12] [--budget-gib 4.2] [--reps 2] [--model 8b|1b]
"""

import argparse
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from kvpress_tpu import KnormPress, Runner
from kvpress_tpu.models.llama import init_params_int8
from kvpress_tpu.serving import Request, ServingEngine

from tools.bench_8b import llama31_8b_config


def kv_bytes_per_slot(cfg, capacity, kv_bits):
    per_elt = {None: 2.0, 8: 1.0 + 4.0 / cfg.head_dim,
               4: 0.5 + 4.0 / cfg.head_dim}[kv_bits]
    return 2 * cfg.num_layers * cfg.num_kv_heads * capacity * cfg.head_dim \
        * per_elt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--budget-gib", type=float, default=4.2,
                    help="KV slot-pool HBM budget shared by every arm")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--max-slots", type=int, default=8)
    ap.add_argument("--model", default="8b", choices=("8b", "1b", "tiny"))
    ap.add_argument("--arms", nargs="*", default=["A", "B", "C"])
    args = ap.parse_args()

    if args.model == "8b":
        cfg = llama31_8b_config()
    elif args.model == "tiny":   # CPU smoke of the harness itself
        import kvpress_tpu as kp

        cfg = kp.tiny_config()
    else:
        from kvpress_tpu.config import ModelConfig

        cfg = ModelConfig(vocab_size=32768, hidden_size=2048,
                          intermediate_size=8192, num_layers=16,
                          num_heads=32, num_kv_heads=8, head_dim=64)
    runner = Runner.create(cfg)
    t0 = time.perf_counter()
    params = init_params_int8(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params["layers"]["wd"])
    print(f"init int8 params in {time.perf_counter() - t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)

    reqs = [Request(rng.integers(0, cfg.vocab_size, args.ctx).tolist(), [],
                    args.gen)
            for _ in range(args.requests)]
    n_ctx = args.requests * args.ctx
    budget = args.budget_gib * 2**30
    press = KnormPress(compression_ratio=0.5)

    arms = {
        "A": dict(label="uncompressed bf16-KV", press=None, kv_bits=None,
                  kept=args.ctx),
        "B": dict(label="knorm-0.5 bf16-KV", press=press, kv_bits=None,
                  kept=press.n_kept(args.ctx)),
        "C": dict(label="knorm-0.5 int4-KV", press=press, kv_bits=4,
                  kept=press.n_kept(args.ctx)),
    }
    results = {}
    for key in args.arms:
        arm = arms[key]
        # Exact capacity: the chunked-admission prefill buffer buckets to
        # chunk multiples inside the engine independently, so rounding
        # capacity up too (an earlier revision) only inflated the slot pool
        # — it erased the compressed arms' pool advantage.
        capacity = arm["kept"] + args.gen + 8
        per_slot = kv_bytes_per_slot(cfg, capacity, arm["kv_bits"])
        # The non-donated decode step holds the slot pool TWICE (input +
        # output buffers — donation measured slower on this backend), so
        # the budget bounds 2x the pool bytes: slots scale 1 -> 3 -> 8
        # across the arms at the default 4.2 GiB.
        slots = max(1, min(args.max_slots, int(budget // (2 * per_slot))))
        pool_gib = slots * per_slot / 2**30
        eng = ServingEngine(
            runner, params, n_slots=slots, capacity=capacity,
            press=arm["press"], quantized=arm["kv_bits"] is not None,
            kv_bits=arm["kv_bits"] or 8, fetch_lag=4,
            context_chunk=args.chunk,
            # Bound concurrent admissions' uncompressed prefill transients
            # (one bucketed full-context buffer each): every arm gets the
            # same cap so TTFT/admission concurrency is comparable.
            max_admissions=2,
        )
        t0 = time.perf_counter()
        eng.run([Request(rng.integers(0, cfg.vocab_size, args.ctx).tolist(),
                         [], 4) for _ in range(min(2, slots))])
        compile_s = time.perf_counter() - t0
        gen_rates, proc_rates, stats = [], [], None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = eng.run(reqs)
            dt = time.perf_counter() - t0
            n_gen = sum(len(o) for o in outs)
            gen_rates.append(n_gen / dt)
            proc_rates.append((n_ctx + n_gen) / dt)
            stats = eng.last_stats
        results[key] = dict(
            label=arm["label"], slots=slots, capacity=capacity,
            kv_pool_gib=round(pool_gib, 2),
            processed_tok_s=round(statistics.median(proc_rates), 1),
            generated_tok_s=round(statistics.median(gen_rates), 2),
            p50_ttft_s=round(stats.get("p50_ttft_s", 0), 2),
            p99_ttft_s=round(stats.get("p99_ttft_s", 0), 2),
            p50_gap_s=round(stats.get("p50_intertoken_gap_s", 0), 4),
            p99_gap_s=round(stats.get("p99_intertoken_gap_s", 0), 4),
            compile_s=round(compile_s, 0),
        )
        r = results[key]
        print(f"{key} {arm['label']:22s} slots={slots} pool={pool_gib:.1f}GiB"
              f" proc {r['processed_tok_s']:7.1f} tok/s"
              f" gen {r['generated_tok_s']:6.2f} tok/s"
              f" ttft p50/p99 {r['p50_ttft_s']}/{r['p99_ttft_s']}s"
              f" gap p50/p99 {r['p50_gap_s']}/{r['p99_gap_s']}s", flush=True)
        del eng

    if "A" in results and "C" in results:
        ra = results["A"]["generated_tok_s"]
        rc = results["C"]["generated_tok_s"]
        print(f"=> generated-throughput/chip at fixed {args.budget_gib} GiB "
              f"KV pool: int4+knorm-0.5 vs uncompressed = {rc / ra:.2f}x",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
