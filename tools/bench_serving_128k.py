"""Long-context serving on one chip (VERDICT r2 item 10): 2 concurrent
64K-128K requests through the engine, int4 KV + int8 weights, Knorm and
SnapKV presses, overlapped admission (engine default).

Serving and long-context had each been measured, never together. 16 GB
sizing (1B-class 16L flagship): a 128K prefill holds the int4 payload cache
(~0.6 GB/slot at ratio 0.5) next to the transient bf16 prefill buffers
(4.3 GB at 128K) + int8 weights (1.1 GB) — 2 slots of 128K fit; 4 slots of
64K fit. Each distinct context length compiles its own prefill (exact-length
compile, ~40 s at 128K) — use context_bucket in production to bound that.

Usage: python tools/bench_serving_128k.py [--reps 2]
"""

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from kvpress_tpu import KnormPress, Runner, SnapKVPress, init_params
from kvpress_tpu.models.llama import quantize_params_int8
from kvpress_tpu.serving import Request, ServingEngine

from __graft_entry__ import flagship_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = quantize_params_int8(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jax.numpy.bfloat16)
    )
    rng = np.random.default_rng(0)

    lengths = [131072, 65536, 131072, 65536]
    budgets = [48, 32, 32, 48]
    reqs = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], b)
            for n, b in zip(lengths, budgets)]

    presses = {
        "knorm-0.5": (KnormPress(compression_ratio=0.5), None),
        "snapkv-0.5": (SnapKVPress(compression_ratio=0.5), None),
        # chunked admission: one compiled chunk program instead of one
        # exact-length prefill compile per context length (the 268 s SnapKV
        # 128K cold-compile cliff); scoring uses the trailing window (exact
        # for SnapKV). Measured (round 3): 4,609 tok/s processed vs 5,068
        # exact-length (within 9%) after the auto dense/fused heuristic —
        # 1B-class dense transients are affordable so int4 chunks dequantize
        # and run the bf16 kernel; only 8B-class@128K stays fused.
        "snapkv-0.5/chunk8k": (SnapKVPress(compression_ratio=0.5), 8192),
    }
    for label, (press, chunk) in presses.items():
        capacity = press.n_kept(131072) + max(budgets) + 8
        t0 = time.perf_counter()
        eng = ServingEngine(runner, params, n_slots=2, capacity=capacity,
                            press=press, quantized=True, kv_bits=4,
                            fetch_lag=4, context_chunk=chunk)
        warm = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], 4)
                for n in (65536, 131072)]
        eng.run(warm)
        compile_s = time.perf_counter() - t0
        gen_rates, proc_rates = [], []
        n_ctx = sum(lengths)
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = eng.run(reqs)
            dt = time.perf_counter() - t0
            n_gen = sum(len(o) for o in outs)
            gen_rates.append(n_gen / dt)
            proc_rates.append((n_ctx + n_gen) / dt)
        print(f"{label:11s}: processed {statistics.median(proc_rates):7.0f} "
              f"tok/s (prefill-dominated: {n_ctx} ctx vs "
              f"{sum(budgets)} gen), generated "
              f"{statistics.median(gen_rates):5.2f} tok/s e2e "
              f"(reps {['%.2f' % r for r in gen_rates]}; "
              f"compile+warm {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
