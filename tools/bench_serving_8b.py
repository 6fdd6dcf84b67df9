"""8B-class serving on one 16 GB chip: continuous batching at the north-star
model scale (BASELINE.md:17 body), int8 weights + int4 KV + Knorm-0.5,
chunked admission (bounded compile + activation memory).

Sizing: weights 7.25 GB; per-slot int4 cache at 16.4K capacity ~0.4 GB;
chunked admission transients ~1.6 GB — 2 slots of 32K-context requests fit
comfortably where the one-shot 8B prefill could not even run.

Usage: python tools/bench_serving_8b.py [--reps 2]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cfg = llama31_8b_config()
    runner = Runner.create(cfg)
    t0 = time.perf_counter()
    params = init_params_int8(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params["layers"]["wd"])
    print(f"init int8 8B params in {time.perf_counter() - t0:.0f}s",
          flush=True)
    rng = np.random.default_rng(0)

    lengths = [32768, 16384, 32768, 16384]
    budgets = [48, 32, 32, 48]
    reqs = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], b)
            for n, b in zip(lengths, budgets)]
    press = KnormPress(compression_ratio=0.5)
    capacity = press.n_kept(32768) + max(budgets) + 8

    for slots in (1, 2):
        t0 = time.perf_counter()
        eng = ServingEngine(runner, params, n_slots=slots, capacity=capacity,
                            press=press, quantized=True, kv_bits=4,
                            fetch_lag=4, context_chunk=8192)
        warm = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], 4)
                for n in (16384, 32768)]
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
        print(f"slots={slots}: processed {statistics.median(proc_rates):6.0f}"
              f" tok/s, generated {statistics.median(gen_rates):6.2f} tok/s "
              f"e2e over 2x32K+2x16K "
              f"(reps {['%.2f' % r for r in gen_rates]}; "
              f"compile+warm {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
