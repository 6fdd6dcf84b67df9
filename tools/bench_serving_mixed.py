"""Mixed-workload serving A/B (VERDICT r2 item 6): ragged 4K-32K contexts ×
heterogeneous token budgets through the engine, bf16 vs int4-KV(+int8-weight)
engines and FIFO vs SJF scheduling, all in ONE process (shared chip state and
compiles) with per-mode medians over repeats.

The reference has no serving layer (its pipeline is batch-1); this bench
covers the repo's own §7 serving charter at a realistic request mix.

Usage: python tools/bench_serving_mixed.py [--reps 3] [--slots 4]
"""

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.models.llama import quantize_params_int8
from kvpress_tpu.serving import Request, ServingEngine

from __graft_entry__ import flagship_config


def make_requests(cfg, rng):
    """12 ragged requests: contexts 4K/8K/16K/32K, budgets 32-96 tokens."""
    lengths = [4096, 8192, 4096, 16384, 8192, 32768,
               4096, 8192, 16384, 4096, 8192, 16384]
    budgets = [32, 96, 48, 64, 32, 96, 64, 48, 32, 96, 64, 48]
    return [
        Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], b)
        for n, b in zip(lengths, budgets)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()

    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params_q = quantize_params_int8(params)
    rng = np.random.default_rng(0)
    reqs = make_requests(cfg, rng)
    press = KnormPress(compression_ratio=0.5)
    capacity = press.n_kept(32768) + max(r.max_new_tokens for r in reqs) + 8

    modes = {
        "bf16/fifo": dict(params=params, quantized=False, kv_bits=8,
                          schedule="fifo"),
        "bf16/sjf": dict(params=params, quantized=False, kv_bits=8,
                         schedule="sjf"),
        "int4+wint8/fifo": dict(params=params_q, quantized=True, kv_bits=4,
                                schedule="fifo"),
        "int4+wint8/sjf": dict(params=params_q, quantized=True, kv_bits=4,
                               schedule="sjf"),
    }
    answers = {}
    results = {}
    for label, kw in modes.items():
        p = kw.pop("params")
        eng = ServingEngine(runner, p, n_slots=args.slots, capacity=capacity,
                            press=press, fetch_lag=4, **kw)
        warm = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], 4)
                for n in (4096, 8192, 16384, 32768)]
        eng.run(warm)                     # compile every context shape once
        rates = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = eng.run(reqs)
            dt = time.perf_counter() - t0
            rates.append(sum(len(o) for o in outs) / dt)
        answers[label] = outs
        med = statistics.median(rates)
        results[label] = med
        print(f"{label:18s}: median {med:7.1f} tok/s "
              f"(reps {['%.1f' % r for r in rates]})", flush=True)

    # scheduling must never change WHAT is generated, only when
    assert answers["bf16/fifo"] == answers["bf16/sjf"], "fifo/sjf diverge"
    assert answers["int4+wint8/fifo"] == answers["int4+wint8/sjf"]
    print("answers identical across schedules")
    for k, v in results.items():
        print(f"RESULT {k} {v:.1f}")


if __name__ == "__main__":
    main()
