"""Chunk-interleaved admission A/B (Sarathi-style chunked-prefill
scheduling, serving.py interleave=): one long-decode request holds a slot
while 64K-context requests are admitted next to it. Non-interleaved
admission dispatches the whole chunked prefill before the next decode step,
so the live slot's inter-token latency spikes to the full prefill duration;
interleave=True bounds it to ~one chunk. Both arms run the same compiled
programs — answers must match exactly.

Reports per arm: max / p50 inter-token gap (engine last_stats drain-gap
profile), generated + processed tok/s. In-process A/B (chip/tunnel variance
is ±10-20% across processes — compare modes in one process only).

Usage: python tools/bench_serving_interleave.py [--reps 2]
"""

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from kvpress_tpu import KnormPress, init_params, Runner
from kvpress_tpu.models.llama import quantize_params_int8
from kvpress_tpu.serving import Request, ServingEngine

from __graft_entry__ import flagship_config


def make_requests(cfg, rng):
    # Slot 0: short context, long decode — the latency victim.
    # Slots fill with 64K admissions while it decodes.
    reqs = [Request(rng.integers(0, cfg.vocab_size, 8192).tolist(), [], 256)]
    for _ in range(3):
        reqs.append(
            Request(rng.integers(0, cfg.vocab_size, 65536).tolist(), [], 16))
    return reqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = quantize_params_int8(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jax.numpy.bfloat16)
    )
    rng = np.random.default_rng(0)
    press = KnormPress(compression_ratio=0.5)
    reqs = make_requests(cfg, rng)
    capacity = press.n_kept(65536) + 256 + 8

    answers = {}
    for interleave in (False, True):
        eng = ServingEngine(runner, params, n_slots=2, capacity=capacity,
                            press=press, quantized=True, kv_bits=4,
                            fetch_lag=4, context_chunk=args.chunk,
                            interleave=interleave)
        warm = [Request(rng.integers(0, cfg.vocab_size, n).tolist(), [], 4)
                for n in (8192, 65536)]
        t0 = time.perf_counter()
        eng.run(warm)
        compile_s = time.perf_counter() - t0
        stats = []
        for _ in range(args.reps):
            answers[interleave] = eng.run(reqs)
            stats.append(dict(eng.last_stats))
        med = lambda k: statistics.median(s[k] for s in stats)
        label = "interleave" if interleave else "serial    "
        print(f"{label}: max gap {med('max_intertoken_gap_s')*1e3:7.0f} ms, "
              f"p50 gap {med('p50_intertoken_gap_s')*1e3:6.1f} ms, "
              f"generated {med('generated_tok_s'):6.1f} tok/s, "
              f"processed {med('processed_tok_s'):7.0f} tok/s "
              f"(compile+warm {compile_s:.0f}s)", flush=True)
    assert answers[False] == answers[True], "interleave changed answers!"
    print("answers identical across modes")


if __name__ == "__main__":
    main()
