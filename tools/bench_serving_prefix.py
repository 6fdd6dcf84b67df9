"""A/B the serving engine's compressed-context reuse (context_cache=).

Workload: N requests sharing ONE 8K context with distinct questions — the
reference pipeline's one-cache-many-questions UX (pipeline.py:236-249)
as a serving workload. With context_cache=1 every admission after the
first skips prefill + compression and runs only the question forward on
the stored compressed cache.

Run in ONE process so compiles are shared across modes.

Usage: python tools/bench_serving_prefix.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.serving import Request, ServingEngine

from __graft_entry__ import flagship_config

CTX = 8192
N_REQ = 8
QLEN = 16
NEW = 64


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ctx = rng.integers(0, cfg.vocab_size, CTX).tolist()
    reqs = [
        Request(ctx, rng.integers(0, cfg.vocab_size, QLEN).tolist(), NEW)
        for _ in range(N_REQ)
    ]
    press = KnormPress(compression_ratio=0.5)
    capacity = press.n_kept(CTX) + QLEN + NEW + 8

    results = {}
    for label, cc in (("no-reuse ", 0), ("reuse    ", 1),
                      ("no-reuse2", 0), ("reuse2   ", 1)):
        eng = ServingEngine(runner, params, n_slots=4, capacity=capacity,
                            press=press, question_bucket=QLEN, fetch_lag=4,
                            context_cache=cc)
        # warm compiles on a distinct context
        eng.run([Request(rng.integers(0, cfg.vocab_size, CTX).tolist(),
                         rng.integers(0, cfg.vocab_size, QLEN).tolist(), 4)])
        eng.ctx_hits = 0
        t0 = time.perf_counter()
        outs = eng.run(reqs)
        dt = time.perf_counter() - t0
        tot = sum(len(o) for o in outs)
        results[label] = outs
        print(f"{label}: {tot} tokens in {dt:6.2f}s = {tot / dt:7.1f} tok/s "
              f"(ctx_hits={eng.ctx_hits})", flush=True)
    same = sum(a == b for a, b in zip(results["no-reuse "], results["reuse    "]))
    print(f"answers identical across modes: {same}/{N_REQ} "
          "(bf16 tie flips possible — shrunk-buffer question forward "
          "compiles a different HLO)")


if __name__ == "__main__":
    main()
