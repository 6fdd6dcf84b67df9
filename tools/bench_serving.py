"""Continuous-batching throughput on the real chip: n_slots=8 vs 1.

Flagship 1B-class model, 8 requests of 8K context each, Knorm ratio 0.5,
64 new tokens. Decode at small batch is weight-HBM-bound (~2.2 GB/step), so
stepping 8 slots per dispatch should multiply tok/s several-fold — the lever
the reference's batch-1 pipeline (kvpress/pipeline.py) leaves on the table.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.serving import Request, ServingEngine

from __graft_entry__ import flagship_config

CTX = 8192
N_REQ = 8
NEW = 64


def main():
    import jax.numpy as jnp

    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    reqs = [
        Request(rng.integers(0, cfg.vocab_size, CTX).tolist(), [], NEW)
        for _ in range(N_REQ)
    ]
    press = KnormPress(compression_ratio=0.5)
    capacity = press.n_kept(CTX) + NEW + 8

    from kvpress_tpu.models.llama import quantize_params_int8

    cases = [
        ("bf16      n_slots=1", 1, params, False, 8),
        ("bf16      n_slots=8", 8, params, False, 8),
        ("int4+wi8  n_slots=8", 8, quantize_params_int8(params), True, 4),
    ]
    for label, n_slots, p, quantized, bits in cases:
        eng = ServingEngine(
            runner, p, n_slots=n_slots, capacity=capacity, press=press,
            fetch_lag=4, quantized=quantized, kv_bits=bits,
        )
        # warm the compiles (prefill + decode step at this slot count)
        eng.run([Request(rng.integers(0, cfg.vocab_size, CTX).tolist(), [], 4)])
        t0 = time.perf_counter()
        outs = eng.run(reqs)
        dt = time.perf_counter() - t0
        tot = sum(len(o) for o in outs)
        print(f"{label}: {tot} tokens in {dt:6.2f}s = "
              f"{tot/dt:7.1f} tok/s (decode+prefill, 8 requests)", flush=True)


if __name__ == "__main__":
    main()
