"""A/B the overlapped admission against the old blocking admission.

Same protocol as bench_serving.py (8x8K requests, Knorm 0.5, 64 new tokens,
bf16, n_slots=8) run twice in ONE process (same chip state, compiles
shared): once with admissions completed synchronously at issue time (the
pre-overlap behavior) and once with the overlapped issue/complete split.

Usage: python tools/bench_serving_ab.py
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
N_REQ = 12          # > n_slots so the A/B exercises staggered admission
NEW = 64


class SyncEngine(ServingEngine):
    """Old behavior: admission blocks (prefill + device_get) at issue time.

    Calls the BASE issue/complete explicitly — ``self._admit`` would
    dynamic-dispatch back into this override and recurse forever.
    """

    def _issue_admission(self, slot, req_idx, req):
        adm = ServingEngine._issue_admission(self, slot, req_idx, req)
        ServingEngine._complete_admission(self, adm)
        return {"slot": slot, "req_idx": req_idx, "sync": True}

    def _complete_admission(self, adm):
        if adm.get("sync"):
            return
        super()._complete_admission(adm)


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # Heterogeneous budgets: slots retire out of lockstep, so decode steps
    # run while admissions are in flight (the staggered-admission path).
    budgets = [NEW + 8 * (i % 3) for i in range(N_REQ)]
    reqs = [
        Request(rng.integers(0, cfg.vocab_size, CTX).tolist(), [], budgets[i])
        for i in range(N_REQ)
    ]
    press = KnormPress(compression_ratio=0.5)
    capacity = press.n_kept(CTX) + max(budgets) + 8

    results = {}
    for label, cls in (("sync   ", SyncEngine), ("overlap", ServingEngine),
                       ("sync2  ", SyncEngine), ("overlap2", ServingEngine)):
        eng = cls(runner, params, n_slots=8, capacity=capacity, press=press,
                  fetch_lag=4)
        eng.run([Request(rng.integers(0, cfg.vocab_size, CTX).tolist(), [], 4)])
        t0 = time.perf_counter()
        outs = eng.run(reqs)
        dt = time.perf_counter() - t0
        tot = sum(len(o) for o in outs)
        results[label] = outs
        print(f"{label}: {tot} tokens in {dt:6.2f}s = {tot / dt:7.1f} tok/s",
              flush=True)
    assert results["sync   "] == results["overlap"], "answers diverge"
    print("answers identical across modes")


if __name__ == "__main__":
    main()
