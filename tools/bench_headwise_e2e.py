"""E2e decode: per-head-prefix kernel vs dense XLA across masking ratios.

VERDICT r1 item 2's win condition is heavy masking (87.5% evicted) — the
round-2 first measurement (CLAUDE.md) only covered ratio 0.5 compact, where
per-head byte savings are ~10% and the kernel's sequential grid overhead
dominates. This sweeps ratio x batch and compares three decode paths:

  mask    — head-wise keep-mask only (reference-equivalent fake eviction:
            full 32K buffer read + -inf bias)
  compact — per-head compaction + host shrink, dense XLA attention
            (buffer = max head length)
  headwise— same compact cache through ops/decode_headwise.py
            (HBM traffic = sum of per-head prefixes)

Usage: python tools/bench_headwise_e2e.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import AdaKVPress, KnormPress, Runner, init_params
from kvpress_tpu.cache import shrink

from __graft_entry__ import flagship_config

CTX = 32768
DECODE_STEPS = 32


def main():
    cfg = flagship_config(num_layers=16)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def run(batch, ratio, mode):
        runner = Runner.create(cfg, headwise_kernel=(mode == "headwise"))
        ids = jax.random.randint(
            jax.random.PRNGKey(1), (batch, CTX), 0, cfg.vocab_size
        )
        press = AdaKVPress(
            press=KnormPress(compression_ratio=ratio),
            compact=(mode != "mask"),
        )

        @functools.partial(jax.jit, static_argnames=("press",))
        def prefill(params, ids, press):
            _, cache, _ = runner.prefill(params, ids, press=press)
            return cache

        @jax.jit
        def step(params, tok, cache):
            logits, cache, _ = runner.forward(
                params, tok, cache, logits_last_only=True
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        cache = prefill(params, ids, press)
        if mode != "mask":
            max_len = int(np.max(np.asarray(cache.length)))
            cache = shrink(cache, max_len + DECODE_STEPS + 8)
        buf = cache.keys.shape[3]
        live = float(np.asarray(
            (cache.mask if cache.mask is not None else jnp.ones(())).mean()
        ))
        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        dt = (time.perf_counter() - t0) / DECODE_STEPS * 1e3
        print(f"b{batch} ratio {ratio:5.3f} {mode:8s}: {dt:6.2f} ms/step "
              f"(buf {buf}, live frac {live:.3f})", flush=True)
        return dt

    for batch in (1, 4):
        for ratio in (0.875, 0.5):          # evicted fraction = ratio
            for mode in ("mask", "compact", "headwise"):
                run(batch, ratio, mode)


if __name__ == "__main__":
    main()
