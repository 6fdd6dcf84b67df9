"""End-to-end decode throughput: bf16 vs int8 vs int4 cache, kernel vs XLA.

The per-op microbenchmarks are dispatch/scan-overhead-bound on axon
(CLAUDE.md); the 16-layer chained decode step is the ground truth. Knorm
ratio 0.5 at b4/32K on the flagship 1B config, mirroring bench.py.

Usage: python tools/bench_decode_e2e.py [--quick]
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.cache import shrink

from __graft_entry__ import flagship_config

BATCH = 4
CTX = 32768
DECODE_STEPS = 32
RATIO = 0.5


def main():
    cfg = flagship_config(num_layers=16)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, CTX), 0, cfg.vocab_size
    )
    press = KnormPress(compression_ratio=RATIO)
    keep = press.n_kept(CTX)

    def run(attn_impl, quantized, kv_bits, use_press=True, decode_kernel=True):
        runner = Runner.create(cfg, attn_impl=attn_impl,
                               decode_kernel=decode_kernel)

        @functools.partial(jax.jit, static_argnames=("press",))
        def prefill(params, ids, press=None):
            _, cache, _ = runner.prefill(
                params, ids, press=press, quantized=quantized, kv_bits=kv_bits
            )
            return cache

        @jax.jit
        def step(params, tok, cache):
            logits, cache, _ = runner.forward(
                params, tok, cache, logits_last_only=True
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        t0 = time.perf_counter()
        cache = prefill(params, ids, press=press if use_press else None)
        cache = shrink(cache, (keep if use_press else CTX) + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        tps = BATCH * DECODE_STEPS / dt
        return tps, warm

    quick = "--quick" in sys.argv
    # (name, attn_impl, quantized, bits, use_press, decode_kernel)
    cases = [
        ("bf16 r1-path  knorm.5", "flash", False, 8, True, False),
        ("bf16 kernel   knorm.5", "flash", False, 8, True, True),
        ("int8 kernel   knorm.5", "flash", True, 8, True, True),
        ("int4 kernel   knorm.5", "flash", True, 4, True, True),
    ]
    if not quick:
        cases += [
            ("bf16 r1-path  nopress", "flash", False, 8, False, False),
            ("bf16 kernel   nopress", "flash", False, 8, False, True),
            ("int4 kernel   nopress", "flash", True, 4, False, True),
        ]
    for name, impl, qz, bits, use_press, dk in cases:
        tps, warm = run(impl, qz, bits, use_press, dk)
        print(f"{name:22s} {tps:7.1f} tok/s   ({BATCH*1000/tps:.2f} ms/step, "
              f"warm {warm:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
