"""128K-context north star on one chip: prefill+compress, then decode —
uncompressed bf16 baseline vs Knorm-0.5 bf16 vs the full stack
(Knorm-0.5 + int4 KV + int8 weights).

Round-1 measured (bf16 only): prefill 4,631 tok/s; decode 69.2 vs 25.0
uncompressed = 2.77x. This adds the quantized decode path.

Usage: python tools/bench_128k.py
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
from kvpress_tpu.models.llama import quantize_params_int8

from __graft_entry__ import flagship_config

CTX = 131072
DECODE_STEPS = 16
RATIO = 0.5


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, CTX), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=RATIO)
    keep = press.n_kept(CTX)

    def run(label, use_press, quantized, kv_bits, wparams):
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

        def sync(c):
            # axon backend: block_until_ready returns early on batched
            # dispatches (CLAUDE.md) — fetch bytes to force execution
            jax.device_get(c.keys[0, 0, 0, :2])

        p = press if use_press else None
        t0 = time.perf_counter()
        cache = prefill(wparams, ids, press=p)
        sync(cache)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        cache = prefill(wparams, ids, press=p)
        sync(cache)
        pf = time.perf_counter() - t0
        cache = shrink(cache, (keep if use_press else CTX) + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(wparams, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(wparams, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        tps = DECODE_STEPS / dt
        print(f"{label:26s} prefill {CTX/pf:7.0f} tok/s ({pf:5.1f}s, "
              f"compile+1st {warm:.0f}s)  decode {tps:6.1f} tok/s "
              f"({1000*dt/DECODE_STEPS:.2f} ms/step)", flush=True)
        return tps

    qparams = quantize_params_int8(params)
    base = run("bf16 uncompressed", False, False, 8, params)
    comp = run("bf16 knorm-0.5", True, False, 8, params)
    full = run("int4+wint8 knorm-0.5", True, True, 4, qparams)
    print(f"speedups vs uncompressed: knorm {comp/base:.2f}x, "
          f"full stack {full/base:.2f}x", flush=True)


if __name__ == "__main__":
    main()
