"""Sweep decode-kernel block_k e2e to locate the per-cell-overhead knee.

Hypothesis (tools/bench_decode_e2e.py): the (B, Hkv, nb) grid at bk=2048
is 288 cells of tiny matmuls; Mosaic per-cell overhead, not HBM bandwidth,
dominates. Fewer/larger cells should close the 94-vs-285 tok/s gap.

Usage: python tools/sweep_decode_bk.py
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

    def run(quantized, kv_bits, decode_kernel, block_k):
        runner = Runner.create(cfg, attn_impl="flash",
                               decode_kernel=decode_kernel,
                               decode_block_k=block_k)

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

        cache = prefill(params, ids, press=press)
        # Align the shrunk buffer to block_k so the kernel's pad is a no-op.
        tgt = keep + DECODE_STEPS + 8
        tgt = -(-tgt // block_k) * block_k
        cache = shrink(cache, tgt)
        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        return BATCH * DECODE_STEPS / dt

    for name, qz, bits, dk, bk in [
        ("xla dense      ", False, 8, False, 2048),
        ("kernel bk=2048 ", False, 8, True, 2048),
        ("kernel bk=4096 ", False, 8, True, 4096),
        ("kernel bk=8192 ", False, 8, True, 8192),
        ("kernel bk=16384", False, 8, True, 16384),
        ("int4   bk=8192 ", True, 4, True, 8192),
        ("int4   bk=16384", True, 4, True, 16384),
        ("int8   bk=16384", True, 8, True, 16384),
    ]:
        tps = run(qz, bits, dk, bk)
        print(f"{name} {tps:7.1f} tok/s  ({BATCH*1000/tps:.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
