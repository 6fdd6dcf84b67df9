"""Flash-kernel block-size sweep at D=128/16K (is 70 TF/s the ceiling?).

Chained calls, one-element fetch (axon async timing rules, CLAUDE.md).
Usage: python tools/sweep_flash_blocks.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu.ops.flash import flash_attention

B, Hq, Hkv, S, D = 1, 32, 8, 16384, 128


def tfs(bq, bk, iters=8):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.bfloat16)
    f = jax.jit(functools.partial(
        flash_attention, sm_scale=D ** -0.5, block_q=bq, block_k=bk
    ))
    prior = jnp.asarray(0, jnp.int32)
    out = f(q, k, v, prior)
    jax.device_get(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out, k, v, prior)
    jax.device_get(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * 2 * B * Hq * (S * S / 2) * D
    return flops / dt / 1e12


def main():
    for bq in (128, 256, 512, 1024):
        for bk in (512, 1024, 2048):
            try:
                print(f"bq={bq:4d} bk={bk:4d}: {tfs(bq, bk):6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"bq={bq:4d} bk={bk:4d}: FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
