"""Isolate per-pallas_call overhead inside a single jit.

sweep_decode_bk.py shows the decode kernel pays ~+1 ms/layer over XLA dense
at identical HBM bytes. Chain N data-dependent calls of each candidate inside
one jit and read the slope: per-call cost with zero host dispatch in between.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kvpress_tpu.ops.attention import attention_bias, gqa_attention
from kvpress_tpu.ops.decode import decode_attention

B, Hq, Hkv, D = 4, 32, 8, 64
S = 18432
T = 1


def time_chain(fn, args, n_iter=6):
    f4 = jax.jit(functools.partial(fn, n=8))
    f12 = jax.jit(functools.partial(fn, n=64))
    r = jax.device_get(f4(*args))
    r = jax.device_get(f12(*args))
    ts = {}
    for name, f in [("n4", f4), ("n12", f12)]:
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = jax.device_get(f(*args))
        ts[name] = (time.perf_counter() - t0) / n_iter
    slope = (ts["n12"] - ts["n4"]) / 56
    return slope * 1e3, ts["n4"] * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.bfloat16)
    length = jnp.asarray(S - 8, jnp.int32)

    def chain_kernel(q, k, v, length, n):
        out = q
        for _ in range(n):
            out = decode_attention(
                out, k, v, length, sm_scale=D**-0.5, block_k=2048
            )
        return out

    def chain_kernel_nomask(q, k, v, length, n):
        # mask=None → trivial table, no argsort
        return chain_kernel(q, k, v, length, n)

    def chain_xla(q, k, v, length, n):
        bias = attention_bias(length - T, T, S)
        dead = jnp.arange(S) >= length
        bias = jnp.where(dead[None, None, None, :], -2.0e38, bias)
        out = q
        for _ in range(n):
            out, _ = gqa_attention(out, k, v, bias, D**-0.5)
        return out

    def trivial_kernel_body(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def chain_trivial(q, k, v, length, n):
        x = q.reshape(B * Hq, D).astype(jnp.float32)
        for _ in range(n):
            x = pl.pallas_call(
                trivial_kernel_body,
                out_shape=jax.ShapeDtypeStruct((B * Hq, D), jnp.float32),
            )(x)
        return x

    mask = jnp.ones((B, Hkv, S), bool)

    def chain_kernel_mask(q, k, v, length, n):
        out = q
        for _ in range(n):
            out = decode_attention(
                out, k, v, length, mask=mask, sm_scale=D**-0.5, block_k=2048
            )
        return out

    for name, fn in [
        ("xla dense      ", chain_xla),
        ("decode kernel  ", chain_kernel_nomask),
        ("decode kern+msk", chain_kernel_mask),
        ("trivial pallas ", chain_trivial),
    ]:
        slope, base = time_chain(fn, (q, k, v, length))
        print(f"{name} slope {slope:7.3f} ms/call   (n4 total {base:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
