"""Does XLA fuse the dequant into the dot? Chained-call slopes on chip.

If fusion works, int8 attention's per-call marginal cost is ~1/2 of bf16 and
int4 ~1/4 (payload-width HBM reads). If XLA materializes the converted
buffer, they'd be *slower* than bf16.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu.cache import quantize_kv
from kvpress_tpu.ops.attention import (
    attention_bias, gqa_attention, quant_gqa_attention,
)

B, Hq, Hkv, D = 4, 32, 8, 64
S = 18432
T = 1


def slope_ms(fn, args, n_iter=6):
    f_lo = jax.jit(functools.partial(fn, n=8))
    f_hi = jax.jit(functools.partial(fn, n=64))
    jax.device_get(f_lo(*args))
    jax.device_get(f_hi(*args))
    ts = {}
    for name, f in [("lo", f_lo), ("hi", f_hi)]:
        t0 = time.perf_counter()
        for _ in range(n_iter):
            jax.device_get(f(*args))
        ts[name] = (time.perf_counter() - t0) / n_iter
    return (ts["hi"] - ts["lo"]) / 56 * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.bfloat16)
    length = jnp.asarray(S - 8, jnp.int32)

    def mkbias():
        bias = attention_bias(length - T, T, S)
        dead = jnp.arange(S) >= length
        return jnp.where(dead[None, :], -2.0e38, bias)

    def chain_bf16(q, k, v, n):
        # Each iteration writes one KV slot (as real decode does) so nothing
        # about K/V is loop-invariant — no hoisting of dequant/unpack.
        bias = mkbias()
        out = q
        for _ in range(n):
            nk = out.reshape(B, Hkv, 4, D).mean(2)[:, :, None, :].astype(k.dtype)
            k = jax.lax.dynamic_update_slice_in_dim(k, nk, S - 4, axis=2)
            v = jax.lax.dynamic_update_slice_in_dim(v, nk, S - 4, axis=2)
            out, _ = gqa_attention(out, k, v, bias, D**-0.5)
        return out

    qk8, sk8 = quantize_kv(k, 8)
    qv8, sv8 = quantize_kv(v, 8)
    qk4, sk4 = quantize_kv(k, 4)
    qv4, sv4 = quantize_kv(v, 4)

    def chain_q(q, pk, pv, sk, sv, n, bits):
        bias = mkbias()
        out = q
        for _ in range(n):
            nk = out.reshape(B, Hkv, 4, D).mean(2)[:, :, None, :]
            np_, ns = quantize_kv(nk, bits)
            pk = jax.lax.dynamic_update_slice_in_dim(pk, np_.astype(pk.dtype), S - 4, axis=2)
            pv = jax.lax.dynamic_update_slice_in_dim(pv, np_.astype(pv.dtype), S - 4, axis=2)
            sk = jax.lax.dynamic_update_slice_in_dim(sk, ns, S - 4, axis=2)
            sv = jax.lax.dynamic_update_slice_in_dim(sv, ns, S - 4, axis=2)
            out = quant_gqa_attention(out, pk, pv, sk, sv, bias, D**-0.5, bits)
        return out

    print(f"bf16  slope {slope_ms(chain_bf16, (q, k, v)):7.3f} ms/call",
          flush=True)
    i8 = slope_ms(functools.partial(chain_q, bits=8), (q, qk8, qv8, sk8, sv8))
    print(f"int8  slope {i8:7.3f} ms/call",
          flush=True)
    i4 = slope_ms(functools.partial(chain_q, bits=4), (q, qk4, qv4, sk4, sv4))
    print(f"int4  slope {i4:7.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
