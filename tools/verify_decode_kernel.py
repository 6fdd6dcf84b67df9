"""On-chip validation + timing of ops/decode.py.

Timing method: N kernel calls inside one lax.scan in a single jit (one
dispatch), mirroring how the kernel runs inside the 16-layer decode scan —
the per-call ~1ms axon dispatch latency (CLAUDE.md) is amortized away.
Reports ms per call for each variant vs the XLA dense path.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu.cache import dequantize_kv, quantize_kv
from kvpress_tpu.ops.attention import attention_bias, gqa_attention
from kvpress_tpu.ops.decode import decode_attention

B, Hq, Hkv, T, S, D = 4, 32, 8, 1, 32768, 64
N_CALLS = 32
LIVE_FRac = 0.5


def timed(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    run_s = time.perf_counter() - t0
    return out, compile_s, run_s


def scan_harness(step):
    """step(q, *ops) -> (B,Hq,T,D); N_CALLS distinct calls inside one jit.

    Operands MUST be passed as explicit arguments, not closures — the axon
    remote-compile tunnel rejects HLO with large captured constants
    (HTTP 413) and can appear to hang."""
    @jax.jit
    def run(qs, *ops):
        def body(acc, q):
            return acc + step(q, *ops).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((B, Hq, T, D), jnp.float32), qs)
        return acc
    return run


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qs = jax.random.normal(ks[0], (N_CALLS, B, Hq, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.bfloat16)
    length = jnp.asarray(S, jnp.int32)
    sm = D ** -0.5

    # Compacted-prefix mask: per-head live prefix of LIVE_FRAC*S + tail 64.
    prefix = int(S * LIVE_FRac)
    mask = jnp.zeros((B, Hkv, S), bool)
    mask = mask.at[:, :, :prefix].set(True).at[:, :, -64:].set(True)

    kq8, ks8 = quantize_kv(k, 8)
    vq8, vs8 = quantize_kv(v, 8)
    kq4, ks4 = quantize_kv(k, 4)
    vq4, vs4 = quantize_kv(v, 4)

    # ---- parity on chip (single call, vs XLA dense on dequantized buffers) --
    def xla_ref(kk, vv, m):
        bias = attention_bias(length - T, T, S, head_mask=m)
        out, _ = gqa_attention(
            qs[0].astype(jnp.float32), kk.astype(jnp.float32),
            vv.astype(jnp.float32), bias, sm)
        return out

    checks = {
        "dense": (dict(mask=None), k, v, None),
        "masked": (dict(mask=mask), k, v, mask),
        "int8": (dict(bits=8, k_scales=ks8, v_scales=vs8), kq8, vq8, None),
        "int4": (dict(bits=4, k_scales=ks4, v_scales=vs4), kq4, vq4, None),
        "int4+mask": (
            dict(bits=4, k_scales=ks4, v_scales=vs4, mask=mask), kq4, vq4, mask
        ),
    }
    for name, (kw, kk, vv, m) in checks.items():
        got = decode_attention(qs[0], kk, vv, length, sm_scale=sm, **kw)
        if "bits" in kw:
            bits = kw["bits"]
            kd = dequantize_kv(kk, kw["k_scales"], bits, jnp.float32)
            vd = dequantize_kv(vv, kw["v_scales"], bits, jnp.float32)
        else:
            kd, vd = k, v
        ref = xla_ref(kd, vd, m)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"parity {name:10s} rel_err={err:.2e}")
        assert err < 2e-2, name

    # ---- timing ----------------------------------------------------------
    def bench(name, step, *ops):
        run = scan_harness(step)
        _, comp, _ = timed(run, qs, *ops)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(run(qs, *ops))
        dt = (time.perf_counter() - t0) / 3 / N_CALLS * 1e3
        print(f"{name:16s} {dt:7.3f} ms/call   (compile {comp:.1f}s)", flush=True)
        return dt

    bias_none = attention_bias(length - T, T, S)
    bias_mask = attention_bias(length - T, T, S, head_mask=mask)

    bench("xla dense",
          lambda q, kk, vv, bb: gqa_attention(q, kk, vv, bb, sm)[0],
          k, v, bias_none)
    bench("xla masked",
          lambda q, kk, vv, bb: gqa_attention(q, kk, vv, bb, sm)[0],
          k, v, bias_mask)
    bench("kernel dense",
          lambda q, kk, vv, ln: decode_attention(q, kk, vv, ln, sm_scale=sm),
          k, v, length)
    bench("kernel masked",
          lambda q, kk, vv, ln, m: decode_attention(
              q, kk, vv, ln, mask=m, sm_scale=sm),
          k, v, length, mask)
    bench("kernel int8",
          lambda q, kk, vv, ln, s1, s2: decode_attention(
              q, kk, vv, ln, k_scales=s1, v_scales=s2, bits=8, sm_scale=sm),
          kq8, vq8, length, ks8, vs8)
    bench("kernel int4",
          lambda q, kk, vv, ln, s1, s2: decode_attention(
              q, kk, vv, ln, k_scales=s1, v_scales=s2, bits=4, sm_scale=sm),
          kq4, vq4, length, ks4, vs4)
    bench("kernel int4+mask",
          lambda q, kk, vv, ln, s1, s2, m: decode_attention(
              q, kk, vv, ln, k_scales=s1, v_scales=s2, mask=m,
              bits=4, sm_scale=sm),
          kq4, vq4, length, ks4, vs4, mask)
    print("DECODE KERNEL OK")


if __name__ == "__main__":
    main()
