"""D=128 validation (VERDICT r1 #9): the flash kernel's ~34 TF/s at D=64 was
attributed to MXU K-dim half-width; D=128 contracts the full 128-lane width,
so kernel TF/s should roughly double. Also an 8B-class-representative e2e
decode line (D=128 attention, 3B-scale so weights+KV fit one v5e chip).
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
from kvpress_tpu.config import ModelConfig
from kvpress_tpu.ops.flash import flash_attention


def d128_config(num_layers: int = 16) -> ModelConfig:
    """8B-class attention geometry (D=128, GQA 24/8) at 3B scale."""
    return ModelConfig(
        vocab_size=32768,
        hidden_size=3072,
        intermediate_size=8192,
        num_layers=num_layers,
        num_heads=24,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=500000.0,
    )


def kernel_tfs(D, S, B=1, Hq=32, Hkv=8, iters=8):
    # Chain calls (out feeds the next q) and fetch ONE element: device_get of
    # the full output crosses the axon tunnel and would dominate the timing.
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.bfloat16)
    f = jax.jit(functools.partial(flash_attention, sm_scale=D**-0.5))
    prior = jnp.asarray(0, jnp.int32)
    out = f(q, k, v, prior)
    jax.device_get(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out, k, v, prior)
    jax.device_get(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    # causal: 2 matmuls × B·Hq·S²/2 rows×cols × 2·D flops
    flops = 2 * 2 * B * Hq * (S * S / 2) * D
    return flops / dt / 1e12


def main():
    for D in (64, 128):
        for S in (8192, 16384):
            print(f"flash kernel D={D:3d} S={S}: {kernel_tfs(D, S):6.1f} TF/s",
                  flush=True)

    cfg = d128_config()
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    B, CTX, STEPS = 2, 16384, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, CTX), 0, cfg.vocab_size)

    @functools.partial(jax.jit, static_argnames=("press", "quantized", "kv_bits"))
    def prefill(params, ids, press=None, quantized=False, kv_bits=8):
        _, cache, _ = runner.prefill(
            params, ids, press=press, quantized=quantized, kv_bits=kv_bits
        )
        return cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    from kvpress_tpu.models.llama import quantize_params_int8

    qparams = quantize_params_int8(params)
    press = KnormPress(compression_ratio=0.5)
    for name, p, q, b, wp in [
        ("base  bf16      ", None, False, 8, params),
        ("knorm bf16      ", press, False, 8, params),
        ("knorm int4      ", press, True, 4, params),
        ("knorm int4+wint8", press, True, 4, qparams),
    ]:
        cache = prefill(wp, ids, press=p, quantized=q, kv_bits=b)
        keep = press.n_kept(CTX) if p else CTX
        cache = shrink(cache, keep + STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(wp, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            tok, cache = step(wp, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        print(f"3B-D128 decode b{B}/16K {name}: {B*STEPS/dt:7.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
