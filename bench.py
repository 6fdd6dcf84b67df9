"""Benchmark: compressed-cache decode speedup on the real chip.

Protocol mirrors the reference's speed/memory notebook methodology
(notebooks/speed_and_memory.ipynb: prefill time, decode time, cache bytes,
KnormPress at ratio 0.5) on a Llama-3.2-1B-class model, sized so the KV cache
dominates HBM traffic (batch 4 × 32K context).

Decode is timed as chained single-token steps (sequential dependency forces
real execution on the async backend). Prints ONE JSON line; vs_baseline is
the decode-throughput speedup over the uncompressed cache (reference north
star: >=1.9x at ratio 0.5 when KV-bound, BASELINE.md)."""

import functools
import json
import time

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
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, CTX), 0, cfg.vocab_size
    )

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

    def run(press, keep, quantized=False, kv_bits=8, wparams=None):
        wparams = params if wparams is None else wparams
        cache = prefill(wparams, ids, press=press, quantized=quantized,
                        kv_bits=kv_bits)
        cache = shrink(cache, keep + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(wparams, tok, cache)          # compile + warm
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(wparams, tok, cache)
        jax.device_get(tok)                             # chain forces execution
        dt = time.perf_counter() - t0
        return BATCH * DECODE_STEPS / dt

    press = KnormPress(compression_ratio=RATIO)
    tps_base = run(None, CTX)
    # Headline: the full compression stack — Knorm 0.5 + int4 KV cache
    # decoded through quant_gqa_attention (payload-width HBM reads;
    # reference README.md:166-181 quanto counterpart) + int8 weights (the
    # reference's FP8-model flag, evaluate.py:370-372; tools/
    # bench_weight_int8.py for the component sweep). Baseline = bf16
    # weights + uncompressed bf16 cache.
    from kvpress_tpu.models.llama import quantize_params_int8

    tps_comp = run(press, press.n_kept(CTX), quantized=True, kv_bits=4,
                   wparams=quantize_params_int8(params))

    print(json.dumps({
        "metric": f"decode_tok_s_1B_b{BATCH}_{CTX//1024}k_ratio{RATIO}_int4_wint8",
        "value": round(tps_comp, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps_comp / tps_base, 3),
    }))


if __name__ == "__main__":
    main()
