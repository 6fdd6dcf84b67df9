"""E2e decode: int8 weights x {bf16, int4} KV cache.

Decode at b4/32K is HBM-floor-bound (CLAUDE.md: ~2.2 GB weights + KV per
step). With the KV side already at int4 (quant_gqa_attention), the weight
bytes dominate — quantize_params_int8 halves them, and XLA fuses the
int8→bf16 convert into the dot's operand read. This measures the remaining
stack: bf16/int8 weights x bf16/int4 KV, Knorm ratio 0.5.

Usage: python tools/bench_weight_int8.py
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

BATCH = 4
CTX = 32768
DECODE_STEPS = 32
RATIO = 0.5


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params_bf16 = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params_int8 = quantize_params_int8(params_bf16)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, CTX), 0, cfg.vocab_size
    )
    press = KnormPress(compression_ratio=RATIO)
    keep = press.n_kept(CTX)

    @functools.partial(jax.jit, static_argnames=("quantized", "kv_bits"))
    def prefill(params, ids, quantized, kv_bits):
        _, cache, _ = runner.prefill(
            params, ids, press=press, quantized=quantized, kv_bits=kv_bits
        )
        return cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def run(params, quantized, kv_bits, label):
        cache = prefill(params, ids, quantized, kv_bits)
        cache = shrink(cache, keep + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        tps = BATCH * DECODE_STEPS / dt
        print(f"{label:28s} {tps:7.1f} tok/s ({BATCH*1000/tps:.2f} ms/step)",
              flush=True)
        return tps

    run(params_bf16, False, 8, "w-bf16  kv-bf16  knorm.5")
    run(params_bf16, True, 4, "w-bf16  kv-int4  knorm.5")
    run(params_int8, False, 8, "w-int8  kv-bf16  knorm.5")
    run(params_int8, True, 4, "w-int8  kv-int4  knorm.5")


if __name__ == "__main__":
    main()
