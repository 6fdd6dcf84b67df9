"""E2E decode throughput: bf16 vs int8 vs int4 KV cache on the real chip.

Flagship bench shape (b4 / 32K / Knorm ratio 0.5, 16L 1B-class). The quant
paths decode through quant_gqa_attention (ops/attention.py) — payload-width
HBM reads, no materialized dequant buffer (VERDICT r1 item 1). Expectation
from the attention-op probe (tools/probe_quant_xla.py: int8 0.056 ms vs bf16
0.119 ms per layer-call at 18K): int8 shaves ~½ of the KV share of the step.
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

    press = KnormPress(compression_ratio=RATIO)
    keep = press.n_kept(CTX)

    def run(quantized, kv_bits):
        cache = prefill(params, ids, press=press, quantized=quantized,
                        kv_bits=kv_bits)
        cache = shrink(cache, keep + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(DECODE_STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        dt = time.perf_counter() - t0
        return BATCH * DECODE_STEPS / dt

    for name, q, b in [("bf16", False, 8), ("int8", True, 8), ("int4", True, 4)]:
        tps = run(q, b)
        print(f"{name}: {tps:8.1f} tok/s  ({1e3 * BATCH / tps:.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
