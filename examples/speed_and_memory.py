"""Speed and memory of compressed decoding (the reference's
notebooks/speed_and_memory.ipynb, TPU-style).

Measures, for an uncompressed / compressed / compressed+int4 cache:
  - prefill(+compress) time
  - decode throughput (chained single-token steps — the async backend needs
    a sequential dependency to time real execution)
  - cache bytes (the thing compression + quantization actually buys)

On CPU this demonstrates the API; run on a TPU chip for meaningful numbers
(tools/bench_quant_e2e.py is the chip-scale version).

Run: JAX_PLATFORMS=cpu python examples/speed_and_memory.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.cache import shrink

CTX, STEPS = 512, 16


def cache_bytes(cache):
    n = cache.keys.nbytes + cache.values.nbytes
    if cache.key_scales is not None:
        n += cache.key_scales.nbytes + cache.value_scales.nbytes
    return n


def main():
    cfg = tiny_config()
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, CTX), 0, cfg.vocab_size)

    @functools.partial(jax.jit, static_argnames=("press", "quantized", "kv_bits"))
    def prefill(params, ids, press=None, quantized=False, kv_bits=8):
        _, cache, _ = runner.prefill(
            params, ids, press=press, dtype=jnp.float32,
            quantized=quantized, kv_bits=kv_bits,
        )
        return cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    press = KnormPress(compression_ratio=0.5)
    for name, p, q, b in [("uncompressed", None, False, 8),
                          ("knorm 0.5", press, False, 8),
                          ("knorm 0.5 + int4", press, True, 4)]:
        t0 = time.perf_counter()
        cache = prefill(params, ids, press=p, quantized=q, kv_bits=b)
        jax.device_get(cache.length)
        t_prefill = time.perf_counter() - t0
        keep = press.n_kept(CTX) if p else CTX
        cache = shrink(cache, keep + STEPS + 4)

        tok = ids[:, -1:]
        tok, cache = step(params, tok, cache)       # compile + warm
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            tok, cache = step(params, tok, cache)
        jax.device_get(tok)
        tps = STEPS / (time.perf_counter() - t0)
        print(f"{name:18s} prefill {t_prefill*1e3:7.1f} ms | "
              f"decode {tps:7.1f} tok/s | cache {cache_bytes(cache)/1e6:6.2f} MB")


if __name__ == "__main__":
    main()
