"""Benchmark: compressed-cache decode speedup on the real chip.

Protocol mirrors the reference's speed/memory notebook methodology
(notebooks/speed_and_memory.ipynb: prefill time, decode time, cache bytes,
KnormPress across ratios) on a Llama-3.2-1B-class model.

Prints ONE JSON line: decode tok/s with a ratio-0.5-compressed cache, and
vs_baseline = speedup over the uncompressed-cache decode (reference north
star: >=1.9x at ratio 0.5, BASELINE.md)."""

import json
import time

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.cache import shrink

from __graft_entry__ import flagship_config

CTX = 8192
DECODE_STEPS = 64
RATIO = 0.5


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, CTX), 0, cfg.vocab_size)

    import functools

    @functools.partial(jax.jit, static_argnames=("press",))
    def prefill(params, ids, press=None):
        _, cache, _ = runner.prefill(params, ids, press=press)
        return cache

    @jax.jit
    def decode_n(params, tok, cache):
        def body(carry, _):
            tok, cache = carry
            logits, cache, _ = runner.forward(
                params, tok, cache, logits_last_only=True
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt[0, 0]

        (tok, cache), toks = jax.lax.scan(body, (tok, cache), None, length=DECODE_STEPS)
        return toks

    def run(press, keep):
        cache = prefill(params, ids, press=press)
        cache = shrink(cache, keep + DECODE_STEPS + 8)
        tok = ids[:, -1:]
        decode_n(params, tok, cache).block_until_ready()  # compile
        t0 = time.perf_counter()
        decode_n(params, tok, cache).block_until_ready()
        dt = time.perf_counter() - t0
        return DECODE_STEPS / dt

    press = KnormPress(compression_ratio=RATIO)
    tps_base = run(None, CTX)
    tps_comp = run(press, press.n_kept(CTX))

    print(json.dumps({
        "metric": f"decode_tok_s_1B_{CTX//1024}k_ratio{RATIO}",
        "value": round(tps_comp, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps_comp / tps_base, 3),
    }))


if __name__ == "__main__":
    main()
