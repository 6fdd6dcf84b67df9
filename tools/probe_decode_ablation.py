"""Where do the 6.13 ms/step go? Ablate the b4/32K int4+wint8 decode step.

Accounted HBM at b4/32K Knorm-0.5 int4+wint8: KV 0.26GB + weights 1.1GB +
lm_head 0.13GB ~ 1.9ms at 800GB/s, +1ms dispatch — measured 6.13ms. This
times variants of the 16-layer step to localize the rest:

  full        — the real step
  no_head     — skip the lm_head matmul (return hidden sum)
  no_attn     — attention replaced by v-passthrough (keeps appends/weights)
  attn_only   — q/k/v proj + attention, MLP skipped
  bf16_w      — full but bf16 weights (isolates the int8-convert cost)

Usage: python tools/probe_decode_ablation.py
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

BATCH, CTX, STEPS, RATIO = 4, 32768, 32, 0.5


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_params_int8(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, CTX), 0,
                             cfg.vocab_size)
    press = KnormPress(compression_ratio=RATIO)

    @functools.partial(jax.jit, static_argnames=())
    def prefill(params, ids):
        _, cache, _ = runner.prefill(params, ids, press=press,
                                     quantized=True, kv_bits=4)
        return cache

    cache0 = prefill(qparams, ids)
    cache0 = shrink(cache0, press.n_kept(CTX) + STEPS + 8)

    def timed(step_fn, wparams, label):
        cache = cache0
        tok = ids[:, -1:]
        tok, cache = step_fn(wparams, tok, cache)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            tok, cache = step_fn(wparams, tok, cache)
        jax.device_get(tok)
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"{label:10s} {dt:6.2f} ms/step", flush=True)

    @jax.jit
    def full(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    @jax.jit
    def no_head(params, tok, cache):
        _, cache, _ = runner.forward(params, tok, cache,
                                     compute_logits=False)
        # fake next token from the cache offset so the chain stays sequential
        return (tok * 0 + cache.offset.astype(jnp.int32) % 1000), cache

    timed(full, qparams, "full")
    timed(no_head, qparams, "no_head")
    timed(full, params, "bf16_w")

    # attention-only / mlp-only: time reduced-layer variants by zeroing out
    # stages is invasive; instead compare 8-layer vs 16-layer slope.
    cfg8 = flagship_config(num_layers=8)
    runner8 = Runner.create(cfg8)
    p8 = quantize_params_int8(
        init_params(cfg8, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )

    @jax.jit
    def pre8(params, ids):
        _, cache, _ = runner8.prefill(params, ids, press=press,
                                      quantized=True, kv_bits=4)
        return cache

    @jax.jit
    def full8(params, tok, cache):
        logits, cache, _ = runner8.forward(params, tok, cache,
                                           logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    c8 = pre8(p8, ids)
    c8 = shrink(c8, press.n_kept(CTX) + STEPS + 8)
    tok = ids[:, -1:]
    tok, c8 = full8(p8, tok, c8)
    jax.device_get(tok)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        tok, c8 = full8(p8, tok, c8)
    jax.device_get(tok)
    dt8 = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{'8-layer':10s} {dt8:6.2f} ms/step  (per-layer slope vs 16L "
          f"isolates fixed overhead)", flush=True)


if __name__ == "__main__":
    main()
