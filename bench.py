"""Benchmark: compressed-cache decode speedup on the real chip.

Protocol mirrors the reference's speed/memory notebook methodology
(notebooks/speed_and_memory.ipynb: prefill time, decode time, cache bytes,
KnormPress at ratio 0.5). Two lines:

1. (continuity) Llama-3.2-1B-class, batch 4 x 32K — the round-1/2 headline.
2. (north star, BASELINE.md:17) Llama-3.1-8B-class (32L/D128, int8 weights
   — bf16 8B weights are 14.5 GB and cannot serve long context on a 16 GB
   v5e at all), batch 1 x 32K.

Decode is timed as chained single-token steps (sequential dependency forces
real execution on the async backend), >=3 repetitions x >=128 steps; the
JSON carries the MEDIAN and the spread (max-min over median) so
round-over-round comparisons can be read against the documented ±10-20%
chip/tunnel variance. vs_baseline = median compressed / median uncompressed
throughput (reference north star >=1.9x at ratio 0.5 when KV-bound)."""

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.cache import shrink
from kvpress_tpu.models.llama import init_params_int8, quantize_params_int8

from __graft_entry__ import flagship_config

CTX = 32768
DECODE_STEPS = 128
REPS = 3
RATIO = 0.5


def bench_model(runner, params, batch, press, quantized_params_fn=None,
                ctx=CTX):
    """Median decode tok/s for baseline (uncompressed bf16 KV) and the full
    stack (press + int4 KV), sharing compiled steps across reps. The
    baseline arm preallocates decode room via max_size (a later grow would
    transiently double the bf16 cache — measured OOM at 8B, bench_8b)."""
    cfg = runner.cfg
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, ctx), 0,
                             cfg.vocab_size)

    @functools.partial(
        jax.jit, static_argnames=("press", "quantized", "kv_bits", "max_size"))
    def prefill(params, ids, press=None, quantized=False, kv_bits=8,
                max_size=None):
        _, cache, _ = runner.prefill(
            params, ids, press=press, quantized=quantized, kv_bits=kv_bits,
            max_size=max_size,
        )
        return cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def run(press, keep, quantized=False, kv_bits=8, wparams=None):
        wparams = params if wparams is None else wparams
        room = keep + (REPS + 1) * DECODE_STEPS + 8
        cache = prefill(wparams, ids, press=press, quantized=quantized,
                        kv_bits=kv_bits,
                        max_size=room if press is None else None)
        if press is not None:
            cache = shrink(cache, room)
        tok = ids[:, -1:]
        tok, cache = step(wparams, tok, cache)          # compile + warm
        jax.device_get(tok)
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(DECODE_STEPS):
                tok, cache = step(wparams, tok, cache)
            jax.device_get(tok)                         # chain forces execution
            rates.append(batch * DECODE_STEPS / (time.perf_counter() - t0))
        del cache
        return rates

    base = run(None, ctx)
    wq = quantized_params_fn() if quantized_params_fn is not None else params
    comp = run(press, press.n_kept(ctx), quantized=True, kv_bits=4, wparams=wq)
    return base, comp


def emit(metric, base, comp):
    mb, mc = statistics.median(base), statistics.median(comp)
    print(json.dumps({
        "metric": metric,
        "value": round(mc, 2),
        "unit": "tok/s",
        "vs_baseline": round(mc / mb, 3),
        "reps": len(comp),
        "decode_steps": DECODE_STEPS,
        "spread": round((max(comp) - min(comp)) / mc, 3),
        "baseline_tok_s": round(mb, 2),
        "baseline_spread": round((max(base) - min(base)) / mb, 3),
    }), flush=True)


def main():
    press = KnormPress(compression_ratio=RATIO)

    # Line 1 (continuity): 1B-class, b4/32K. Headline stack = Knorm 0.5 +
    # int4 KV through quant_gqa_attention + int8 weights; baseline = bf16
    # weights + uncompressed bf16 cache (reference README.md:166-181 quanto
    # counterpart; FP8-model flag, evaluate.py:370-372).
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    base, comp = bench_model(
        runner, params, batch=4, press=press,
        quantized_params_fn=lambda: quantize_params_int8(params),
    )
    emit(f"decode_tok_s_1B_b4_{CTX//1024}k_ratio{RATIO}_int4_wint8",
         base, comp)
    del params, runner

    # Line 2 (north star): 8B-class (Llama-3.1-8B body, vocab 32768 so
    # embed+head fit — tools/bench_8b.py documents the 16 GB sizing), b1/16K
    # — the longest PAIRED context on 16 GB: int8 weights (7.25 GB; bf16 8B
    # weights alone are 14.5 GB) + 2×bf16 cache (non-donated steps copy it;
    # donation measured slower, bench_8b round 3). At b1 the 8B regime is
    # weights-bound (~1.4x); ≥32K is measured compressed-only in
    # tools/bench_8b.py — compression ENABLES those contexts outright.
    from tools.bench_8b import llama31_8b_config

    cfg8 = llama31_8b_config()
    runner8 = Runner.create(cfg8)
    params8 = init_params_int8(cfg8, jax.random.PRNGKey(0))
    base8, comp8 = bench_model(runner8, params8, batch=1, press=press,
                               ctx=16384)
    emit(f"decode_tok_s_8B_b1_16k_ratio{RATIO}_int4_wint8", base8, comp8)
    del params8, runner8

    # Line 3 (north star, KV-bound): 8B body, int4 weights (3.6 GB), b2/16K
    # — the operating point where KV traffic dominates weight traffic, so
    # the ≥1.9× target is meaningful (b1 is weights-bound; 1.43× IS its
    # bandwidth ceiling — README/BASELINE.md math). Baseline decodes
    # DONATED (two bf16 cache copies cannot exist at this shape; donated
    # single-cache residency is its only feasible mode) with periodic syncs
    # bounding the dispatch queue's output allocations; both arms prefill
    # through the lean chunk path (the one-shot scan's xs+ys double cache
    # OOMs). Guarded: a failure here must not lose lines 1-2.
    try:
        base_kb, comp_kb = bench_8b_kvbound(press)
        emit(f"decode_tok_s_8B_b2_16k_ratio{RATIO}_int4kv_int4w_kvbound",
             base_kb, comp_kb)
    except Exception as e:                                   # noqa: BLE001
        print(f"# kvbound leg failed: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def bench_8b_kvbound(press, ctx=16384, batch=2):
    from tools.bench_8b import llama31_8b_config

    cfg = llama31_8b_config()
    runner = Runner.create(cfg)
    params = init_params_int8(cfg, jax.random.PRNGKey(0), bits=4)
    jax.block_until_ready(params["layers"]["wd"])
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, ctx), 0,
                             cfg.vocab_size)

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step_donated(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def run(press, keep, quantized, kv_bits, donate):
        room = keep + (REPS + 1) * DECODE_STEPS + 8
        _, cache, _ = runner.prefill_chunked(
            params, ids, press=press, chunk_size=8192,
            quantized=quantized, kv_bits=kv_bits,
            max_size=room if press is None else None,
        )
        if press is not None:
            cache = shrink(cache, room)
        tok = ids[:, -1:]
        fn = step_donated if donate else step
        tok, cache = fn(params, tok, cache)
        jax.device_get(tok)
        # one full untimed rep: the first timed rep otherwise absorbs
        # allocator warm-up at these cache sizes (measured spread 0.57
        # without it vs 0.001 on the smaller legs)
        for i in range(DECODE_STEPS):
            tok, cache = fn(params, tok, cache)
            if (i + 1) % 4 == 0:
                jax.device_get(tok)
        jax.device_get(tok)
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for i in range(DECODE_STEPS):
                tok, cache = fn(params, tok, cache)
                if donate and (i + 1) % 4 == 0:
                    jax.device_get(tok)   # bound queued cache allocations
            jax.device_get(tok)
            rates.append(batch * DECODE_STEPS / (time.perf_counter() - t0))
        del cache
        return rates

    base = run(None, ctx, False, 8, donate=True)
    comp = run(press, press.n_kept(ctx), True, 4, donate=False)
    return base, comp


if __name__ == "__main__":
    main()
