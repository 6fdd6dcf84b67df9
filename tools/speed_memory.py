"""Speed & memory sweep — the scripted equivalent of the reference's
notebooks/speed_and_memory.ipynb protocol: prefill time, decode time, and KV
cache bytes over context lengths × compression ratios, bf16 vs int8 cache,
with KnormPress.

Usage (real chip):
    python tools/speed_memory.py --contexts 4096,8192,32768 \
        --ratios 0,0.25,0.5,0.75 --output results/speed_memory.json
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params
from kvpress_tpu.cache import shrink

from __graft_entry__ import flagship_config

DECODE_STEPS = 16


def cache_bytes(cache) -> int:
    total = cache.keys.size * cache.keys.dtype.itemsize
    total += cache.values.size * cache.values.dtype.itemsize
    if cache.key_scales is not None:
        total += 2 * cache.key_scales.size * cache.key_scales.dtype.itemsize
    return total


def sweep(contexts, ratios, num_layers=16, batch=1, quantized=False, kv_bits=8):
    cfg = flagship_config(num_layers=num_layers)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("press", "quantized", "kv_bits"))
    def prefill(params, ids, press=None, quantized=False, kv_bits=8):
        logits, cache, _ = runner.prefill(
            params, ids, press=press, quantized=quantized, kv_bits=kv_bits,
            compute_logits=True
        )
        return logits[0, -1, :8], cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    rows = []
    for S in contexts:
        ids = jax.random.randint(jax.random.PRNGKey(1), (batch, S), 0, cfg.vocab_size)
        for ratio in ratios:
            press = KnormPress(compression_ratio=ratio) if ratio > 0 else None
            # prefill timing
            out, cache = prefill(params, ids, press=press, quantized=quantized, kv_bits=kv_bits)
            jax.device_get(out)
            t0 = time.perf_counter()
            out, cache = prefill(params, ids, press=press, quantized=quantized, kv_bits=kv_bits)
            jax.device_get(out)
            prefill_s = time.perf_counter() - t0

            kept = press.n_kept(S) if press else S
            cache = shrink(cache, kept + DECODE_STEPS + 4)
            kv_bytes = cache_bytes(cache)

            tok = ids[:, -1:]
            tok2, c2 = step(params, tok, cache)
            jax.device_get(tok2)
            t0 = time.perf_counter()
            c2 = cache
            for _ in range(DECODE_STEPS):
                tok, c2 = step(params, tok, c2)
            jax.device_get(tok)
            decode_s = (time.perf_counter() - t0) / DECODE_STEPS

            rows.append({
                "context": S,
                "ratio": ratio,
                "quantized": quantized,
                "kv_bits": kv_bits if quantized else 16,
                "prefill_s": round(prefill_s, 4),
                "prefill_tok_s": round(S / prefill_s, 1),
                "decode_ms_per_tok": round(decode_s * 1000, 3),
                "decode_tok_s": round(batch / decode_s, 1),
                "kv_cache_mb": round(kv_bytes / 2**20, 1),
            })
            print(json.dumps(rows[-1]))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--contexts", default="4096,8192")
    p.add_argument("--ratios", default="0,0.25,0.5,0.75")
    p.add_argument("--num_layers", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--quantized", action="store_true")
    p.add_argument("--kv_bits", type=int, default=8)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    contexts = [int(x) for x in args.contexts.split(",")]
    ratios = [float(x) for x in args.ratios.split(",")]
    rows = sweep(contexts, ratios, args.num_layers, args.batch, args.quantized, args.kv_bits)
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
