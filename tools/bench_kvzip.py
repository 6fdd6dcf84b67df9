"""KVzip multi-pass at scale on the real chip: what does query-agnostic
context-reconstruction scoring cost at 16K-64K?

The reference warns 2-3x prefill cost (kvzip_press.py:57-62). Here the
repeat passes are jitted chunk forwards orchestrated by the pipeline
(pipeline._run_kvzip); this measures plain prefill vs the full KVzip
compress (prefill + reconstruction passes + global bottom-k) and the answer
against the compressed cache.

--model 8b runs the Llama-3.1-8B body (int8 weights) with CHUNKED prefill
(VERDICT r3 item 2: KVzip over a chunk-prefilled cache — the one-shot 8B
prefill cannot run at 32K+ on a 16 GB chip). Pass --kv-bits 4 at 32K+:
the repeat-pass forwards thread the full cache through the layer scan as
xs AND ys, so a bf16 32K cache costs 2x4.6 GB next to 7.25 GB weights
(measured RESOURCE_EXHAUSTED); the int4 payload fits with room.

Usage: python tools/bench_kvzip.py [ctx_tokens] [--model 1b|8b]
       [--kv-bits N] [--chunk N] [--compact] [--no-plain]

Measured (round 4, real v5e, int8 weights + int4 KV, lean repeat passes):
  8b 32K: plain 6.9s warm, kvzip 24.2s (compile+1st 56s)
  8b 64K: plain 21.2s, kvzip 68.5s (3.2x; the full-forward scorer OOMs)
  8b 128K (--compact --no-plain): kvzip 314s = 3.45x the 91s plain
    chunked prefill; answer decodes off the compacted ~69K-slot cache
  1b 16K: plain 0.9s, kvzip 4.5s
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KVzipPress, Runner, init_params
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ctx", type=int, nargs="?", default=16384)
    ap.add_argument("--model", default="1b", choices=("1b", "8b"))
    ap.add_argument("--kv-bits", type=int, default=0,
                    help="0 = bf16 cache; 4/8 = quantized")
    ap.add_argument("--chunk", type=int, default=0,
                    help="context_chunk for the prefill (0 = exact; the 8B "
                         "model defaults to 8192)")
    ap.add_argument("--compact", action="store_true",
                    help="KVzipPress(compact=True): head-wise compaction of "
                         "the eviction mask (cache.compact_masked) — "
                         "REQUIRED at 8B/128K (the full masked buffer "
                         "cannot decode: 2 non-donated copies next to the "
                         "weights OOM)")
    ap.add_argument("--no-plain", action="store_true",
                    help="skip the pressless leg (8B/128K: an uncompressed "
                         "128K cache cannot decode on 16 GB at all — there "
                         "is nothing to compare against)")
    args = ap.parse_args()

    if args.model == "8b":
        from kvpress_tpu.models.llama import init_params_int8
        from tools.bench_8b import llama31_8b_config

        cfg = llama31_8b_config()
        t0 = time.perf_counter()
        params = init_params_int8(cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(params["layers"]["wd"])
        print(f"init int8 8B params in {time.perf_counter()-t0:.0f}s",
              flush=True)
        if args.chunk == 0:
            args.chunk = 8192
    else:
        from __graft_entry__ import flagship_config

        cfg = flagship_config(num_layers=16)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = Runner.create(cfg)
    tok = ToyTokenizer(cfg.vocab_size)
    pipe = KVPressPipeline(runner, params, tok)

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in rng.integers(0, 30000, args.ctx - 8)]
    context = " ".join(words)
    question = "what is w3 ?"
    kw = {}
    if args.kv_bits:
        kw.update(quantized=True, kv_bits=args.kv_bits)
    if args.chunk:
        kw.update(context_chunk=args.chunk)

    # plain prefill + answer (warm twice: first call compiles)
    legs = [
        ("no press    ", None),
        ("kvzip 0.5   ", KVzipPress(compression_ratio=0.5,
                                    compact=args.compact)),
    ]
    if args.no_plain:
        legs = legs[1:]
    for label, press in legs:
        t = []
        for it in range(2):
            t0 = time.perf_counter()
            out = pipe(context, question=question, press=press,
                       max_new_tokens=8, **kw)
            t.append(time.perf_counter() - t0)
        n_ctx = len(tok.encode(context)) + 1
        print(f"{label} ctx {n_ctx}: compile+1st {t[0]:6.1f}s, "
              f"warm {t[1]:6.1f}s ({n_ctx / t[1]:7.0f} tok/s incl. answer)",
              flush=True)


if __name__ == "__main__":
    main()
