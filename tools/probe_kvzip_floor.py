"""KVzip cost decomposition vs its FLOP floor (VERDICT r4 item 5).

The reference warns KVzip costs 2-3x the initial prefill
(kvzip_press.py:57-62); measured here it sits at 3.2-3.5x at 8B. This probe
separates the three components on the real chip:

  1. the initial chunked prefill (T_p) — the 1x everyone pays;
  2. the repeat-chunk FORWARDS (T_f) — each pass forwards ~chunk_size
     repeat tokens whose attention walks the FULL context, so the repeat
     phase's attention FLOPs alone are ~2x the prefill's causal half —
     this is the structural floor, identical for the reference (its repeat
     forwards walk the same keys);
  3. the scorer on top (T_s = T_r - T_f) — the subset logsumexp/max einsum.

Method: per-pass host-synced timing of kvzip_repeat_pass with the REAL
(sink|chunk|repeat) spec vs a TINY spec (chunk_len=8: same forward, ~zero
scorer) — their difference is the scorer's marginal cost.

Usage: python tools/probe_kvzip_floor.py [ctx] [--layers 16]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import flagship_config
from kvpress_tpu import Runner, init_params
from kvpress_tpu.presses.kvzip import KVzipPress


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ctx", type=int, nargs="?", default=16384)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--eightb", action="store_true",
                    help="Llama-3.1-8B body with int8 weights + int4 KV "
                         "(the bench_8b operating point)")
    args = ap.parse_args()

    if args.eightb:
        import pathlib as _p
        import sys as _s
        _s.path.insert(0, str(_p.Path(__file__).resolve().parent))
        from bench_8b import llama31_8b_config

        from kvpress_tpu.models.llama import init_params_int8

        cfg = llama31_8b_config()
        runner = Runner.create(cfg)
        params = init_params_int8(cfg, jax.random.PRNGKey(0))
    else:
        cfg = flagship_config(num_layers=args.layers)
        runner = Runner.create(cfg)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    press = KVzipPress(compression_ratio=0.5, chunk_size=args.chunk)
    S = args.ctx
    room = press.repeat_room()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)

    qkw = (dict(quantized=True, kv_bits=4) if args.eightb else {})

    def prefill():
        _, cache, _ = runner.prefill_chunked(
            params, ids, chunk_size=8192, max_size=S + room, **qkw)
        jax.device_get(jnp.max(cache.length))
        return cache

    cache = prefill()                     # compile
    t0 = time.perf_counter()
    cache = prefill()
    t_p = time.perf_counter() - t0
    print(f"prefill (chunked, pressless): {t_p:6.2f}s "
          f"({S / t_p:7.0f} tok/s)", flush=True)

    # repeat prompts: ~question + chunk (the pipeline's actual pairs have a
    # ~20-token question head; the forward cost is chunk-dominated)
    n_passes = S // args.chunk
    rep = jax.random.randint(jax.random.PRNGKey(2), (1, args.chunk + 24), 0,
                             cfg.vocab_size)

    def run_passes(chunk_len):
        # warm/compile one pass first
        _, sc = runner.kvzip_repeat_pass(params, rep, cache, 4, 4, chunk_len)
        jax.device_get(sc[0, 0, 0, 0])
        ts = []
        for i in range(n_passes):
            t0 = time.perf_counter()
            _, sc = runner.kvzip_repeat_pass(
                params, rep, cache, 4 + i * args.chunk, 4, chunk_len)
            jax.device_get(sc[0, 0, 0, 0])   # per-pass sync (decomposition)
            ts.append(time.perf_counter() - t0)
        return sum(ts), ts

    t_r, ts_r = run_passes(args.chunk)    # real scorer spec
    t_f, ts_f = run_passes(8)             # same forward, ~zero scorer
    t_s = t_r - t_f
    total = t_p + t_r
    floor = t_p + t_f
    print(f"repeat passes ({n_passes}x{args.chunk}): real {t_r:6.2f}s, "
          f"forward-only {t_f:6.2f}s, scorer marginal {t_s:6.2f}s",
          flush=True)
    print(f"per-pass: real {t_r/n_passes*1e3:6.1f} ms, forward-only "
          f"{t_f/n_passes*1e3:6.1f} ms", flush=True)
    print(f"TOTAL {total:6.2f}s = {total/t_p:.2f}x prefill   "
          f"FLOOR (prefill + repeat forwards) {floor:6.2f}s = "
          f"{floor/t_p:.2f}x   scorer overhead {t_s/t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
