"""North-star measurement (BASELINE.md:17): Llama-3.1-8B-class model on one
v5e chip — prefill+compress and decode at the longest contexts that fit.

Architecture = Llama-3.1-8B's body exactly (32L, E=4096, F=14336, GQA 32/8,
D=128, rope 500k) with the vocab trimmed 128256→32768 (embed+head are a
memory concession, not a compute-path change; 7.25B params ≈ 8B-class).
Reference protocol: notebooks/speed_and_memory.ipynb (A100-80GB, Llama-3.1-8B,
prefill time + generation time + cache bytes, KnormPress sweep).

16 GB HBM sizing (measured, round 3):
- bf16 weights (14.5 GB) cannot serve ANY long context on one chip — int8
  weights (7.25 GB, the reference's FP8-model analogue) are the baseline.
- non-donated decode steps COPY the cache every step (input buffers are
  caller-owned), so paired-baseline residency = weights + 2×bf16 cache:
  tops out near 24K. A donated step halves that (measure both — donation
  serialized dispatch on the 1B model, CLAUDE.md, but the tradeoff is
  model-size dependent).
- beyond the paired limit, contexts are measured compressed-only: on this
  chip compression *enables* them, there is nothing to compare against.

Usage: python tools/bench_8b.py [--ctx 16384 24576] [--steps 64] [--reps 3]

Measured (round 3, one leg per process — OOM legs fragment the heap):
  int8 weights: 16K paired 55.2 -> 80.6 tok/s (1.46x);
  chunked (prefill tok/s / decode tok/s): 32K 3,980/71.4; 64K 2,513/59.2;
  128K 1,440/43.6 — the BASELINE.md:17 north star on a single 16 GB chip.
Round 4 (--press adakv_snapkv, head-wise wrapper through the chunked
path): 64K 3,044 tok/s prefill+compress / 58.6 tok/s decode;
  128K 1,804 / 41.6 (kv 2.10 GiB) — within a few % of plain Knorm.
  Full vocab (--vocab 128256 --int8-embeddings): b1/16K 52.6 -> 75.4
  (1.43x). KV-bound point (--wbits 4, b2/16K): 35.1 -> 97.8 (2.79x).
"""

import argparse
import functools
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner
from kvpress_tpu.cache import resize
from kvpress_tpu.config import ModelConfig
from kvpress_tpu.models.llama import init_params_int8


def llama31_8b_config(vocab_size: int = 32768) -> ModelConfig:
    """Llama-3.1-8B body (vocab trimmed to fit embed+head on 16 GB)."""
    return ModelConfig(
        vocab_size=vocab_size,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=500000.0,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, nargs="*", default=[16384, 24576])
    ap.add_argument("--ctx-compressed-only", type=int, nargs="*",
                    default=[32768, 65536, 131072])
    # OOM legs fragment the allocator and poison later legs in the same
    # process (measured: 32K-chunked passes fresh, fails after a failed
    # 32K-paired leg) — run one leg per process for clean measurements.
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ratio", type=float, default=0.5)
    ap.add_argument("--donate", action="store_true",
                    help="also time a cache-donating decode step")
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8),
                    help="weight quantization width (int4 = 3.6 GB weights,"
                         " opens paired-baseline contexts ≥32K)")
    ap.add_argument("--chunk", type=int, default=8192,
                    help="chunked-prefill chunk size for the compressed-only"
                         " legs (bounded activations; 0 = exact prefill)")
    ap.add_argument("--vocab", type=int, default=32768,
                    help="vocab size (128256 = true Llama-3.1-8B shape; "
                         "pair with --int8-embeddings to fit 16 GB)")
    ap.add_argument("--int8-embeddings", action="store_true",
                    help="int8 embed + lm_head (evaluate.py int8_embeddings"
                         " counterpart; required for --vocab 128256)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--press", default="knorm",
                    choices=("knorm", "adakv_snapkv", "duo", "dms_knorm",
                             "dms_knorm_compact", "kvcompose"),
                    help="compression press for the compressed legs: "
                         "adakv_snapkv = AdaKV(SnapKV) head-wise wrapper; "
                         "duo = DuoAttention streaming-head masks; "
                         "dms_knorm = DMS threshold eviction (threshold "
                         "auto-calibrated to evict ~ratio of tokens); "
                         "kvcompose = KVCompose chunked re-feed (structured "
                         "rebuild; needs quantized KV at 64K+ — the scoring "
                         "pass holds ~2x context KV, reference "
                         "kvcompose_press.py:377-379)")
    args = ap.parse_args()

    cfg = llama31_8b_config(vocab_size=args.vocab)
    runner = Runner.create(cfg)
    t0 = time.perf_counter()
    params = init_params_int8(cfg, jax.random.PRNGKey(0), bits=args.wbits,
                              int8_embeddings=args.int8_embeddings)
    jax.block_until_ready(params["layers"]["wd"])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"init int8 params: {n_params/1e9:.2f}B in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

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

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step_donated(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def time_decode(step_fn, tok, cache, sync_every=None):
        """``sync_every``: periodic token fetch to bound the dispatch
        queue's live buffers — every ENQUEUED non-donated step allocates a
        full cache output buffer, so letting the host run 16+ steps ahead
        of a b2/16K bf16 cache (4.4 GiB each) OOMs HBM from the queue
        alone. The barrier keeps the device busy (work stays queued ahead
        of it), so throughput is unaffected beyond the ~25 ms tunnel
        round-trip per sync."""
        tok, cache = step_fn(params, tok, cache)         # compile + warm
        jax.device_get(tok)
        rates = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.steps):
                tok, cache = step_fn(params, tok, cache)
                if sync_every and (i + 1) % sync_every == 0:
                    jax.device_get(tok)
            jax.device_get(tok)
            rates.append(args.steps / (time.perf_counter() - t0))
        return statistics.median(rates), rates, cache

    def run(ctx, press, quantized=False, kv_bits=8, label="", chunked=False):
        decode_room = (args.reps + 1) * args.steps + 8
        if press is None:
            keep = ctx
        elif hasattr(press, "n_kept"):
            keep = press.n_kept(ctx)
        else:         # wrapper presses (AdaKV): budget = (1-ratio)*ctx
            keep = max(1, int(ctx * (1 - press.compression_ratio)))
        room = keep + decode_room
        ids = jax.random.randint(jax.random.PRNGKey(1), (args.batch, ctx), 0,
                                 cfg.vocab_size)
        kw = dict(press=press, quantized=quantized, kv_bits=kv_bits,
                  # baseline: preallocate decode room — a later grow would
                  # transiently double the bf16 cache. compressed: prefill
                  # at ctx (compression needs all slots), shrink after (the
                  # int4 copy is small and the smaller buffer IS the win).
                  max_size=room if press is None else None)

        mp = getattr(press, "multi_pass", None) if press is not None else None

        def do_prefill():
            if mp == "kvcompose":
                # KVCompose: pressless chunked prefill presized for the
                # re-feed (2x ctx — the reference's own scoring-pass
                # overhead), then the chunked re-feed + structured rebuild
                from kvpress_tpu.pipeline import KVPressPipeline

                _, cache, _ = runner.prefill_chunked(
                    params, ids, press=None, chunk_size=args.chunk,
                    quantized=quantized, kv_bits=kv_bits, max_size=2 * ctx,
                )
                pipe = KVPressPipeline(runner, params, tokenizer=None)
                ids_host = [int(t) for t in jax.device_get(ids[0])]
                return pipe._run_kvcompose(cache, ids_host, press,
                                           context_chunk=args.chunk)
            if chunked:
                # bounded activations: the exact prefill's (S, F=14336) MLP
                # intermediate (and, pressless, the layer scan's xs+ys
                # double cache copy) OOMs 16 GB at 8B/64K+ (b2/16K for the
                # baseline); the lean chunk path has neither
                _, cache, _ = runner.prefill_chunked(
                    params, ids, press=press, chunk_size=args.chunk,
                    quantized=quantized, kv_bits=kv_bits,
                    max_size=room if press is None else None,
                )
            else:
                cache = prefill(params, ids, **kw)
            if (press is not None
                    and getattr(press, "host_compact", False)
                    and getattr(press, "compresses_prefill", False)):
                # in-prefill mask presses (DMS compact): physical head-wise
                # compaction (the pipeline does this automatically;
                # multi-pass presses compact after their repeat passes,
                # which bench_8b does not run)
                from kvpress_tpu.cache import compact_masked

                cache = compact_masked(cache)
            return cache

        cache = do_prefill()
        # block_until_ready returns early on the axon backend (CLAUDE.md);
        # device_get of a dependent scalar forces completion.
        jax.device_get(jnp.max(cache.length))
        del cache                      # never hold two caches across reruns
        tp0 = time.perf_counter()
        cache = do_prefill()
        jax.device_get(jnp.max(cache.length))
        t_pre = time.perf_counter() - tp0
        if press is not None:
            # Size the shrink from the MEASURED post-compression length (the
            # pipeline does the same): AdaKV's global heads×seq budget with
            # alpha_safeguard lets a score-favored head keep well past the
            # uniform (1-ratio)*ctx estimate — shrinking to that estimate
            # would truncate live entries and corrupt the decode appends.
            used = int(jax.device_get(jnp.max(cache.length)))
            room = min(ctx + decode_room,
                       -(-(used + decode_room) // 256) * 256)
            # resize, not shrink: mask-only presses (Duo/DMS) keep the full
            # length, so the buffer must GROW for decode appends
            cache = resize(cache, room)
        kv_bytes = cache.keys.size * cache.keys.dtype.itemsize * 2
        tok = ids[:, -1:]
        # Non-donated decode needs TWO cache-sized buffers resident (input
        # + output) plus whatever the dispatch queue holds — at b2/16K bf16
        # (4.4 GiB/cache) that cannot fit next to the weights at all
        # (measured RESOURCE_EXHAUSTED even with per-4-step syncs). Each
        # arm therefore runs its best FEASIBLE mode: donated steps (single
        # cache residency) when the cache alone exceeds ~3 GiB, the faster
        # non-donated steps otherwise. The axon donation penalty is real
        # (CLAUDE.md) — this measures what each arm can actually do.
        donate_this = kv_bytes > (3 << 30)
        sync_every = 4 if donate_this else None
        med, rates, cache = time_decode(
            step_donated if donate_this else step, tok, cache,
            sync_every=sync_every)
        if donate_this:
            label += " (donated)"
        med *= args.batch
        print(f"{label:26s} ctx={ctx//1024:4d}K b={args.batch} "
              f"prefill {t_pre:6.2f}s "
              f"({args.batch * ctx / t_pre:7.0f} tok/s) decode med "
              f"{med:6.1f} tok/s "
              f"(reps {['%.1f' % (args.batch * r) for r in rates]}) "
              f"kv {kv_bytes/2**30:.2f} GiB", flush=True)
        if args.donate:
            medd, ratesd, cache = time_decode(step_donated, tok, cache,
                                              sync_every=sync_every)
            medd *= args.batch
            print(f"{'':26s}   donated decode med {medd:6.1f} tok/s "
                  f"(reps {['%.1f' % (args.batch * r) for r in ratesd]})",
                  flush=True)
            med = max(med, medd)
        del cache
        return med, t_pre

    if args.press == "adakv_snapkv":
        from kvpress_tpu import SnapKVPress
        from kvpress_tpu.presses import AdaKVPress

        press = AdaKVPress(
            press=SnapKVPress(compression_ratio=args.ratio, window_size=64),
            compact=True,
        )
    elif args.press == "duo":
        import numpy as _np

        from kvpress_tpu.presses import DuoAttentionPress

        press = DuoAttentionPress(
            head_compression_ratio=args.ratio, sink_size=128,
            recent_size=256,
            head_scores=_np.random.default_rng(0).random(
                (cfg.num_layers, cfg.num_kv_heads)).astype(_np.float32),
        )
    elif args.press.startswith("dms_knorm"):
        import numpy as _np

        from kvpress_tpu.presses import DMSPress

        # calibrate the threshold so ~ratio of tokens fall below it: probe
        # key norms on a short pressless prefill (scores are -||k||)
        probe_ids = jax.random.randint(jax.random.PRNGKey(2), (1, 4096), 0,
                                       cfg.vocab_size)
        _, probe_cache, _ = runner.prefill_chunked(
            params, probe_ids, chunk_size=4096, quantized=True, kv_bits=8)
        from kvpress_tpu.cache import dequantize_kv as _dq

        norms = -_np.linalg.norm(_np.asarray(jax.device_get(_dq(
            probe_cache.keys[:, :, :, :4096], probe_cache.key_scales[:, :, :, :4096],
            8, jnp.float32))), axis=-1)
        thr = float(_np.percentile(norms, 100 * args.ratio))
        del probe_cache
        print(f"dms threshold (p{100*args.ratio:.0f} of -||k||): {thr:.3f}",
              flush=True)
        press = DMSPress(press=KnormPress(), threshold=thr,
                         sliding_window_size=1024,
                         compact=args.press.endswith("compact"))
    elif args.press == "kvcompose":
        from kvpress_tpu.presses import KVComposePress

        press = KVComposePress(compression_ratio=args.ratio)
    else:
        press = KnormPress(compression_ratio=args.ratio)
    results = {}
    for ctx in args.ctx:
        # paired legs: the lean chunked prefill for BOTH arms once batch*ctx
        # is large enough that the one-shot scan's xs+ys double-cache copy
        # OOMs (measured: b2/16K baseline OOMs one-shot, fits chunked) —
        # decided PER LEG (a small first ctx must not force later larger
        # contexts onto the one-shot path, whose OOM would also fragment
        # the allocator for the remaining legs)
        paired_chunked = args.chunk > 0 and args.batch * ctx > 16384
        base = comp = None
        try:
            base, _ = run(ctx, None, label="baseline bf16-KV",
                          chunked=paired_chunked)
        except Exception as e:
            import traceback; traceback.print_exc()
            print(f"baseline ctx={ctx}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
        try:
            comp, _ = run(ctx, press, quantized=True, kv_bits=4,
                          chunked=paired_chunked,
                          label=f"{args.press}{args.ratio}+int4KV")
        except Exception as e:
            print(f"compressed ctx={ctx}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
        if base and comp:
            results[ctx] = (base, comp, comp / base)
            print(f"  => ctx={ctx//1024}K speedup {comp/base:.2f}x", flush=True)

    for ctx in args.ctx_compressed_only:
        try:
            run(ctx, press, quantized=True, kv_bits=4,
                chunked=args.chunk > 0,
                label=f"{args.press}{args.ratio}+int4KV (chunked)")
        except Exception as e:
            print(f"compressed-only ctx={ctx}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)

    print(json.dumps({"results": {
        str(k): {"base": round(b, 1), "comp": round(c, 1),
                 "speedup": round(s, 3)}
        for k, (b, c, s) in results.items()
    }}))


if __name__ == "__main__":
    main()
