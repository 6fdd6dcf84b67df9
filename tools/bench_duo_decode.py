"""E2e decode: Duo split-cache path vs dense masked decode on the chip.

VERDICT r2 item 5's win condition: exploit CONTIGUOUS per-head eviction
(Duo streaming heads) — the structure the retired paged kernel proved is
the only case where skipping evicted bytes can pay. Three arms per config:

  mask  — Duo keep-mask on the full buffer (reference-equivalent fake
          eviction: every streaming head still reads all S slots)
  split — ops/duo_decode.py DuoSplitCache (streaming heads read
          sink+recent only; retrieval heads unchanged; pure XLA)

MEASURED RESULT (round 3, real v5e): split == mask e2e (1.02x/0.97x at
b1/b4, slopes 1.10 vs 1.13 us/slot in probe_duo_slope.py) even though the
split buffers hold half the bytes and the op-level costs ARE
byte-proportional (probe_duo_micro.py: dus+attn at S=32K is ~1.1ms for
H=8 vs ~0.35ms for H=4 after subtracting ~1.1ms dispatch). Explanation:
the per-layer decode cost tracks the LONGEST per-head S-walk, not total
bytes — retrieval heads still walk full S in both arms. The split cache's
real win is CAPACITY: ~49% of cache HBM freed at head_ratio 0.5 (longer
contexts / more serving slots), with step latency unchanged. See
CLAUDE.md "Duo split decode".

Usage: python tools/bench_duo_decode.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import Runner, init_params
from kvpress_tpu.cache import grow
from kvpress_tpu.ops.duo_decode import build_duo_split, duo_decode_step
from kvpress_tpu.presses.duo import DuoAttentionPress

from __graft_entry__ import flagship_config

CTX = 32768
DECODE_STEPS = 64
SINK, RECENT = 128, 256


def main():
    cfg = flagship_config(num_layers=16)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = Runner.create(cfg)
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("press",))
    def prefill(params, ids, press):
        _, cache, _ = runner.prefill(params, ids, press=press)
        return cache

    @jax.jit
    def step_mask(params, tok, cache):
        logits, cache, _ = runner.forward(
            params, tok, cache, logits_last_only=True
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def run(batch, head_ratio):
        # Per-layer balanced scores: Duo's budget is a global bottom-k, so
        # RANDOM scores make some layer keep ~all heads as retrieval and the
        # split retrieval buffer (sized to the max per-layer count) balloons
        # to ~the full cache — measured OOM at b4/32K alongside the dense
        # arm. Real Duo artifacts are roughly balanced per layer; rank-based
        # scores give exactly ratio*H streaming heads per layer.
        scores = np.stack([
            rng.permutation(cfg.num_kv_heads).astype(np.float32)
            for _ in range(cfg.num_layers)
        ]) / cfg.num_kv_heads
        press = DuoAttentionPress(
            head_compression_ratio=head_ratio, sink_size=SINK,
            recent_size=RECENT, head_scores=scores,
        )
        ids = jax.random.randint(
            jax.random.PRNGKey(1), (batch, CTX), 0, cfg.vocab_size
        )

        def time_arm(fn, carry):
            tok = ids[:, -1:]
            tok, carry = fn(tok, carry)
            jax.device_get(tok)                     # compile + warm
            t0 = time.perf_counter()
            for _ in range(DECODE_STEPS):
                tok, carry = fn(tok, carry)
            jax.device_get(tok)
            del carry
            return (time.perf_counter() - t0) / DECODE_STEPS * 1e3

        cache = prefill(params, ids, press)
        cache = grow(cache, DECODE_STEPS + 8)
        dt_mask = time_arm(
            lambda tok, c: step_mask(params, tok, c), cache)
        ds = build_duo_split(cache, press.streaming_mask(), SINK, RECENT,
                             room=DECODE_STEPS + 8)
        s_full = cache.keys.shape[3]
        del cache                   # dense cache + split buffers don't both fit
        dt_split = time_arm(
            lambda tok, d: duo_decode_step(params, tok, d, runner=runner)[::2],
            ds)
        print(f"b{batch} head_ratio {head_ratio:4.2f}: "
              f"mask {dt_mask:6.2f} ms/step  split {dt_split:6.2f} ms/step "
              f"({dt_mask / dt_split:4.2f}x)  "
              f"[stream buf {ds.keys_s.shape[3]} vs {s_full}]",
              flush=True)
        del ds

    for batch in (1, 4):
        for head_ratio in (0.5, 0.75):
            run(batch, head_ratio)


if __name__ == "__main__":
    main()
