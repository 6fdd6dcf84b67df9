"""Marginal-cost probe: mask vs Duo-split decode step time vs context length.

Per-call times on axon carry ~1ms dispatch + fixed per-layer overhead
(CLAUDE.md "measure marginal time, not per-call time"). Sweep S at b4 and
read the slope: if the split arm's slope is ~half the mask arm's, the byte
model holds and the flat 32K result means decode is overhead-bound; if the
slopes are equal, the split path is structurally reading full buffers.
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

STEPS = 32
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
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    scores = np.stack([rng.permutation(cfg.num_kv_heads).astype(np.float32)
                       for _ in range(cfg.num_layers)]) / cfg.num_kv_heads

    def time_arm(fn, carry, ids):
        tok = ids[:, -1:]
        tok, carry = fn(tok, carry)
        jax.device_get(tok)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            tok, carry = fn(tok, carry)
        jax.device_get(tok)
        del carry
        return (time.perf_counter() - t0) / STEPS * 1e3

    rows = []
    for ctx in (4096, 8192, 16384, 32768):
        press = DuoAttentionPress(head_compression_ratio=0.5, sink_size=SINK,
                                  recent_size=RECENT, head_scores=scores)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, ctx), 0,
                                 cfg.vocab_size)
        cache = prefill(params, ids, press)
        cache = grow(cache, STEPS + 8)
        dm = time_arm(lambda t, c: step_mask(params, t, c), cache, ids)
        ds = build_duo_split(cache, press.streaming_mask(), SINK, RECENT,
                             room=STEPS + 8)
        del cache
        dsx = time_arm(
            lambda t, d: duo_decode_step(params, t, d, runner=runner)[::2],
            ds, ids)
        del ds
        rows.append((ctx, dm, dsx))
        print(f"S={ctx:6d}: mask {dm:6.2f}  split {dsx:6.2f} ms/step",
              flush=True)

    (s0, m0, p0), (s1, m1, p1) = rows[0], rows[-1]
    print(f"slope mask  {(m1 - m0) / (s1 - s0) * 1e3:.3f} us/slot  "
          f"split {(p1 - p0) / (s1 - s0) * 1e3:.3f} us/slot")


if __name__ == "__main__":
    main()
