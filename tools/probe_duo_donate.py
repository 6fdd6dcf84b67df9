"""Probe: does buffer donation flip the Duo split-decode economics?

bench_duo_decode measured split ~= mask at 32K (both ~37 ms/step at b4)
even though the split buffers hold half the bytes. Hypothesis: the
non-donated append copy (read+write the full buffer every step) dominates
both arms, and CLAUDE.md's "donation is slower on axon" was measured at
COMPRESSED (16K) buffer sizes where the copy tax is small. Four arms at
b1+b4 / 32K / head_ratio 0.5: mask, mask+donate, split, split+donate.
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

    def step_fn(params, tok, cache):
        logits, cache, _ = runner.forward(params, tok, cache,
                                          logits_last_only=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    step_mask = jax.jit(step_fn)
    step_mask_don = jax.jit(step_fn, donate_argnums=(2,))
    split_fn = duo_decode_step._fun if hasattr(duo_decode_step, "_fun") else None
    # duo_decode_step is already jitted; build a donated twin from its wrapped fn
    from kvpress_tpu.ops import duo_decode as dd
    step_split = dd.duo_decode_step
    step_split_don = jax.jit(
        step_split.__wrapped__, static_argnames=("runner",),
        donate_argnums=(2,))

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
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        del carry
        return dt

    for batch in (1, 4):
        press = DuoAttentionPress(head_compression_ratio=0.5, sink_size=SINK,
                                  recent_size=RECENT, head_scores=scores)
        ids = jax.random.randint(jax.random.PRNGKey(1), (batch, CTX), 0,
                                 cfg.vocab_size)
        cache = prefill(params, ids, press)
        cache = grow(cache, STEPS + 8)
        dm = time_arm(lambda t, c: step_mask(params, t, c), cache, ids)
        ds = build_duo_split(cache, press.streaming_mask(), SINK, RECENT,
                             room=STEPS + 8)
        # len_r/offset can alias cache.length/offset (no-op astype); the
        # donated mask arm would delete them out from under ds
        import dataclasses
        ds = dataclasses.replace(ds, len_r=ds.len_r + 0, offset=ds.offset + 0)
        # donated arms go LAST per buffer: the first donated call consumes it
        dmd = time_arm(lambda t, c: step_mask_don(params, t, c), cache, ids)
        del cache
        dsx = time_arm(
            lambda t, d: step_split(params, t, d, runner=runner)[::2], ds, ids)
        dsd = time_arm(
            lambda t, d: step_split_don(params, t, d, runner=runner)[::2],
            ds, ids)
        del ds
        print(f"b{batch}: mask {dm:6.2f}  mask+don {dmd:6.2f}  "
              f"split {dsx:6.2f}  split+don {dsd:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
