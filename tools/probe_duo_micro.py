"""Isolate where the Duo split decode's expected byte savings vanish.

Chained single-layer-like jitted calls at b4/D64, S in {16K, 32K}:
  dus8/dus4   — dynamic_update_slice append on (B, H, S, D), H = 8 vs 4
  attn8/attn4 — gqa decode attention read on the same buffers
  both8/both4 — append + attention (the real per-layer KV work)
  split       — the duo pairing: both4 (retrieval) + tiny streaming both

If both4 is ~half of both8, the savings exist at the op level and the
duo_decode_step structure is eating them; if not, XLA is padding or
re-materializing something head-count-invariant.
"""

import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu.ops.attention import NEG_INF, gqa_attention

B, D, G = 4, 64, 4
STEPS = 32


@partial(jax.jit, static_argnames=())
def dus(k, v, knew, vnew, ln):
    k = jax.lax.dynamic_update_slice_in_dim(k, knew, ln, axis=2)
    v = jax.lax.dynamic_update_slice_in_dim(v, vnew, ln, axis=2)
    return k, v, ln + 1


@jax.jit
def attn(q, k, v, ln):
    slot = jnp.arange(k.shape[2], dtype=jnp.int32)
    bias = jnp.where(slot <= ln, 0.0, NEG_INF)[None, :]
    o, _ = gqa_attention(q, k, v, bias, D ** -0.5)
    return o, ln + 1


@jax.jit
def both(q, k, v, knew, vnew, ln):
    k = jax.lax.dynamic_update_slice_in_dim(k, knew, ln, axis=2)
    v = jax.lax.dynamic_update_slice_in_dim(v, vnew, ln, axis=2)
    slot = jnp.arange(k.shape[2], dtype=jnp.int32)
    bias = jnp.where(slot <= ln, 0.0, NEG_INF)[None, :]
    o, _ = gqa_attention(q, k, v, bias, D ** -0.5)
    return o, k, v, ln + 1


@jax.jit
def _probe(x):
    # touch every element so device_get cannot complete before the array does
    return jnp.sum(x.astype(jnp.float32))


def timeit(fn, *args, chain=None, big=0):
    state = chain(fn, args)          # compile + warm
    jax.device_get(_probe(state[big]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state = chain(fn, state)
    jax.device_get(_probe(state[big]))
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for S in (16384, 32768):
        for H in (8, 4):
            k = jax.random.normal(key, (B, H, S + 64, D), jnp.bfloat16)
            v = jnp.array(k)
            q = jax.random.normal(key, (B, H * G, 1, D), jnp.bfloat16)
            knew = jnp.ones((B, H, 1, D), jnp.bfloat16)
            ln = jnp.asarray(S, jnp.int32)

            t_dus = timeit(
                dus, k, v, knew, knew, ln,
                chain=lambda f, s: (lambda r: (r[0], r[1], knew, knew, r[2]))(
                    f(*s)),
            )
            t_attn = timeit(
                attn, q, k, v, ln, big=3,
                chain=lambda f, s: (lambda r: (q, k, v, r[1]))(f(*s)),
            )
            t_both = timeit(
                both, q, k, v, knew, knew, ln, big=1,
                chain=lambda f, s: (lambda r: (q, r[1], r[2], knew, knew,
                                               r[3]))(f(*s)),
            )
            gb = (2 * B * H * (S + 64) * D * 2) / 1e9
            print(f"S={S:6d} H={H}: dus {t_dus:6.2f}  attn {t_attn:6.2f}  "
                  f"both {t_both:6.2f} ms/call  (buf {gb:.2f} GB)",
                  flush=True)


if __name__ == "__main__":
    main()
