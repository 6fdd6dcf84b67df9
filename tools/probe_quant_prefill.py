import pathlib, sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from kvpress_tpu import Runner, init_params
from __graft_entry__ import flagship_config

cfg = flagship_config(num_layers=16)
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
runner = Runner.create(cfg)

@functools.partial(jax.jit, static_argnames=("quantized", "kv_bits"))
def prefill(params, ids, quantized=False, kv_bits=8):
    _, cache, _ = runner.prefill(params, ids, quantized=quantized, kv_bits=kv_bits)
    return cache

for ctx in (32768, 131072):
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, ctx), 0, cfg.vocab_size)
    for label, kw in (("bf16", {}), ("int8-fused", dict(quantized=True, kv_bits=8)),
                      ("int4-fused", dict(quantized=True, kv_bits=4))):
        c = prefill(params, ids, **kw); jax.device_get(jnp.max(c.length)); del c
        t0 = time.perf_counter()
        c = prefill(params, ids, **kw); jax.device_get(jnp.max(c.length))
        dt = time.perf_counter() - t0
        print(f"ctx={ctx//1024:4d}K {label:10s}: {dt:6.2f}s ({ctx/dt:7.0f} tok/s)", flush=True)
        del c
