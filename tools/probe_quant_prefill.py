import sys, time, functools
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

# NOTE: after the round-3 heuristic, the ONE-SHOT pressless int4 path is
# dense-dequant (use_quant_flash is int8-only) — the "int4" arm measures the
# dense path. The fused int4 kernel (measured ~30% slower, the reason for
# the heuristic) only runs on memory-bound chunked shapes; to re-measure it,
# call prefill_chunked(..., fused_kv=True) on an 8B-class config.
for ctx in (32768, 131072):
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, ctx), 0, cfg.vocab_size)
    for label, kw in (("bf16", {}), ("int8-fused", dict(quantized=True, kv_bits=8)),
                      ("int4-dense", dict(quantized=True, kv_bits=4))):
        c = prefill(params, ids, **kw); jax.device_get(jnp.max(c.length)); del c
        t0 = time.perf_counter()
        c = prefill(params, ids, **kw); jax.device_get(jnp.max(c.length))
        dt = time.perf_counter() - t0
        print(f"ctx={ctx//1024:4d}K {label:10s}: {dt:6.2f}s ({ctx/dt:7.0f} tok/s)", flush=True)
        del c
