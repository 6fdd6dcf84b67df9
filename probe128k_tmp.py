import jax, jax.numpy as jnp, time, functools
from kvpress_tpu import Runner, init_params, KnormPress
from kvpress_tpu.cache import shrink
from __graft_entry__ import flagship_config

for S, layers in [(65536, 16), (131072, 16)]:
    cfg = flagship_config(num_layers=layers)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)
    press = KnormPress(compression_ratio=0.5)
    @functools.partial(jax.jit, static_argnames=("press",))
    def prefill(params, ids, press=None):
        logits, cache, _ = runner.prefill(params, ids, press=press, compute_logits=True)
        return logits[0,-1,:4], cache
    try:
        t0=time.perf_counter()
        out, cache = prefill(params, ids, press=press)
        jax.device_get(out)
        t1=time.perf_counter()
        out, cache = prefill(params, ids, press=press)
        jax.device_get(out)
        t2=time.perf_counter()
        print(f"S={S} prefill+compress: compile {t1-t0:.0f}s, run {t2-t1:.1f}s = {S/(t2-t1):,.0f} tok/s, kept {int(cache.length[0])}", flush=True)
        cache = shrink(cache, S//2 + 64)
        @jax.jit
        def step(params, tok, cache):
            logits, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache
        tok = ids[:, -1:]
        tok, c = step(params, tok, cache); jax.device_get(tok)
        t0=time.perf_counter()
        for _ in range(16):
            tok, c = step(params, tok, c)
        jax.device_get(tok)
        dt=(time.perf_counter()-t0)/16
        print(f"S={S} decode ratio0.5: {1/dt:.1f} tok/s ({dt*1000:.1f} ms/tok)", flush=True)
    except Exception as e:
        print(f"S={S}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    del params
