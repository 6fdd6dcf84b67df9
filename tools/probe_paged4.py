import jax, jax.numpy as jnp, time, sys
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from kvpress_tpu.ops.decode_attention import masked_decode_attention

B,Hq,Hkv,T,S,D = 1,32,8,1,32768,64
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0],(B,Hq,T,D),jnp.bfloat16)
k = jax.random.normal(ks[1],(B,Hkv,S,D),jnp.bfloat16)
v = jax.random.normal(ks[2],(B,Hkv,S,D),jnp.bfloat16)
length = jnp.asarray(S, jnp.int32)
mask = (jax.random.uniform(ks[3],(B,Hkv,S)) > 0.875).at[:,:,:4].set(True)

page = int(sys.argv[1])
f = jax.jit(lambda q,k,v,m,l: masked_decode_attention(q,k,v,m,l,sm_scale=D**-0.5,page_size=page))
t0=time.perf_counter()
got = f(q,k,v,mask,length); jax.device_get(got[0,0,0,:2])
print(f"page {page}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter()
x=q
for _ in range(30):
    x = f(x,k,v,mask,length)
jax.device_get(x[0,0,0,:2])
print(f"page {page}: {(time.perf_counter()-t0)/30*1e6:.0f} us/call", flush=True)
