"""Serve a long context from a device mesh end to end: sequence-sharded
prefill with shard-local compression, then decode with the split-KV combine —
the compressed KV cache never leaves its shards.

Run on any mesh-shaped set of devices; for a CPU demo:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
      examples/distributed_serving.py
"""

import os
import sys
import pathlib

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# Demo default: an 8-device virtual CPU mesh (some site configs ignore the
# JAX_PLATFORMS env var). On a real multi-chip TPU host, delete this line.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import kvpress_tpu as kp
from kvpress_tpu.parallel.decode import context_parallel_generate
from kvpress_tpu.presses import SnapKVPress


def main():
    devices = jax.devices()
    mesh = Mesh(np.array(devices), axis_names=("seq",))
    print(f"mesh: {len(devices)} devices over the sequence axis")

    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    S = 64 * len(devices)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)

    out = context_parallel_generate(
        params, ids, runner=runner, mesh=mesh,
        press=SnapKVPress(compression_ratio=0.5, window_size=8, kernel_size=3),
        max_new_tokens=16,
    )
    print(f"context: {S} tokens sharded {len(devices)}-way, "
          f"compressed 2x shard-locally")
    print(f"generated ids: {np.asarray(out)[0].tolist()}")

    # Production shape: int4 payload shards (payload-width HBM reads on
    # every shard) + the whole token loop fused into ONE dispatch.
    out_q = context_parallel_generate(
        params, ids, runner=runner, mesh=mesh,
        press=SnapKVPress(compression_ratio=0.5, window_size=8, kernel_size=3),
        max_new_tokens=16, quantized=True, kv_bits=4, fused=True,
    )
    print(f"int4 shards + fused loop: {np.asarray(out_q)[0].tolist()}")


if __name__ == "__main__":
    main()
