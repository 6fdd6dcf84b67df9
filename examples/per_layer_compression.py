"""Per-layer compression ratios (the reference's
notebooks/per_layer_compression_demo.ipynb, TPU-style).

Two equivalent routes:
  1. PerLayerCompressionPress wraps any scorer press with a ratio per layer
     (the reference's experimental wrapper, per_layer_compression_press.py).
  2. PyramidKVPress builds the linear budget pyramid for you (shallow layers
     keep more, deep layers less).

Run: JAX_PLATFORMS=cpu python examples/per_layer_compression.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.presses import PerLayerCompressionPress, PyramidKVPress


def main():
    cfg = tiny_config(num_layers=4)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, cfg.vocab_size)

    # Route 1: explicit per-layer ratios over a Knorm scorer.
    press = PerLayerCompressionPress(
        press=KnormPress(compression_ratio=0.5),
        compression_ratios=(0.0, 0.25, 0.5, 0.75),
    )
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    print("per-layer lengths:", np.asarray(cache.length))   # 64 48 32 16

    # Route 2: PyramidKV's budget pyramid at the same global ratio.
    _, cache, _ = runner.prefill(
        params, ids, press=PyramidKVPress(compression_ratio=0.5, window_size=8),
        dtype=jnp.float32,
    )
    print("pyramid lengths:  ", np.asarray(cache.length))


if __name__ == "__main__":
    main()
