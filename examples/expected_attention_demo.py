"""ExpectedAttention walkthrough (the reference's
notebooks/expected_attention.ipynb, TPU-style).

ExpectedAttention scores keys by the attention that FUTURE queries are
expected to pay them: it models upcoming queries as Gaussian
(mean/covariance collected from the prefill hidden states), rotates the
statistics forward with RoPE, and takes E[softmax(qK^T)] under that
distribution. No observation window, no probs needed.

Run: JAX_PLATFORMS=cpu python examples/expected_attention_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import Runner, init_params, tiny_config
from kvpress_tpu.presses import ExpectedAttentionPress


def main():
    cfg = tiny_config()
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 96), 0, cfg.vocab_size)

    for n_sink in (0, 4):
        press = ExpectedAttentionPress(
            compression_ratio=0.5,
            n_future_positions=256,
            n_sink=n_sink,            # always-keep attention sinks
            use_covariance=True,
            use_vnorm=True,
        )
        _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
        kept = np.asarray(cache.length)
        print(f"n_sink={n_sink}: kept {kept.tolist()} of 96 per layer")
        # the sink slots survive by construction: rebuilt caches put them first
        assert (kept == 48).all()


if __name__ == "__main__":
    main()
