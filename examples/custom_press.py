"""Writing a new press (the reference's notebooks/new_press.ipynb, TPU-style).

A press is a frozen dataclass. For the common score-then-keep-top-k pattern,
subclass ScorerPress and implement ``score(ctx, keys, values) -> (B, H_kv, S)``
— higher scores survive. LayerCtx hands you everything the layer computed
(hidden states, pre/post-RoPE Q/K, positions, this layer's weights); anything
you don't touch is dead-code-eliminated by XLA, so there is no cost to the
rich context.

Run: JAX_PLATFORMS=cpu python examples/custom_press.py
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from kvpress_tpu import Runner, init_params, tiny_config
from kvpress_tpu.presses.base import LayerCtx, ScorerPress


@dataclasses.dataclass(frozen=True)
class ValueNormPress(ScorerPress):
    """Keep the tokens whose value vectors carry the most mass."""

    def score(self, ctx: LayerCtx, keys, values):
        return jnp.linalg.norm(values.astype(jnp.float32), axis=-1)


@dataclasses.dataclass(frozen=True)
class PositionDecayPress(ScorerPress):
    """Recency-weighted value norm: an example of using ctx.positions."""

    half_life: float = 1024.0

    def score(self, ctx: LayerCtx, keys, values):
        vnorm = jnp.linalg.norm(values.astype(jnp.float32), axis=-1)
        age = ctx.positions[:, None, :] - ctx.positions[:, None, :].min()
        decay = 0.5 ** (age.astype(jnp.float32) / self.half_life)
        return vnorm * decay


def main():
    jax.config.update("jax_platforms", "cpu")
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, cfg.vocab_size)

    for press in (ValueNormPress(0.5), PositionDecayPress(0.5, half_life=32)):
        _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
        print(f"{type(press).__name__}: 64 tokens -> kept {int(cache.length[0])}")

    # Presses compose with the stock wrappers:
    from kvpress_tpu.presses import AdaKVPress

    press = AdaKVPress(press=ValueNormPress(0.5))
    _, cache, _ = runner.prefill(params, ids, press=press, dtype=jnp.float32)
    from kvpress_tpu.cache import masked_fraction
    print(f"AdaKV(ValueNorm): head-wise masked fraction "
          f"{float(masked_fraction(cache)):.2f}")


if __name__ == "__main__":
    main()
