"""Compression DURING generation (the reference's
notebooks/kvpress_decoding_aime25.ipynb, TPU-style).

Reasoning models generate thousands of tokens; decoding presses bound the
cache while generating instead of (or in addition to) at prefill:

  - DecodingPress: every ``compression_interval`` generated tokens, compress
    the cache back to ``target_size`` using any scorer press.
  - CompressionRatioDecodingPress: target = fraction of tokens seen so far.
  - PrefillDecodingPress: different presses for the prefill and decode phases.

Inside the jitted decode loop the press state (hidden-state ring buffer,
step counters) threads through the `lax.while_loop` carry — no hooks.

Run: JAX_PLATFORMS=cpu python examples/decoding_press_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from kvpress_tpu.presses import CompressionRatioDecodingPress, DecodingPress
from toy_tokenizer import ToyTokenizer


def main():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))
    context = " ".join(f"step{i}" for i in range(24))

    # compress to <=32 slots every 16 generated tokens, scored by key norm
    press = DecodingPress(
        base_press=KnormPress(),
        compression_interval=16,
        target_size=32,
        hidden_states_buffer_size=16,
    )
    out = pipe(context, question="solve the problem", press=press,
               max_new_tokens=48)
    print("DecodingPress answer:", repr(out["answer"][:60]))

    # ratio-targeted: cache tracks 50% of everything seen so far
    press = CompressionRatioDecodingPress(
        base_press=KnormPress(),
        compression_interval=16,
        target_compression_ratio=0.5,
        hidden_states_buffer_size=16,
    )
    out = pipe(context, question="solve the problem", press=press,
               max_new_tokens=48)
    print("ratio-decoding answer:", repr(out["answer"][:60]))

    # Decoding presses also run inside the continuous-batching serving
    # engine: every slot compresses independently (per-slot interval
    # counters), so long generations stay bounded under batch serving.
    import numpy as np

    from kvpress_tpu.serving import Request, ServingEngine

    tok = pipe.tokenizer
    rng = np.random.default_rng(0)
    reqs = [
        Request(rng.permutation(cfg.vocab_size)[:40].tolist(),
                tok.encode("solve the problem"), max_new_tokens=24)
        for _ in range(4)
    ]
    eng = ServingEngine(
        pipe.runner, params, n_slots=2, capacity=128, question_bucket=8,
        press=DecodingPress(base_press=KnormPress(), compression_interval=8,
                            target_size=32, hidden_states_buffer_size=8),
    )
    answers = eng.run(reqs)
    print("served answers:", [len(a) for a in answers],
          "max slot length:", int(np.asarray(eng.sc.lengths).max()))


if __name__ == "__main__":
    main()
