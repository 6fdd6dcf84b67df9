"""Long-context composition: wrapper / multi-pass presses through CHUNKED
prefill, and serving at fixed HBM.

The chunked path (``context_chunk=``) is what fits 8B-class 64K-128K
contexts on a single 16 GB chip (bounded activations: the context streams
through one compiled chunk program). This demo shows that the presses that
top the reference leaderboard compose with it:

- AdaKV(SnapKV) — head-wise budgets + per-head compaction
- KeyRerotation(Knorm) — kept keys rerotated to contiguous positions
- ComposedPress(ThinK, Knorm) — chained stages
- KVzip — multi-pass context-reconstruction scoring over the
  chunk-prefilled cache (natively chunked, like the reference)

and that the batch surface serves them (`pipe.batch(context_chunk=...)`).

Run: JAX_PLATFORMS=cpu python examples/long_context_composition.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, SnapKVPress, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from kvpress_tpu.presses import (
    AdaKVPress,
    ComposedPress,
    DMSPress,
    DuoAttentionPress,
    KeyRerotationPress,
    KVComposePress,
    KVzipPress,
    ThinKPress,
)
from toy_tokenizer import ToyTokenizer


def main():
    import numpy as np

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params,
                           ToyTokenizer(cfg.vocab_size))
    context = " ".join(f"tok{i}" for i in range(120))
    question = "what is tok3 ?"

    presses = {
        "adakv(snapkv) compact": AdaKVPress(
            press=SnapKVPress(0.5, window_size=8, kernel_size=3),
            compact=True,
        ),
        "key-rerotation(knorm)": KeyRerotationPress(press=KnormPress(0.5)),
        "composed(think, knorm)": ComposedPress(presses=(
            ThinKPress(key_channel_compression_ratio=0.5, window_size=8),
            KnormPress(0.5),
        )),
        "kvzip (multi-pass)": KVzipPress(compression_ratio=0.5,
                                         chunk_size=32),
        # round 5: the last structural presses through the chunked path
        "kvcompose (re-feed)": KVComposePress(compression_ratio=0.5),
        "dms(knorm) compact": DMSPress(press=KnormPress(), threshold=-6.0,
                                       sliding_window_size=16, compact=True),
        "duo-attention": DuoAttentionPress(
            head_compression_ratio=0.5, sink_size=4, recent_size=8,
            head_scores=np.random.default_rng(0).random(
                (cfg.num_layers, cfg.num_kv_heads)),
        ),
    }
    for name, press in presses.items():
        exact = pipe(context, question=question, press=press,
                     max_new_tokens=6)
        chunked = pipe(context, question=question, press=press,
                       max_new_tokens=6, context_chunk=32)
        match = "==" if exact["answer"] == chunked["answer"] else "!="
        print(f"{name:24s} one-shot {match} chunked  "
              f"({chunked['answer'][:40]!r})")

    # The same composition through the continuous-batching engine: chunked
    # admission + int4 KV, several requests sharing the slot pool.
    answers = pipe.batch(
        [context, context[: len(context) // 2]],
        questions=[question, "what is tok5 ?"],
        press=presses["adakv(snapkv) compact"],
        max_new_tokens=6, n_slots=2, context_chunk=32,
        quantized=True, kv_bits=4,
    )
    print("served (chunked admission, int4 KV):", answers)


if __name__ == "__main__":
    main()
