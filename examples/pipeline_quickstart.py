"""Pipeline end-to-end (the reference's notebooks/wikipedia_demo.ipynb,
offline-capable: a tiny random model + toy tokenizer stand in for the
hub download; swap in KVPressPipeline.from_pretrained(<repo>) with network).

Run: JAX_PLATFORMS=cpu python examples/pipeline_quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax
import jax.numpy as jnp

from kvpress_tpu import KnormPress, Runner, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer


def main():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))
    # with network: pipe = KVPressPipeline.from_pretrained("meta-llama/Llama-3.2-1B")

    context = " ".join(f"fact{i} detail{i}" for i in range(40))
    press = KnormPress(compression_ratio=0.5)

    # one context, several questions — compressed once, asked many times
    out = pipe(
        context,
        questions=["what is fact3 ?", "what is fact7 ?"],
        press=press,
        max_new_tokens=8,
    )
    for q, a in zip(["fact3", "fact7"], out["answers"]):
        print(f"{q}: {a!r}")

    # batched serving over many contexts (continuous batching underneath)
    answers = pipe.batch(
        [context, " ".join(f"item{i}" for i in range(32))],
        ["what is fact3 ?", "what is item5 ?"],
        press=press, max_new_tokens=8, n_slots=2,
    )
    print("batched:", [repr(a) for a in answers])


if __name__ == "__main__":
    main()
