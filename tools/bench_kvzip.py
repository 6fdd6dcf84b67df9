"""KVzip multi-pass at scale on the real chip: what does query-agnostic
context-reconstruction scoring cost at 16K/32K on the 1B flagship?

The reference warns 2-3x prefill cost (kvzip_press.py:57-62). Here the
repeat passes are jitted chunk forwards orchestrated by the pipeline
(pipeline._run_kvzip); this measures plain prefill vs the full KVzip
compress (prefill + reconstruction passes + global bottom-k) and the decode
speed against the compressed cache.

Usage: python tools/bench_kvzip.py [ctx_tokens]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import KVzipPress, Runner, init_params
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer

from __graft_entry__ import flagship_config

CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 16384


def main():
    cfg = flagship_config(num_layers=16)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tok = ToyTokenizer(cfg.vocab_size)
    pipe = KVPressPipeline(runner, params, tok)

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in rng.integers(0, 30000, CTX - 8)]
    context = " ".join(words)
    question = "what is w3 ?"

    # plain prefill + answer (warm twice: first call compiles)
    for label, press in (
        ("no press    ", None),
        ("kvzip 0.5   ", KVzipPress(compression_ratio=0.5)),
    ):
        t = []
        for it in range(2):
            t0 = time.perf_counter()
            out = pipe(context, question=question, press=press,
                       max_new_tokens=8)
            t.append(time.perf_counter() - t0)
        n_ctx = len(tok.encode(context)) + 1
        print(f"{label} ctx {n_ctx}: compile+1st {t[0]:6.1f}s, "
              f"warm {t[1]:6.1f}s ({n_ctx / t[1]:7.0f} tok/s incl. answer)",
              flush=True)


if __name__ == "__main__":
    main()
