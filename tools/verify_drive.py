"""End-to-end surface drive on the real TPU chip: exercises the public
pipeline API the way a user would — prefill+compress+answer with the newest
features (per-head compaction, int4 cache, bucketed prefill) plus edge-case
probes. Prints one line per step; exits nonzero on any failure."""

import pathlib
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

import jax
import jax.numpy as jnp

import kvpress_tpu as kp
from kvpress_tpu.pipeline import KVPressPipeline
from kvpress_tpu.presses import (
    AdaKVPress,
    ExpectedAttentionPress,
    KnormPress,
    ObservedAttentionPress,
    SnapKVPress,
)

from toy_tokenizer import ToyTokenizer  # noqa: E402


def main():
    print(f"devices: {jax.devices()}")
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = kp.Runner.create(cfg)
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctx = " ".join(f"w{i % 97}" for i in range(300))

    t0 = time.perf_counter()
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=8,
               press=KnormPress(0.5))
    print(f"step1 knorm: answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")
    assert isinstance(out["answer"], str) and out["answer"]

    t0 = time.perf_counter()
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=8,
               press=AdaKVPress(press=ExpectedAttentionPress(0.5), compact=True))
    print(f"step2 adakv-compact: answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=8,
               press=SnapKVPress(0.5), quantized=True, kv_bits=4)
    print(f"step3 snapkv-int4: answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=8,
               press=KnormPress(0.5), context_bucket=512)
    print(f"step4 bucketed(512): answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=8,
               press=AdaKVPress(press=ObservedAttentionPress(0.5)))
    print(f"step5 adakv-observed (chunked colsums): answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    # probes
    out = pipe(ctx, question="", max_new_tokens=4, press=KnormPress(0.5))
    print(f"probe empty-question: answer={out['answer']!r}")
    assert isinstance(out["answer"], str)

    out = pipe(ctx, question="a ?", max_new_tokens=4, press=KnormPress(0.0))
    print(f"probe ratio=0: answer={out['answer']!r}")

    try:
        pipe(ctx, question="a ?", press=KnormPress(1.5))
        print("probe ratio=1.5: NO ERROR (unexpected)")
    except Exception as e:
        print(f"probe ratio=1.5: raised {type(e).__name__}: {e}")

    # multi-question reuse of one compressed cache (compress-once contract)
    outs = [pipe(ctx, question=q, max_new_tokens=4, press=KnormPress(0.5))
            for q in ("what is w1 ?", "what is w2 ?")]
    print(f"probe multi-question: {[o['answer'] for o in outs]}")

    # decode-time compression over the int4 payload cache (dequant only on
    # interval hits, payload-width gather — decode_compress_quantized)
    from kvpress_tpu.presses import DecodingPress

    t0 = time.perf_counter()
    dpress = DecodingPress(base_press=KnormPress(), compression_interval=8,
                           target_size=128, hidden_states_buffer_size=8)
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=24, press=dpress,
               quantized=True, kv_bits=4)
    print(f"step6 decoding-press-int4: answer={out['answer'][:40]!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    # pressless long generation (resize-grow regression surface)
    out = pipe(ctx, question="what is w3 ?", max_new_tokens=16)
    print(f"probe pressless-generate: answer={out['answer'][:40]!r}")

    # continuous batching with a per-slot decoding press
    t0 = time.perf_counter()
    answers = pipe.batch(
        [ctx, ctx[: len(ctx) // 2]], questions=["what is w1 ?", "what is w2 ?"],
        press=dpress, max_new_tokens=8, n_slots=2,
    )
    print(f"step7 serving+decode-press: {len(answers)} answers "
          f"({time.perf_counter() - t0:.1f}s)")

    # Gemma3-style sliding-window model end to end with a press
    t0 = time.perf_counter()
    scfg = kp.tiny_config(num_layers=4, sliding_window=64,
                          rope_local_base_freq=10000.0,
                          layer_is_sliding=tuple(i % 2 == 0 for i in range(4)))
    sparams = kp.init_params(scfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    spipe = KVPressPipeline(kp.Runner.create(scfg), sparams,
                            ToyTokenizer(scfg.vocab_size))
    out = spipe(ctx, question="what is w3 ?", max_new_tokens=8,
                press=KnormPress(0.5))
    print(f"step8 sliding-window+press: answer={out['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    # chunked prefill (bounded activations): answers equal one-shot
    t0 = time.perf_counter()
    spress = SnapKVPress(compression_ratio=0.5, window_size=8)
    a1 = pipe(ctx, question="what is w4 ?", press=spress, max_new_tokens=6)
    a2 = pipe(ctx, question="what is w4 ?", press=spress, max_new_tokens=6,
              context_chunk=64)
    assert a1["answer"] == a2["answer"], (a1, a2)
    print(f"step9 chunked-prefill: answer={a2['answer']!r} "
          f"({time.perf_counter() - t0:.1f}s)")

    # serving: compressed-context reuse + nucleus sampling through batch()
    t0 = time.perf_counter()
    qs = ["what is w1 ?", "what is w2 ?", "what is w3 ?"]
    plain = pipe.batch([ctx] * 3, questions=qs, press=KnormPress(0.5),
                       max_new_tokens=6, n_slots=2)
    reuse = pipe.batch([ctx] * 3, questions=qs, press=KnormPress(0.5),
                       max_new_tokens=6, n_slots=2, context_cache=1)
    assert plain == reuse, (plain, reuse)
    s1 = pipe.batch([ctx] * 2, questions=qs[:2], press=KnormPress(0.5),
                    max_new_tokens=6, n_slots=2, do_sample=True,
                    temperature=1.5, top_p=0.9, seed=3)
    s2 = pipe.batch([ctx] * 2, questions=qs[:2], press=KnormPress(0.5),
                    max_new_tokens=6, n_slots=2, do_sample=True,
                    temperature=1.5, top_p=0.9, seed=3)
    assert s1 == s2, (s1, s2)
    print(f"step10 serving reuse+sampling: reuse answers match greedy, "
          f"sampled reproducible ({time.perf_counter() - t0:.1f}s)")
    print("DRIVE OK")


if __name__ == "__main__":
    main()
