"""Artifact presses must hash/compare by CONTENT, not identity: presses are
static jit arguments, so two instances loaded from the same artifact file
must share ONE jit cache entry (one trace). id()-hashing silently recompiled
the full model per instance — minutes per compile at 32K (VERDICT r1/r2).

Reference parity note: reference presses are stateless torch hooks with no
jit-key role (kvpress/presses/base_press.py:44-99); the trap is TPU-specific
and must not regress.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kvpress_tpu import tiny_config
from kvpress_tpu.presses.duo import DuoAttentionPress, load_duo_head_scores
from kvpress_tpu.presses.expected_attention_stats import (
    ExpectedAttentionStatsPress,
    load_query_stats,
    save_query_stats,
)
from kvpress_tpu.presses.fastkvzip import (
    FastKVzipPress,
    init_random_gates,
    load_fastkvzip_gates,
    save_fastkvzip_gates,
)
from kvpress_tpu.presses.kvzap import (
    KVzapPress,
    load_kvzap_model,
    save_kvzap_model,
)
from kvpress_tpu.presses.lukv import LUKVPress, load_budget_curve
from kvpress_tpu.presses.qfilter import QFilterPress, load_q_filters
from kvpress_tpu.presses.restorekv import (
    RestoreKVPress,
    init_random_lora,
    load_restore_artifacts,
    save_restore_artifacts,
)
from kvpress_tpu.presses.knorm import KnormPress


def _press_pairs(tmp_path):
    """(same1, same2, different) triples, each loaded fresh from disk."""
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    L, H, D, E = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, cfg.hidden_size

    out = []

    # QFilter
    p = str(tmp_path / "qf.npz")
    np.savez(p, q_filters=rng.normal(size=(L, H, D)).astype(np.float32))
    p2 = str(tmp_path / "qf2.npz")
    np.savez(p2, q_filters=rng.normal(size=(L, H, D)).astype(np.float32))
    mk = lambda path: QFilterPress(compression_ratio=0.5,
                                   q_filters=load_q_filters(path))
    out.append(("qfilter", mk(p), mk(p), mk(p2)))

    # Duo
    p = str(tmp_path / "duo.npz")
    np.savez(p, sink_size=4, recent_size=8,
             head_scores=rng.random((L, H)).astype(np.float32))
    p2 = str(tmp_path / "duo2.npz")
    np.savez(p2, sink_size=4, recent_size=8,
             head_scores=rng.random((L, H)).astype(np.float32))

    def mk_duo(path):
        sink, recent, scores = load_duo_head_scores(path)
        return DuoAttentionPress(head_compression_ratio=0.5, sink_size=sink,
                                 recent_size=recent, head_scores=scores)

    out.append(("duo", mk_duo(p), mk_duo(p), mk_duo(p2)))

    # KVzap (linear surrogate)
    surr = {"w": rng.normal(size=(L, E, H)).astype(np.float32),
            "b": rng.normal(size=(L, H)).astype(np.float32)}
    surr2 = {"w": rng.normal(size=(L, E, H)).astype(np.float32),
             "b": rng.normal(size=(L, H)).astype(np.float32)}
    p, p2 = str(tmp_path / "kvzap.npz"), str(tmp_path / "kvzap2.npz")
    save_kvzap_model(p, surr)
    save_kvzap_model(p2, surr2)
    mk = lambda path: KVzapPress(compression_ratio=0.5,
                                 surrogate=load_kvzap_model(path))
    out.append(("kvzap", mk(p), mk(p), mk(p2)))

    # FastKVzip gates
    g = init_random_gates(jax.random.PRNGKey(0), cfg)
    g2 = init_random_gates(jax.random.PRNGKey(1), cfg)
    p, p2 = str(tmp_path / "gates.npz"), str(tmp_path / "gates2.npz")
    save_fastkvzip_gates(p, g)
    save_fastkvzip_gates(p2, g2)
    mk = lambda path: FastKVzipPress(compression_ratio=0.5,
                                     gates=load_fastkvzip_gates(path))
    out.append(("fastkvzip", mk(p), mk(p), mk(p2)))

    # LUKV budget curve
    curve = rng.random((99, L, H)).astype(np.float32)
    curve2 = rng.random((99, L, H)).astype(np.float32)
    p, p2 = str(tmp_path / "lukv.npy"), str(tmp_path / "lukv2.npy")
    np.save(p, curve)
    np.save(p2, curve2)
    mk = lambda path: LUKVPress(press=KnormPress(), compression_ratio=0.5,
                                budget_curves=load_budget_curve(path))
    out.append(("lukv", mk(p), mk(p), mk(p2)))

    # ExpectedAttention stats
    Hq = cfg.num_heads
    st = {"mu": rng.normal(size=(L, Hq, D)).astype(np.float32),
          "cov": rng.normal(size=(L, Hq, D, D)).astype(np.float32)}
    st2 = {"mu": rng.normal(size=(L, Hq, D)).astype(np.float32),
           "cov": rng.normal(size=(L, Hq, D, D)).astype(np.float32)}
    p, p2 = str(tmp_path / "stats.npz"), str(tmp_path / "stats2.npz")
    save_query_stats(p, st)
    save_query_stats(p2, st2)
    mk = lambda path: ExpectedAttentionStatsPress(
        compression_ratio=0.5, stats=load_query_stats(path))
    out.append(("ea_stats", mk(p), mk(p), mk(p2)))

    # RestoreKV embeddings + LoRA
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (8, E), jnp.float32)
    lora = init_random_lora(key, cfg)
    lora2 = init_random_lora(jax.random.PRNGKey(1), cfg)
    p, p2 = str(tmp_path / "rkv.npz"), str(tmp_path / "rkv2.npz")
    save_restore_artifacts(p, emb, lora)
    save_restore_artifacts(p2, emb, lora2)

    def mk_rkv(path):
        e, lo, sc = load_restore_artifacts(path)
        return RestoreKVPress(compression_ratio=0.5, restore_embeddings=e,
                              lora=lo, lora_scaling=sc)

    out.append(("restorekv", mk_rkv(p), mk_rkv(p), mk_rkv(p2)))
    return out


def test_artifact_presses_content_hash(tmp_path):
    for name, a, b, other in _press_pairs(tmp_path):
        assert a is not b
        assert hash(a) == hash(b), name
        assert a == b, name
        assert a != other, name


def test_artifact_presses_one_compile(tmp_path):
    """Two instances loaded from the same artifact → ONE trace of a jitted
    function taking the press as a static argument (the actual recompile
    trap: jit keys on hash/eq of static args)."""
    for name, a, b, _ in _press_pairs(tmp_path):
        traces = []

        @partial(jax.jit, static_argnames=("press",))
        def f(x, *, press):
            traces.append(1)
            return x + 1.0

        x = jnp.zeros(())
        f(x, press=a)
        f(x, press=b)
        assert len(traces) == 1, (name, len(traces))


def test_content_hash_is_cached(tmp_path):
    """The fingerprint is computed once per instance (hashing is on the jit
    dispatch path — it must not re-touch artifact bytes every call)."""
    (_, press, _, _) = _press_pairs(tmp_path)[0]
    hash(press)
    key1 = press.__dict__.get("_content_key")
    assert key1 is not None
    hash(press)
    assert press.__dict__.get("_content_key") is key1
