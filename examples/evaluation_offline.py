"""Offline mini-leaderboard: the full evaluation protocol with zero network.

The reference's leaderboard (evaluation/leaderboard.sh) sweeps press x
compression-ratio over RULER with a hub model. This example reproduces the
protocol end to end without any network: it TRAINS a tiny model to retrieve
a needle value ("... K V ... Q K -> V", the same task as
tests/test_retrieval_integration.py), builds a RULER-style dataframe, and
drives ``EvaluationRunner`` (config -> press registry -> pipeline ->
predictions.csv / metrics.json) for each press x ratio — printing a small
leaderboard where accuracy really degrades with compression.

Run: python examples/evaluation_offline.py        (~2-3 min on CPU)
Set KVPRESS_QUICK=1 for a fast smoke run (less training, fewer samples).
"""

import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "evaluation"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from kvpress_tpu import Runner, init_params, tiny_config
from kvpress_tpu.cache import init_cache
from kvpress_tpu.pipeline import KVPressPipeline

# Task layout: [bos] noise(with one "K V" needle) "Q K" | question "Q K" -> V
NOISE_LO, NOISE_HI = 10, 40
K_TOK, Q_TOK = 6, 5
VAL_LO, VAL_HI = 40, 70
S_CTX = 24
SEQ = 1 + S_CTX + 2 + 2                   # bos + noise + in-context QK + QK
# Multi-needle distractor variant (RULER niah_multivalue analogue): the
# SAME key appears N_NEEDLES times with different values in a LONGER
# context; the answer is the LATEST needle's value. Distractor needles make
# high-ratio compression discriminate query-aware scoring (the window
# queries attend the target needle) from content-only scoring (Knorm keeps
# ~random rows, losing the target among the distractors) — the top of the
# table stops saturating at 100. (A distinct-keys niah_multikey variant is
# NOT learnable by this 2-layer toy under final-position loss — selection
# by key content plateaus at ln(n_keys); measured round 5.)
N_NEEDLES = 3
S_CTX_MK = 56
SEQ_MK = 1 + S_CTX_MK + 2 + 2
QUICK = bool(os.environ.get("KVPRESS_QUICK"))


class NumberTokenizer:
    """Word == token id ("57 23" -> [57, 23]); the subset of the HF API the
    pipeline touches. Lets the evaluation stack run on a from-scratch model."""

    chat_template = None
    bos_token = "1"
    eos_token = ""
    eos_token_id = None
    model_max_length = 10 ** 9

    def encode(self, text, add_special_tokens=False, **kw):
        return [int(t) for t in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in ids)


def make_batch(rng, batch, depth=None):
    seq = rng.integers(NOISE_LO, NOISE_HI, size=(batch, SEQ)).astype(np.int32)
    seq[:, 0] = 1                                       # bos
    vals = rng.integers(VAL_LO, VAL_HI, size=batch)
    depths = (
        rng.integers(1, S_CTX - 1, size=batch)
        if depth is None else np.full(batch, depth)
    )
    b = np.arange(batch)
    seq[b, depths] = K_TOK
    seq[b, depths + 1] = vals
    seq[:, -4] = Q_TOK                                  # in-context query
    seq[:, -3] = K_TOK
    seq[:, -2] = Q_TOK                                  # asked question
    seq[:, -1] = K_TOK
    return jnp.asarray(seq), vals, depths


def make_batch_multivalue(rng, batch, n_needles=N_NEEDLES):
    """[bos] noise with n_needles '(K V_i)' needles (same key), in-context
    query 'Q K', question 'Q K' -> value of the LATEST needle."""
    seq = rng.integers(NOISE_LO, NOISE_HI, size=(batch, SEQ_MK)).astype(np.int32)
    seq[:, 0] = 1
    targets = np.empty(batch, np.int64)
    for b in range(batch):
        # non-overlapping pair slots inside the noise region, position order
        slots = np.sort(1 + 2 * rng.choice((S_CTX_MK - 1) // 2,
                                           size=n_needles, replace=False))
        vals = rng.integers(VAL_LO, VAL_HI, size=n_needles)
        for i in range(n_needles):
            seq[b, slots[i]] = K_TOK
            seq[b, slots[i] + 1] = vals[i]
        targets[b] = vals[-1]
        seq[b, -4] = Q_TOK
        seq[b, -3] = K_TOK
        seq[b, -2] = Q_TOK
        seq[b, -1] = K_TOK
    return jnp.asarray(seq), targets


def train_retrieval_model():
    cfg = tiny_config(vocab_size=80, num_layers=2, hidden_size=96,
                      num_heads=4, num_kv_heads=4, head_dim=24,
                      intermediate_size=192)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    n_steps = 150 if QUICK else 1200
    sched = optax.warmup_cosine_decay_schedule(0.0, 3e-3, 100, n_steps, 1e-4)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt = tx.init(params)
    rng = np.random.default_rng(0)

    def loss_fn(params, seq, target):
        cache = init_cache(cfg, seq.shape[0], seq.shape[1], dtype=jnp.float32)
        logits, _, _ = Runner.forward(runner, params, seq, cache,
                                      logits_last_only=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, 0], jnp.asarray(target)
        ).mean()

    @jax.jit
    def step(params, opt, seq, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, seq, target)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    # joint training: single-needle and multi-value batches alternate (two
    # shapes, two compiled steps) so one model serves both leaderboard tasks
    for i in range(n_steps):
        seq, target, _ = make_batch(rng, 128)
        params, opt, loss = step(params, opt, seq, jnp.asarray(target))
        seq_mk, target_mk = make_batch_multivalue(rng, 128)
        params, opt, loss_mk = step(params, opt, seq_mk, jnp.asarray(target_mk))
    print(f"trained retrieval model (final loss single {float(loss):.3f} / "
          f"multivalue {float(loss_mk):.3f})")
    return cfg, params, runner


def build_dataset(n=16 if QUICK else 48, seed=11):
    rng = np.random.default_rng(seed)
    seq, vals, _ = make_batch(rng, n)
    rows = []
    for i in range(n):
        toks = [str(int(t)) for t in np.asarray(seq[i])]
        rows.append({
            "context": " ".join(toks[1:-2]),      # bos re-added by pipeline
            "question": " ".join(toks[-2:]),
            "answer_prefix": "",
            "answer": [str(int(vals[i]))],
            "max_new_tokens": 1,
            "task": "niah_single",
        })
    return pd.DataFrame(rows)


def build_dataset_multivalue(n=16 if QUICK else 48, seed=13):
    """RULER niah_multivalue-style rows: distractor needles make high-ratio
    compression discriminate query-aware from content-only scoring."""
    rng = np.random.default_rng(seed)
    seq, targets = make_batch_multivalue(rng, n)
    rows = []
    for i in range(n):
        toks = [str(int(t)) for t in np.asarray(seq[i])]
        rows.append({
            "context": " ".join(toks[1:-2]),
            "question": " ".join(toks[-2:]),
            "answer_prefix": "",
            "answer": [str(int(targets[i]))],
            "max_new_tokens": 1,
            "task": "niah_multivalue",
        })
    return pd.DataFrame(rows)


def main():
    from evaluate import EvaluationConfig, EvaluationRunner

    cfg, params, runner = train_retrieval_model()
    pipe = KVPressPipeline(runner, params, NumberTokenizer())
    df = build_dataset()

    out = tempfile.mkdtemp(prefix="kvpress_leaderboard_")
    print(f"results under {out}\n")
    print(f"{'press':14s}" + "".join(f"  r={r:.2f}" for r in (0.25, 0.5, 0.75)))
    for press_name in ("no_press", "knorm", "tova", "streaming_llm"):
        scores = []
        for ratio in (0.25, 0.5, 0.75):
            config = EvaluationConfig(
                dataset="ruler", press_name=press_name,
                compression_ratio=ratio, output_dir=out, model="tiny-needle",
            )
            metrics = EvaluationRunner(config, pipeline=pipe,
                                       dataset_df=df).run()
            scores.append(metrics["niah_single"]["string_match"])
            if press_name == "no_press":
                break
        if press_name == "no_press":
            print(f"{press_name:14s}  {scores[0]:6.1f} (ratio ignored)")
        else:
            print(f"{press_name:14s}" + "".join(f"  {s:6.1f}" for s in scores))


if __name__ == "__main__":
    main()
