"""Offline needle-retrieval integration test — the reference's GPU
integration analogue (tests/integration/test_ruler.py) without network: a
tiny model is *trained* to retrieve a needle value ("... K V ... Q K → V"),
then query-aware compression (SnapKV, window covering the in-context query)
must preserve retrieval while a sink+recent press must destroy mid-depth
needles — the discriminative check that compression semantics are real."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from kvpress_tpu import Runner, SnapKVPress, StreamingLLMPress, init_params, tiny_config
from kvpress_tpu.cache import init_cache

NOISE_LO, NOISE_HI = 10, 40
K_TOK, Q_TOK = 6, 5
VAL_LO, VAL_HI = 40, 70
S_CTX = 24                   # noise with one (K, V) needle
CTX = S_CTX + 2              # + the in-context query "Q K" (query-aware form)
SEQ = CTX + 2                # + the asked question "Q K"


def make_batch(rng, batch, depth=None):
    seq = rng.integers(NOISE_LO, NOISE_HI, size=(batch, SEQ)).astype(np.int32)
    vals = rng.integers(VAL_LO, VAL_HI, size=batch)
    depths = (
        rng.integers(0, S_CTX - 1, size=batch)
        if depth is None else np.full(batch, depth)
    )
    b = np.arange(batch)
    seq[b, depths] = K_TOK
    seq[b, depths + 1] = vals
    seq[:, CTX - 2] = Q_TOK
    seq[:, CTX - 1] = K_TOK
    seq[:, -2] = Q_TOK
    seq[:, -1] = K_TOK
    return jnp.asarray(seq), jnp.asarray(vals), depths


@pytest.fixture(scope="module")
def trained():
    # Drop every executable compiled by the ~230 preceding tests: the XLA CPU
    # compile of the training step below intermittently segfaults when it runs
    # late in a long-lived process with hundreds of live executables.
    jax.clear_caches()
    cfg = tiny_config(vocab_size=80, num_layers=2, hidden_size=96,
                      num_heads=4, num_kv_heads=4, head_dim=24,
                      intermediate_size=192)
    runner = Runner.create(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 3e-3, 100, 1200, 1e-4)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt = tx.init(params)
    rng = np.random.default_rng(0)

    def loss_fn(params, seq, target):
        cache = init_cache(cfg, seq.shape[0], SEQ, dtype=jnp.float32)
        logits, _, _ = Runner.forward(
            runner, params, seq, cache, logits_last_only=True
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, 0], target
        ).mean()

    @jax.jit
    def step(params, opt, seq, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, seq, target)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(1200):
        seq, target, _ = make_batch(rng, 128)
        params, opt, _ = step(params, opt, seq, target)

    seq, target, _ = make_batch(rng, 256)
    cache = init_cache(cfg, 256, SEQ, dtype=jnp.float32)
    logits, _, _ = Runner.forward(runner, params, seq, cache, logits_last_only=True)
    acc = float((jnp.argmax(logits[:, 0], -1) == target).mean())
    if acc < 0.95:
        pytest.skip(f"tiny model failed to learn retrieval (acc={acc:.2f})")
    return cfg, params, runner


def _accuracy(cfg, params, runner, press, depth=None, batch=128, seed=7,
              query_aware=True):
    """Compress the context, then ask 'Q K' against the compressed cache —
    the pipeline's compress-once/ask-later shape. query_aware includes the
    query inside the compressed context (the reference's query-aware
    protocol); without it, compression must preserve the needle blindly."""
    rng = np.random.default_rng(seed)
    seq, target, _ = make_batch(rng, batch, depth=depth)
    context = seq[:, :CTX] if query_aware else seq[:, :S_CTX]
    question = seq[:, -2:]
    _, cache, _ = runner.prefill(
        params, context, press=press, max_size=SEQ + 2, dtype=jnp.float32
    )
    logits, _, _ = Runner.forward(
        runner, params, question, cache, logits_last_only=True
    )
    return float((jnp.argmax(logits[:, 0], -1) == target).mean())


def test_no_press_baseline(trained):
    cfg, params, runner = trained
    assert _accuracy(cfg, params, runner, None) > 0.95


def test_query_aware_snapkv_preserves_needle(trained):
    """SnapKV's observation window covers the in-context query, so the needle
    value survives ratio-0.5 compression (reference query-aware protocol +
    integration bar: needle retrieved under compression)."""
    cfg, params, runner = trained
    press = SnapKVPress(compression_ratio=0.5, window_size=4, kernel_size=3)
    acc = _accuracy(cfg, params, runner, press)
    assert acc > 0.85, acc


def test_sink_only_press_destroys_early_needles(trained):
    """StreamingLLM keeps sink+recent only: needles in the pruned middle are
    lost, recent ones survive. Evaluated query-agnostically — with the query
    in-context its own hidden states leak the answer past the eviction (a
    real attention effect the query-aware protocol exploits)."""
    cfg, params, runner = trained
    press = StreamingLLMPress(compression_ratio=0.6, n_sink=2)
    early = _accuracy(cfg, params, runner, press, depth=8, query_aware=False)
    late = _accuracy(
        cfg, params, runner, press, depth=S_CTX - 4, query_aware=False
    )
    baseline = _accuracy(cfg, params, runner, None, depth=8, query_aware=False)
    assert baseline > 0.95, baseline
    assert late > 0.85, late
    assert early < 0.4, early


# Reference integration bar (tests/integration/test_ruler.py:24-69): the
# needle must survive light compression for EVERY press family, including
# over a quantized cache. Ratio 0.1, query-aware.
from kvpress_tpu.presses import (
    AdaKVPress,
    ExpectedAttentionPress,
    KeyDiffPress,
    KeyRerotationPress,
    KnormPress,
    ObservedAttentionPress,
    RandomPress,
    TOVAPress,
)

LOW_RATIO_PRESSES = [
    ("knorm", lambda: KnormPress(0.1)),
    ("random", lambda: RandomPress(0.1)),
    ("streaming", lambda: StreamingLLMPress(0.1, n_sink=2)),
    ("snapkv", lambda: SnapKVPress(0.1, window_size=4, kernel_size=3)),
    ("tova", lambda: TOVAPress(0.1)),
    ("expected", lambda: ExpectedAttentionPress(
        0.1, n_future_positions=8, n_sink=2)),
    ("keydiff", lambda: KeyDiffPress(0.1)),
    ("observed", lambda: ObservedAttentionPress(0.1)),
    ("adakv_knorm", lambda: AdaKVPress(press=KnormPress(0.1))),
    ("rerotate_knorm", lambda: KeyRerotationPress(press=KnormPress(0.1))),
]


@pytest.mark.parametrize(
    "name,mk", LOW_RATIO_PRESSES, ids=[p[0] for p in LOW_RATIO_PRESSES]
)
def test_every_press_preserves_needle_at_low_ratio(trained, name, mk):
    cfg, params, runner = trained
    acc = _accuracy(cfg, params, runner, mk())
    assert acc > 0.9, (name, acc)


# Reference leaderboard protocol sweeps ratios {0.25, 0.5, 0.75, 0.875}
# (evaluation/leaderboard.sh). The quality bar above 0.1 lives here: every
# scoring press must still retrieve at ratio 0.5 (query-aware), and the
# pruning-by-position presses must show the DECLINING accuracy-vs-ratio
# curve (a scoring regression that only bites at high ratios flips these).
MID_RATIO_PRESSES = [
    ("knorm", lambda r: KnormPress(r)),
    ("snapkv", lambda r: SnapKVPress(r, window_size=4, kernel_size=3)),
    ("tova", lambda r: TOVAPress(r)),
    ("observed", lambda r: ObservedAttentionPress(r)),
    ("expected", lambda r: ExpectedAttentionPress(
        r, n_future_positions=8, n_sink=2)),
    ("keydiff", lambda r: KeyDiffPress(r)),
    ("adakv_snapkv", lambda r: AdaKVPress(
        press=SnapKVPress(r, window_size=4, kernel_size=3))),
    ("rerotate_snapkv", lambda r: KeyRerotationPress(
        press=SnapKVPress(r, window_size=4, kernel_size=3))),
]


@pytest.mark.parametrize(
    "name,mk", MID_RATIO_PRESSES, ids=[p[0] for p in MID_RATIO_PRESSES]
)
def test_scoring_press_holds_needle_at_ratio_half(trained, name, mk):
    cfg, params, runner = trained
    acc = _accuracy(cfg, params, runner, mk(0.5))
    assert acc > 0.85, (name, acc)


def test_accuracy_declines_with_ratio_for_positional_presses(trained):
    """StreamingLLM / Random destroy progressively more needles as the ratio
    rises — the curve must actually decline (measured reference points:
    streaming 0.96→0.66, random 1.0→0.50 across 0.25→0.875)."""
    cfg, params, runner = trained
    for mk in (lambda r: StreamingLLMPress(r, n_sink=2),
               lambda r: RandomPress(r)):
        lo = _accuracy(cfg, params, runner, mk(0.25))
        hi = _accuracy(cfg, params, runner, mk(0.875))
        assert lo > hi + 0.1, (lo, hi)


def test_needle_survives_quantized_cache(trained):
    """Ratio 0.1 over an int8-quantized cache (reference bar's quantized leg)."""
    cfg, params, runner = trained
    rng = np.random.default_rng(11)
    seq, target, _ = make_batch(rng, 128)
    context, question = seq[:, :CTX], seq[:, -2:]
    press = SnapKVPress(compression_ratio=0.1, window_size=4, kernel_size=3)
    _, cache, _ = runner.prefill(
        params, context, press=press, max_size=SEQ + 2, dtype=jnp.float32,
        quantized=True, kv_bits=8,
    )
    logits, _, _ = Runner.forward(
        runner, params, question, cache, logits_last_only=True
    )
    acc = float((jnp.argmax(logits[:, 0], -1) == target).mean())
    assert acc > 0.9, acc


def test_needle_survives_int8_weights(trained):
    """The bench headline stacks Knorm + int4 KV + int8 WEIGHTS — verify the
    weight quantization leg preserves retrieval (reference FP8-model flag,
    evaluate.py:370-372), on top of compression + the quantized cache."""
    from kvpress_tpu.models.llama import quantize_params_int8

    cfg, params, runner = trained
    qparams = quantize_params_int8(params)
    rng = np.random.default_rng(13)
    seq, target, _ = make_batch(rng, 128)
    context, question = seq[:, :CTX], seq[:, -2:]
    press = SnapKVPress(compression_ratio=0.1, window_size=4, kernel_size=3)
    _, cache, _ = runner.prefill(
        qparams, context, press=press, max_size=SEQ + 2, dtype=jnp.float32,
        quantized=True, kv_bits=4,
    )
    logits, _, _ = Runner.forward(
        runner, qparams, question, cache, logits_last_only=True
    )
    acc = float((jnp.argmax(logits[:, 0], -1) == target).mean())
    assert acc > 0.9, acc


def test_needle_survives_chunked_prefill(trained):
    """Chunked prefill + host-loop compression preserves retrieval: the
    SnapKV window (the in-context query) sits in the FINAL chunk, so the
    score window sees it — accuracy must match the one-shot compressed path.
    Also covers the quantized (int8) chunked cache."""
    cfg, params, runner = trained
    press = SnapKVPress(compression_ratio=0.3, window_size=4, kernel_size=3)
    rng = np.random.default_rng(11)
    seq, target, _ = make_batch(rng, 64)
    context = seq[:, :CTX]
    question = seq[:, -2:]

    for kw in (dict(), dict(quantized=True, kv_bits=8)):
        _, cache, _ = runner.prefill_chunked(
            params, context, press=press, chunk_size=8,
            max_size=SEQ + 2, dtype=jnp.float32, **kw,
        )
        logits, _, _ = Runner.forward(
            runner, params, question, cache, logits_last_only=True
        )
        acc = float((jnp.argmax(logits[:, 0], -1) == target).mean())
        assert acc > 0.9, (kw, acc)


def test_needle_survives_int4_weights(trained):
    """The KV-bound bench headline (BENCH line 3) stacks Knorm-0.5 + int4 KV
    + int4 WEIGHTS — this is its accuracy bar: retrieval must hold at
    ratio 0.1 and at the headline's own ratio 0.5 over the full int4w+int4KV
    stack (reference integration bar: every press over the quantized cache,
    tests/integration/test_ruler.py:24-69)."""
    from kvpress_tpu.models.llama import quantize_params_int4

    cfg, params, runner = trained
    qparams = quantize_params_int4(params)
    rng = np.random.default_rng(17)
    seq, target, _ = make_batch(rng, 128)
    context, question = seq[:, :CTX], seq[:, -2:]
    for ratio in (0.1, 0.5):
        press = SnapKVPress(compression_ratio=ratio, window_size=4,
                            kernel_size=3)
        _, cache, _ = runner.prefill(
            qparams, context, press=press, max_size=SEQ + 2,
            dtype=jnp.float32, quantized=True, kv_bits=4,
        )
        logits, _, _ = Runner.forward(
            runner, qparams, question, cache, logits_last_only=True
        )
        acc = float((jnp.argmax(logits[:, 0], -1) == target).mean())
        assert acc > 0.9, (ratio, acc)
