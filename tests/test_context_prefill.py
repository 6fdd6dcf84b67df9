"""Context-parallel prefill equivalence: full-model forward with the sequence
sharded over 8 devices + shard-local compression must equal the single-device
prefill with ChunkPress(chunk_length = S/N) — the same math by construction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import kvpress_tpu as kp
from kvpress_tpu.parallel.context_prefill import context_parallel_prefill
from kvpress_tpu.presses import ChunkPress, KnormPress

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

S = 128
N = 8


@pytest.fixture(scope="module")
def setup():
    cfg = kp.tiny_config()
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()[:N]), axis_names=("seq",))
    return cfg, params, runner, ids, mesh


def test_uncompressed_keys_match_single_device(setup):
    cfg, params, runner, ids, mesh = setup
    keys, values, lengths, masks = context_parallel_prefill(
        params, ids, runner=runner, press=None, mesh=mesh
    )
    _, cache, _ = runner.prefill(params, ids, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(keys), np.asarray(cache.keys), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(values), np.asarray(cache.values), atol=2e-4, rtol=1e-3
    )


def test_compressed_matches_chunk_press(setup):
    cfg, params, runner, ids, mesh = setup
    press = KnormPress(compression_ratio=0.5)
    keys, values, lengths, masks = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh
    )
    # single-device reference: ChunkPress with chunk = shard size
    ref_press = ChunkPress(press=press, chunk_length=S // N)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)

    Sl = S // N
    kept = press.n_kept(Sl)
    lengths = np.asarray(lengths).reshape(N, cfg.num_layers)
    assert (lengths == kept).all()

    got = np.asarray(keys)       # (L, B, H, S, D): per-shard kept at front
    ref = np.asarray(cache.keys)  # (L, B, H, S, D): all kept at front
    for layer in range(cfg.num_layers):
        for h in range(cfg.num_kv_heads):
            shard_rows = np.concatenate(
                [got[layer, 0, h, s * Sl : s * Sl + kept] for s in range(N)]
            )
            ref_rows = ref[layer, 0, h, : N * kept]
            # same kept sets (order within differs: chunk-concat vs per-shard)
            d = np.linalg.norm(shard_rows[:, None] - ref_rows[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (layer, h)
            assert (d.min(axis=0) < 1e-4).all(), (layer, h)


def test_2d_tp_sp_matches_chunk_press(setup):
    """2D (model=2, seq=4) sp×tp prefill: kept sets still match ChunkPress."""
    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("model", "seq")
    )
    press = KnormPress(compression_ratio=0.5)
    keys, values, lengths, masks = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh2,
        axis="seq", model_axis="model",
    )
    ref_press = ChunkPress(press=press, chunk_length=S // 4)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)

    Sl = S // 4
    kept = press.n_kept(Sl)
    got = np.asarray(keys)
    ref = np.asarray(cache.keys)
    for layer in range(cfg.num_layers):
        for h in range(cfg.num_kv_heads):
            shard_rows = np.concatenate(
                [got[layer, 0, h, s * Sl : s * Sl + kept] for s in range(4)]
            )
            ref_rows = ref[layer, 0, h, : 4 * kept]
            d = np.linalg.norm(shard_rows[:, None] - ref_rows[None], axis=-1)
            assert (d.min(axis=1) < 1e-4).all(), (layer, h)
            assert (d.min(axis=0) < 1e-4).all(), (layer, h)


def test_distributed_decode_matches_single_device(setup):
    """Flash-decoding-style split-KV decode over the seq mesh == single-device
    decode on the ChunkPress-equivalent cache (same kept sets ⇒ same softmax,
    combined via pmax/psum partials instead of a gathered cache)."""
    from kvpress_tpu.parallel.decode import context_parallel_decode_step

    cfg, params, runner, ids, mesh = setup
    press = KnormPress(compression_ratio=0.5)
    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh
    )
    ref_press = ChunkPress(press=press, chunk_length=S // N)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)

    tok = ids[:, -1:]
    offset = jnp.asarray(S, jnp.int32)
    lg_ref, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
    lg, shards, offset, _, _ = context_parallel_decode_step(
        params, tok, shards, offset, runner=runner, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=2e-4, rtol=1e-3
    )

    # greedy next token, step again: the appended K/V live on the last shard
    tok2 = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
    lg_ref2, cache, _ = runner.forward(params, tok2, cache, logits_last_only=True)
    lg2, shards, offset, _, _ = context_parallel_decode_step(
        params, tok2, shards, offset, runner=runner, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(lg2)[:, 0], np.asarray(lg_ref2)[:, 0], atol=2e-4, rtol=1e-3
    )
    lengths = np.asarray(shards[2]).reshape(N, cfg.num_layers)
    kept = press.n_kept(S // N)
    assert (lengths[:-1] == kept).all()
    assert (lengths[-1] == kept + 2).all()


def test_distributed_decode_2d_matches_single_device(setup):
    """2D (model=2, seq=4) sp×tp distributed decode == single-device decode."""
    from kvpress_tpu.parallel.decode import context_parallel_decode_step

    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("model", "seq")
    )
    press = KnormPress(compression_ratio=0.5)
    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh2,
        axis="seq", model_axis="model",
    )
    ref_press = ChunkPress(press=press, chunk_length=S // 4)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)

    tok = ids[:, -1:]
    lg_ref, _, _ = runner.forward(params, tok, cache, logits_last_only=True)
    lg, shards, _, _, _ = context_parallel_decode_step(
        params, tok, shards, jnp.asarray(S, jnp.int32),
        runner=runner, mesh=mesh2, axis="seq", model_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=2e-4, rtol=1e-3
    )


def test_distributed_generate_matches_single_device(setup):
    """Greedy generation on the mesh == single-device greedy decode over the
    ChunkPress-equivalent compressed cache, token for token."""
    from kvpress_tpu.parallel.decode import context_parallel_generate

    cfg, params, runner, ids, mesh = setup
    press = KnormPress(compression_ratio=0.5)
    got = context_parallel_generate(
        params, ids, runner=runner, press=press, mesh=mesh, max_new_tokens=6
    )

    ref_press = ChunkPress(press=press, chunk_length=S // N)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)
    tok = ids[:, -1:]
    want = []
    for _ in range(6):
        lg, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
        tok = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
        want.append(tok)
    want = jnp.concatenate(want, axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_distributed_decode_seq_tp_matches_single_device(setup):
    """2-device seq mesh where head/ffn counts divide the axis: the decode
    step runs its dense compute tensor-parallel over the seq axis (weight
    column slices + q/k/v all_gather) — logits must still equal the
    single-device reference exactly (parallel/decode.py seq_tp path)."""
    from kvpress_tpu.parallel.decode import context_parallel_decode_step

    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(np.array(jax.devices()[:2]), axis_names=("seq",))
    press = KnormPress(compression_ratio=0.5)
    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh2
    )
    ref_press = ChunkPress(press=press, chunk_length=S // 2)
    _, cache, _ = runner.prefill(params, ids, press=ref_press, dtype=jnp.float32)

    tok = ids[:, -1:]
    offset = jnp.asarray(S, jnp.int32)
    lg_ref, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
    lg, shards, offset, ovf, _ = context_parallel_decode_step(
        params, tok, shards, offset, runner=runner, mesh=mesh2
    )
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=2e-4, rtol=1e-3
    )
    tok2 = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
    lg_ref2, cache, _ = runner.forward(params, tok2, cache, logits_last_only=True)
    lg2, shards, offset, _, _ = context_parallel_decode_step(
        params, tok2, shards, offset, runner=runner, mesh=mesh2
    )
    np.testing.assert_allclose(
        np.asarray(lg2)[:, 0], np.asarray(lg_ref2)[:, 0], atol=2e-4, rtol=1e-3
    )


def test_distributed_decode_overflow_raises_flag_and_grows(setup):
    """Uncompressed prefill leaves zero tail slack: the first decode step
    must raise the overflow flag WITHOUT corrupting the last slot (the
    round-1 silent-clamp bug), and grow_shards + retry must match the
    single-device reference."""
    from kvpress_tpu.cache import grow
    from kvpress_tpu.parallel.decode import (
        context_parallel_decode_step, grow_shards,
    )

    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(np.array(jax.devices()[:2]), axis_names=("seq",))
    shards = context_parallel_prefill(
        params, ids, runner=runner, press=None, mesh=mesh2
    )
    keys_before = np.asarray(shards[0]).copy()

    tok = ids[:, -1:]
    offset = jnp.asarray(S, jnp.int32)
    _, shards_out, _, ovf, _ = context_parallel_decode_step(
        params, tok, shards, offset, runner=runner, mesh=mesh2
    )
    assert int(ovf) == 1
    # the full buffers were left untouched (no silent overwrite)
    np.testing.assert_array_equal(np.asarray(shards_out[0]), keys_before)

    grown = grow_shards(shards, 2, 8)
    lg, grown, offset2, ovf2, _ = context_parallel_decode_step(
        params, tok, grown, offset, runner=runner, mesh=mesh2
    )
    assert int(ovf2) == 0

    _, cache, _ = runner.prefill(params, ids, dtype=jnp.float32)
    cache = grow(cache, 16)
    lg_ref, _, _ = runner.forward(params, tok, cache, logits_last_only=True)
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=2e-4, rtol=1e-3
    )


def test_distributed_decode_press(setup):
    """DecodingPress through the distributed decode step: shard-local
    compression (per-shard targets) bounds each shard's length; a no-op
    target (larger than content) leaves generation identical to pressless."""
    from kvpress_tpu.parallel.decode import context_parallel_decode_step
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(np.array(jax.devices()[:2]), axis_names=("seq",))

    def generate(decode_press, n=10):
        shards = context_parallel_prefill(
            params, ids, runner=runner, press=None, mesh=mesh2
        )
        # leave room for appends on the last shard
        from kvpress_tpu.parallel.decode import grow_shards
        shards = grow_shards(shards, 2, 16)
        offset = jnp.asarray(S, jnp.int32)
        tok = ids[:, -1:]
        dstate = (
            decode_press.init_state(runner.cfg, ids.shape[0], 1)
            if decode_press is not None else None
        )
        toks = []
        for _ in range(n):
            lg, shards, offset, ovf, dstate = context_parallel_decode_step(
                params, tok, shards, offset, runner=runner, mesh=mesh2,
                press=decode_press, press_state=dstate,
            )
            assert int(ovf) == 0
            tok = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
            toks.append(int(tok[0, 0]))
        return toks, np.asarray(shards[2]).reshape(2, cfg.num_layers)

    base, lengths_base = generate(None)

    # no-op press (target bigger than any shard content): exact equality
    noop = DecodingPress(
        base_press=KnormPress(), compression_interval=3, target_size=512,
        hidden_states_buffer_size=4,
    )
    same, _ = generate(noop)
    assert same == base

    # real press: shard lengths bounded by per-shard target (+ appends since
    # the last interval hit)
    press = DecodingPress(
        base_press=KnormPress(), compression_interval=4, target_size=24,
        hidden_states_buffer_size=4,
    )
    toks, lengths = generate(press)
    assert all(np.isfinite(t) for t in toks)
    assert (lengths <= 24 + 4).all(), lengths


def test_distributed_decode_press_quantized(setup):
    """DecodingPress over int8/int4 KV shards: shard-local payload-width
    compression (decode_compress_quantized). A never-binding target leaves
    generation bit-identical to pressless quantized decode; a real target
    bounds every shard's length."""
    from kvpress_tpu.parallel.decode import (
        context_parallel_decode_step, grow_shards,
    )
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner, ids, _ = setup
    mesh2 = Mesh(np.array(jax.devices()[:2]), axis_names=("seq",))

    def generate(decode_press, kv_bits, n=10):
        shards = context_parallel_prefill(
            params, ids, runner=runner, press=None, mesh=mesh2,
            quantized=True, kv_bits=kv_bits,
        )
        shards = grow_shards(shards, 2, 16)
        offset = jnp.asarray(S, jnp.int32)
        tok = ids[:, -1:]
        dstate = (
            decode_press.init_state(runner.cfg, ids.shape[0], 1)
            if decode_press is not None else None
        )
        toks = []
        for _ in range(n):
            lg, shards, offset, ovf, dstate = context_parallel_decode_step(
                params, tok, shards, offset, runner=runner, mesh=mesh2,
                press=decode_press, press_state=dstate,
            )
            assert int(ovf) == 0
            tok = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
            toks.append(int(tok[0, 0]))
        return toks, np.asarray(shards[2]).reshape(2, cfg.num_layers)

    for kv_bits in (8, 4):
        base, _ = generate(None, kv_bits)
        noop = DecodingPress(
            base_press=KnormPress(), compression_interval=3, target_size=512,
            hidden_states_buffer_size=4,
        )
        same, _ = generate(noop, kv_bits)
        assert same == base, kv_bits

        press = DecodingPress(
            base_press=KnormPress(), compression_interval=4, target_size=24,
            hidden_states_buffer_size=4,
        )
        toks, lengths = generate(press, kv_bits)
        assert all(np.isfinite(t) for t in toks)
        assert (lengths <= 24 + 4).all(), lengths


def test_distributed_decode_press_quantized_rejects_cam(setup):
    from kvpress_tpu.parallel.decode import context_parallel_generate
    from kvpress_tpu.presses import CAMPress

    cfg, params, runner, ids, mesh = setup
    cam = CAMPress(base_press=KnormPress(), compression_interval=4,
                   target_size=24, hidden_states_buffer_size=4)
    with pytest.raises(AssertionError, match="dense buffers"):
        context_parallel_generate(
            params, ids, runner=runner, mesh=mesh, decode_press=cam,
            quantized=True, max_new_tokens=4,
        )


def test_fused_generate_matches_host_loop(setup):
    """context_parallel_generate(fused=True): the whole token loop in one
    dispatch (lax.scan inside the shard_map) equals the host loop token for
    token — plain and with a shard-local DecodingPress riding along."""
    from kvpress_tpu.parallel.decode import context_parallel_generate
    from kvpress_tpu.presses import DecodingPress

    cfg, params, runner, ids, mesh = setup
    press = KnormPress(compression_ratio=0.5)

    # 12 > the per-shard tail slack left by the press (8): exercises
    # ensure_tail_capacity's pre-grow, not just the existing slack
    host = context_parallel_generate(
        params, ids, runner=runner, press=press, mesh=mesh, max_new_tokens=12
    )
    fused = context_parallel_generate(
        params, ids, runner=runner, press=press, mesh=mesh, max_new_tokens=12,
        fused=True,
    )
    np.testing.assert_array_equal(np.asarray(host), np.asarray(fused))

    dpress = DecodingPress(
        base_press=KnormPress(), compression_interval=3, target_size=12,
        hidden_states_buffer_size=4,
    )
    host_p = context_parallel_generate(
        params, ids, runner=runner, press=press, decode_press=dpress,
        mesh=mesh, max_new_tokens=8,
    )
    fused_p = context_parallel_generate(
        params, ids, runner=runner, press=press, decode_press=dpress,
        mesh=mesh, max_new_tokens=8, fused=True,
    )
    np.testing.assert_array_equal(np.asarray(host_p), np.asarray(fused_p))


def test_distributed_paths_int8_weights(setup):
    """Int8 weights INCLUDING the embedding/lm_head (large-vocab decode HBM
    lever) through context-parallel prefill + distributed decode (1D
    seq-as-TP path included: weight-column slices must carry their
    per-channel scale slices) equal the single-device int8 forward."""
    from kvpress_tpu.models.llama import quantize_params_int8
    from kvpress_tpu.parallel.decode import context_parallel_decode_step

    cfg, params, runner, ids, mesh = setup
    qparams = quantize_params_int8(params, include_embeddings=True)

    shards = context_parallel_prefill(
        qparams, ids, runner=runner, press=None, mesh=mesh
    )
    _, cache, _ = runner.prefill(qparams, ids, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(shards[0]), np.asarray(cache.keys), atol=2e-4, rtol=1e-3
    )

    from kvpress_tpu.cache import grow
    from kvpress_tpu.parallel.decode import grow_shards
    # uncompressed prefill leaves no append slack on EITHER side
    shards = grow_shards(shards, N, 4)
    cache = grow(cache, 4)
    tok = ids[:, -1:]
    lg_ref, _, _ = runner.forward(qparams, tok, cache, logits_last_only=True)
    lg, _, _, ovf, _ = context_parallel_decode_step(
        qparams, tok, shards, jnp.asarray(S, jnp.int32),
        runner=runner, mesh=mesh,
    )
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_shards_match_single_device(setup, bits):
    """Quantized distributed path (int8/int4 payload shards, payload-width
    reads in the split-KV decode) == the single-device quantized cache.
    StreamingLLM keeps by position, so both paths keep identical sets and
    quantize identical values (requantization of a dequantized payload is
    exact: the amax channel pins the scale)."""
    from kvpress_tpu.parallel.decode import (
        context_parallel_decode_step, context_parallel_generate,
    )
    from kvpress_tpu.presses import StreamingLLMPress

    cfg, params, runner, ids, mesh = setup
    press = StreamingLLMPress(compression_ratio=0.5, n_sink=2)

    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh,
        quantized=True, kv_bits=bits,
    )
    assert len(shards) == 6
    assert shards[0].dtype == (jnp.uint8 if bits == 4 else jnp.int8)

    ref_press = ChunkPress(press=press, chunk_length=S // N)
    _, cache, _ = runner.prefill(
        params, ids, press=ref_press, dtype=jnp.float32,
        quantized=True, kv_bits=bits,
    )

    tok = ids[:, -1:]
    offset = jnp.asarray(S, jnp.int32)
    lg_ref, cache, _ = runner.forward(params, tok, cache, logits_last_only=True)
    lg, shards, offset, ovf, _ = context_parallel_decode_step(
        params, tok, shards, offset, runner=runner, mesh=mesh,
    )
    assert int(ovf) == 0
    assert len(shards) == 6
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=3e-4, rtol=2e-3
    )
    # second step: the appended K/V went through the quantized append path
    tok2 = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
    lg_ref2, cache, _ = runner.forward(params, tok2, cache, logits_last_only=True)
    lg2, shards, offset, _, _ = context_parallel_decode_step(
        params, tok2, shards, offset, runner=runner, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(lg2)[:, 0], np.asarray(lg_ref2)[:, 0], atol=3e-4, rtol=2e-3
    )

    # fused generate over quantized shards == host loop
    host = context_parallel_generate(
        params, ids, runner=runner, press=press, mesh=mesh,
        max_new_tokens=6, quantized=True, kv_bits=bits,
    )
    fused = context_parallel_generate(
        params, ids, runner=runner, press=press, mesh=mesh,
        max_new_tokens=6, quantized=True, kv_bits=bits, fused=True,
    )
    np.testing.assert_array_equal(np.asarray(host), np.asarray(fused))


def _sliding_setup(setup, n_layers_pattern=2):
    import dataclasses

    cfg, params, runner, ids, mesh = setup
    scfg = dataclasses.replace(
        cfg, sliding_window=8, rope_local_base_freq=500.0,
        layer_is_sliding=tuple(
            i % n_layers_pattern == 0 for i in range(cfg.num_layers)
        ),
    )
    return scfg, params, dataclasses.replace(runner, cfg=scfg), ids, mesh


def test_sliding_window_context_parallel_prefill(setup):
    """Gemma3-style interleaved sliding/global layers + dual RoPE bases
    through the ring prefill: keys/values must equal the single-device
    prefill (the window and local base frequency shape every layer's
    hidden-state flow, so deep-layer KV equality proves both)."""
    scfg, params, srunner, ids, mesh = _sliding_setup(setup)
    keys, values, lengths, masks = context_parallel_prefill(
        params, ids, runner=srunner, mesh=mesh
    )
    _, cache, _ = srunner.prefill(params, ids, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(keys), np.asarray(cache.keys), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(values), np.asarray(cache.values), atol=2e-4, rtol=1e-3
    )


def test_sliding_window_distributed_decode(setup):
    """Distributed decode on a sliding-window model: the slot→position map
    (idx*prefill_shard_len + slot) must reproduce single-device decode logits
    step for step, including appends past the prefill length. Exercises both
    the plain (8-shard) and seq-TP (2-shard) dense paths."""
    from kvpress_tpu.cache import grow
    from kvpress_tpu.parallel.decode import (
        context_parallel_decode_step, grow_shards,
    )

    scfg, params, srunner, ids, _ = _sliding_setup(setup)
    for n in (8, 2):
        mesh_n = Mesh(np.array(jax.devices()[:n]), axis_names=("seq",))
        shards = context_parallel_prefill(
            params, ids, runner=srunner, mesh=mesh_n
        )
        shards = grow_shards(shards, n, 8)
        _, cache, _ = srunner.prefill(params, ids, dtype=jnp.float32)
        cache = grow(cache, 8)
        tok = ids[:, -1:]
        offset = jnp.asarray(S, jnp.int32)
        psl = jnp.asarray(S // n, jnp.int32)
        for step in range(5):
            lg, shards, offset, ovf, _ = context_parallel_decode_step(
                params, tok, shards, offset, runner=srunner, mesh=mesh_n,
                prefill_shard_len=psl,
            )
            assert int(ovf) == 0
            lg_ref, cache, _ = srunner.forward(
                params, tok, cache, logits_last_only=True
            )
            np.testing.assert_allclose(
                np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0],
                atol=3e-4, rtol=2e-3, err_msg=f"n={n} step={step}",
            )
            tok = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)


def test_sliding_window_press_skips_sliding_shards(setup):
    """Shard-local compression on a sliding-window model compresses only the
    global layers; sliding layers keep their full shard (content AND length),
    matching the single-device skip semantics."""
    scfg, params, srunner, ids, mesh = _sliding_setup(setup)
    press = KnormPress(compression_ratio=0.5)
    keys, values, lengths, masks = context_parallel_prefill(
        params, ids, runner=srunner, press=press, mesh=mesh
    )
    plain_k, _, _, _ = context_parallel_prefill(
        params, ids, runner=srunner, mesh=mesh
    )
    Sl = S // N
    lengths = np.asarray(lengths).reshape(N, scfg.num_layers)
    for i, sliding in enumerate(scfg.layer_is_sliding):
        expect = Sl if sliding else press.n_kept(Sl)
        assert (lengths[:, i] == expect).all(), (i, lengths)
        if sliding:
            np.testing.assert_array_equal(
                np.asarray(keys[i]), np.asarray(plain_k[i]), str(i)
            )


def test_sliding_window_decode_requires_prefill_shard_len(setup):
    from kvpress_tpu.parallel.decode import context_parallel_decode_step

    scfg, params, srunner, ids, mesh = _sliding_setup(setup)
    shards = context_parallel_prefill(params, ids, runner=srunner, mesh=mesh)
    with pytest.raises(AssertionError, match="prefill_shard_len"):
        context_parallel_decode_step(
            params, ids[:, -1:], shards, jnp.asarray(S, jnp.int32),
            runner=srunner, mesh=mesh,
        )


def test_quantized_shards_2d_sp_tp(setup):
    """Quantized shards on the 2D sp×tp mesh: payload+scales shard over both
    axes and the split-KV quantized decode still equals single-device."""
    from kvpress_tpu.parallel.decode import context_parallel_decode_step
    from kvpress_tpu.presses import StreamingLLMPress

    cfg, params, runner, ids, mesh = setup
    mesh2 = Mesh(
        np.array(jax.devices()[:8]).reshape(4, 2), axis_names=("seq", "model")
    )
    press = StreamingLLMPress(compression_ratio=0.5, n_sink=2)
    shards = context_parallel_prefill(
        params, ids, runner=runner, press=press, mesh=mesh2,
        axis="seq", model_axis="model", quantized=True, kv_bits=8,
    )
    assert len(shards) == 6

    ref_press = ChunkPress(press=press, chunk_length=S // 4)
    _, cache, _ = runner.prefill(
        params, ids, press=ref_press, dtype=jnp.float32,
        quantized=True, kv_bits=8,
    )
    tok = ids[:, -1:]
    lg_ref, _, _ = runner.forward(params, tok, cache, logits_last_only=True)
    lg, shards, _, ovf, _ = context_parallel_decode_step(
        params, tok, shards, jnp.asarray(S, jnp.int32),
        runner=runner, mesh=mesh2, axis="seq", model_axis="model",
    )
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(lg)[:, 0], np.asarray(lg_ref)[:, 0], atol=3e-4, rtol=2e-3
    )


def test_rerotating_press_rejected(setup):
    """Key-rerotating presses renumber positions per shard — clashing ranges
    the split-KV combine can't reconcile; must fail loudly."""
    from kvpress_tpu.presses import KeyRerotationPress

    cfg, params, runner, ids, mesh = setup
    press = KeyRerotationPress(press=KnormPress(compression_ratio=0.5))
    with pytest.raises(AssertionError, match="rerotating"):
        context_parallel_prefill(params, ids, runner=runner, press=press,
                                 mesh=mesh)


@pytest.mark.parametrize("agg", [("max", "mean"), ("mean", "max")])
def test_context_parallel_kvcompose_matches_single_device(setup, agg):
    """Round 5 (the 128K-KVCompose multi-chip form): the doubled-sequence
    ring pass + query-rotating column sweep must reproduce the single-device
    re-feed's keep mask exactly, and the masked shards must decode to the
    single-device masked cache's logits."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from toy_tokenizer import ToyTokenizer

    from kvpress_tpu.parallel.context_prefill import context_parallel_kvcompose
    from kvpress_tpu.parallel.decode import context_parallel_decode_step
    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import KVComposePress

    cfg, params, runner, ids, mesh = setup
    agg_task, agg_group = agg
    press = KVComposePress(compression_ratio=0.5, structured=False,
                           agg_task=agg_task, agg_group=agg_group)

    keys, values, lengths, masks = context_parallel_kvcompose(
        params, ids, runner=runner, press=press, mesh=mesh
    )

    # single-device reference: pressless prefill + one-shot re-feed mask
    pipe = KVPressPipeline(runner, params, ToyTokenizer(cfg.vocab_size))
    ctx_ids = [int(t) for t in np.asarray(ids[0])]
    _, cache, _ = runner.prefill(params, ids, dtype=jnp.float32,
                                 max_size=2 * S + 8)
    ref_cache = pipe._run_kvcompose(cache, ctx_ids, press)

    np.testing.assert_array_equal(
        np.asarray(masks), np.asarray(ref_cache.mask[..., :S])
    )
    frac = (~np.asarray(masks)).mean()
    assert 0.3 < frac < 0.7, frac
    np.testing.assert_allclose(
        np.asarray(keys), np.asarray(ref_cache.keys[..., :S, :]),
        atol=2e-4, rtol=1e-3,
    )

    # distributed decode over the masked shards == single-device decode on
    # the masked cache (teacher-forced one step)
    from kvpress_tpu.parallel.decode import grow_shards

    tok = ids[:, -1:]
    shards = grow_shards((keys, values, lengths, masks), N, 4)
    sp_logits, _, _, ovf, _ = context_parallel_decode_step(
        params, tok, shards,
        jnp.asarray(S, jnp.int32), runner=runner, mesh=mesh,
    )
    assert int(ovf) == 0
    ref_dec = dataclasses.replace(ref_cache)
    from kvpress_tpu.cache import resize

    ref_dec = resize(ref_dec, S + 8)
    ref_logits, _, _ = runner.forward(params, tok, ref_dec,
                                      logits_last_only=True)
    np.testing.assert_allclose(
        np.asarray(sp_logits[:, -1], np.float32),
        np.asarray(ref_logits[:, -1], np.float32), atol=5e-3, rtol=5e-3,
    )
