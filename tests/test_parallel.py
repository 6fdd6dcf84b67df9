"""Multi-device tests on the virtual 8-CPU mesh: tensor-parallel forward
equivalence, cache sharding, and ring attention vs the single-device
reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import kvpress_tpu as kp
from kvpress_tpu.ops.attention import attention_bias, gqa_attention
from kvpress_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    shard_cache,
    shard_params,
    validate_tp,
)
from kvpress_tpu.parallel.ring import context_parallel_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_ring_attention_matches_reference():
    B, Hq, Hkv, S, D = 2, 8, 4, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)

    bias = attention_bias(jnp.asarray(0, jnp.int32), S, S)
    ref, _ = gqa_attention(q, k, v, bias, D**-0.5)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("seq",))
    out = context_parallel_attention(q, k, v, mesh, axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_flash_attention_matches_reference():
    """Flash kernel inside the ring step (interpret mode on CPU) — the path
    that scales to 128K shards (ring.py ring_flash_self_attention)."""
    B, Hq, Hkv, S, D = 2, 8, 4, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)

    bias = attention_bias(jnp.asarray(0, jnp.int32), S, S)
    ref, _ = gqa_attention(q, k, v, bias, D**-0.5)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("seq",))
    out = context_parallel_attention(q, k, v, mesh, axis="seq", impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_tensor_parallel_forward_matches_single_device():
    cfg = kp.tiny_config(num_heads=8, num_kv_heads=4, intermediate_size=256)
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg, attn_impl="xla")
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    press = kp.KnormPress(compression_ratio=0.5)

    logits_ref, cache_ref, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, compute_logits=True
    )

    mesh = make_mesh(data=2, model=4)
    validate_tp(cfg, 4)
    sharded_params = shard_params(params, mesh)
    sharded_ids = jax.device_put(ids, data_sharding(mesh))

    import functools

    @functools.partial(jax.jit, static_argnames=("press",))
    def prefill(params, ids, press):
        return runner.prefill(
            params, ids, press=press, dtype=jnp.float32, compute_logits=True
        )

    with mesh:
        logits_tp, cache_tp, _ = prefill(sharded_params, sharded_ids, press)
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), atol=2e-4, rtol=1e-3
    )
    assert all(int(l) == 16 for l in cache_tp.length)


def test_tensor_parallel_int8_embeddings():
    """Fully-int8 params (layers + embedding + lm_head) shard over the
    (data, model) mesh: embed_scale replicates, lm_head_scale follows the
    head's vocab sharding, logits equal the single-device int8 run."""
    from kvpress_tpu.models.llama import quantize_params_int8

    cfg = kp.tiny_config(num_heads=8, num_kv_heads=4, intermediate_size=256,
                         tie_word_embeddings=False)
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params_int8(params, include_embeddings=True)
    runner = kp.Runner.create(cfg, attn_impl="xla")
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)

    logits_ref, _, _ = runner.prefill(
        params, ids, dtype=jnp.float32, compute_logits=True
    )
    logits_q, _, _ = runner.prefill(
        qparams, ids, dtype=jnp.float32, compute_logits=True
    )
    ref = np.abs(np.asarray(logits_ref)).max()
    assert np.abs(np.asarray(logits_q) - np.asarray(logits_ref)).max() < 0.05 * ref

    mesh = make_mesh(data=2, model=4)
    sq = shard_params(qparams, mesh)
    sharded_ids = jax.device_put(ids, data_sharding(mesh))

    @jax.jit
    def prefill(params, ids):
        return runner.prefill(params, ids, dtype=jnp.float32,
                              compute_logits=True)

    with mesh:
        logits_tp, _, _ = prefill(sq, sharded_ids)
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_q), atol=2e-4, rtol=1e-3
    )


def test_cache_sharding_roundtrip():
    cfg = kp.tiny_config(num_heads=8, num_kv_heads=4)
    mesh = make_mesh(data=2, model=4)
    from kvpress_tpu.cache import init_cache

    cache = init_cache(cfg, 2, 64, dtype=jnp.float32)
    sharded = shard_cache(cache, mesh)
    assert sharded.keys.sharding.spec == P(None, "data", "model", None, None)


def test_hybrid_dcn_mesh_matches_single_device():
    """("dcn", "data", "model") hybrid mesh (multi-host recipe, SURVEY §2.8):
    prefill+press+decode over dcn=2 x data=2 x model=2 equals single-device.
    DCN carries only the batch axis — the per-layer all-reduces stay on
    ("model",), i.e. inside a slice on real hardware."""
    from kvpress_tpu.parallel.mesh import make_mesh_hybrid

    cfg = kp.tiny_config(num_heads=4, num_kv_heads=2, intermediate_size=128)
    params = kp.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = kp.Runner.create(cfg, attn_impl="xla")
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, cfg.vocab_size)
    press = kp.KnormPress(compression_ratio=0.5)

    logits_ref, cache_ref, _ = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, compute_logits=True
    )

    mesh = make_mesh_hybrid(dcn=2, data=2, model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    sp = shard_params(params, mesh)
    si = jax.device_put(ids, data_sharding(mesh))

    import functools

    @functools.partial(jax.jit, static_argnames=("press",))
    def prefill(params, ids, press):
        return runner.prefill(
            params, ids, press=press, dtype=jnp.float32, compute_logits=True
        )

    with mesh:
        logits_h, cache_h, _ = prefill(sp, si, press)
        # decode a token on the mesh too
        tok = jnp.argmax(logits_h[:, -1:], axis=-1).astype(jnp.int32)
        lg_h, _, _ = runner.forward(params, tok, cache_h, logits_last_only=True)
    tok_ref = jnp.argmax(logits_ref[:, -1:], axis=-1).astype(jnp.int32)
    lg_ref, _, _ = runner.forward(params, tok_ref, cache_ref, logits_last_only=True)
    np.testing.assert_allclose(
        np.asarray(logits_h), np.asarray(logits_ref), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lg_h), np.asarray(lg_ref), atol=2e-4, rtol=1e-3
    )
    assert cache_h.keys.sharding.spec[1] == ("dcn", "data")
