"""Device mesh + sharding rules.

The reference has no parallelism of its own (SURVEY §2.8 — it delegates to HF
accelerate's layer placement). Here sharding is first-class: a ("data",
"model") mesh; attention/kv heads and MLP hidden shard over "model", batch
over "data"; KV-cache shards over heads so press scoring and compaction are
entirely shard-local (scores are per-kv-head). GSPMD inserts the two
all-reduces per layer (post-attention, post-MLP) over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache import KVCache
from ..config import ModelConfig


def make_mesh(
    data: int = 1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model, (
        f"need {data * model} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_hybrid(
    dcn: int = 1, data: int = 1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Multi-host ("dcn", "data", "model") mesh (SURVEY §2.8 DCN story).

    The DCN axis is OUTERMOST and carries only data parallelism: at serving
    time each DCN group handles its own batch shard (zero cross-host
    collectives on the inference path); at training time only the gradient
    psum crosses DCN — exactly the scaling-book hybrid recipe (FSDP/TP over
    ICI inside a slice, DP over DCN between slices). Model/tensor axes stay
    inside a slice so their per-layer all-reduces ride ICI.

    On real multi-slice topologies, build with
    ``mesh_utils.create_hybrid_device_mesh((data, model), (dcn, 1))`` so
    device order respects the physical DCN granularity; on a single host (or
    the virtual CPU mesh used in tests) a plain reshape is equivalent.
    """
    devices = devices if devices is not None else jax.devices()
    n = dcn * data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if dcn > 1 and getattr(devices[0], "platform", "") == "tpu":
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (data, model), (dcn, 1), devices=devices[:n]
        )
        arr = arr.reshape(dcn, data, model)
    else:
        arr = np.asarray(devices[:n]).reshape(dcn, data, model)
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def _batch_axes(mesh: Mesh):
    """Batch shards over every data-like axis present ("dcn" outermost)."""
    return tuple(a for a in ("dcn", "data") if a in mesh.axis_names) or (None,)


def layer_param_specs(layer_params: dict, mp) -> dict:
    """shard_map PartitionSpecs for the stacked per-layer params, with heads/
    ffn over model axis ``mp`` (None → replicated). Handles int8-weight
    ``*_scale`` entries (quantize_params_int8): a scale is (L, 1, out), so it
    follows its weight's OUTPUT-dim sharding — sharded with column-parallel
    weights (wq/wk/wv/wg/wu), replicated with row-parallel ones (wo/wd)."""
    col_sharded = {"wq", "wk", "wv", "wg", "wu", "bq", "bk", "bv"}
    row_sharded = {"wo", "wd"}

    def spec(name):
        if mp is None:
            return P()
        base = name[:-6] if name.endswith("_scale") else name
        if base in col_sharded:
            if name.endswith("_scale") or name.startswith("w"):
                return P(None, None, mp)
            return P(None, mp)
        if base in row_sharded:
            return P() if name.endswith("_scale") else P(None, mp, None)
        return P()

    return {k: spec(k) for k in layer_params}


def param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding pytree matching the stacked param layout (params are
    replicated across "dcn"/"data" — inference; a training FSDP axis would
    shard them further)."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    layer_rules = {
        "wq": ns(None, None, "model"),
        "wk": ns(None, None, "model"),
        "wv": ns(None, None, "model"),
        "wo": ns(None, "model", None),
        "bq": ns(None, "model"),
        "bk": ns(None, "model"),
        "bv": ns(None, "model"),
        "wg": ns(None, None, "model"),
        "wu": ns(None, None, "model"),
        "wd": ns(None, "model", None),
        "ln1": ns(None, None),
        "ln2": ns(None, None),
        "ln1_post": ns(None, None),
        "ln2_post": ns(None, None),
        "q_norm": ns(None, None),
        "k_norm": ns(None, None),
    }
    def rule(k):
        if k in layer_rules:
            return layer_rules[k]
        if k.endswith("_scale"):        # int8-weight scales follow the
            base = k[:-6]               # weight's output-dim sharding
            if base in ("wo", "wd"):
                return ns(None, None, None)
            return ns(None, None, "model")
        return ns()

    out = {
        "embed": ns(None, "model"),
        "ln_f": ns(None),
        "layers": {k: rule(k) for k in params["layers"]},
    }
    if "lm_head" in params:
        out["lm_head"] = ns(None, "model")
    if "embed_scale" in params:
        # per-ROW scale (V, 1): embed shards over the hidden dim, so the
        # row scale replicates
        out["embed_scale"] = ns(None, None)
    if "lm_head_scale" in params:
        # per-output-channel (1, V): follows lm_head's vocab sharding
        out["lm_head_scale"] = ns(None, "model")
    return out


def cache_shardings(mesh: Mesh, cache: KVCache) -> KVCache:
    """Shardings pytree for a KVCache: batch on "data", kv heads on "model"."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    batch = _batch_axes(mesh)
    kv = ns(None, batch, "model", None, None)
    return KVCache(
        keys=kv,
        values=kv,
        length=ns(None),
        offset=ns(),
        mask=None if cache.mask is None else ns(None, batch, "model", None),
        key_scales=None if cache.key_scales is None else kv,
        value_scales=None if cache.value_scales is None else kv,
        overflowed=None if cache.overflowed is None else ns(),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    return jax.device_put(params, param_shardings(mesh, params))


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    return jax.device_put(cache, cache_shardings(mesh, cache))


def data_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(_batch_axes(mesh), None))


def validate_tp(cfg: ModelConfig, model_parallel: int) -> None:
    assert cfg.num_kv_heads % model_parallel == 0, (
        f"num_kv_heads={cfg.num_kv_heads} must divide by model={model_parallel} "
        "(replicate KV or lower TP degree otherwise)"
    )
    assert cfg.intermediate_size % model_parallel == 0
