"""RestoreKVPress (reference restorekv_press.py, arXiv:2608.01247): KVzip with
learned restoration — before eviction, n restore-token embeddings attend to
the full cache in one LoRA-adapted pass, appending a context-conditioned
restore cache; eviction then runs budget-matched (ratio + n/ctx_len).

Artifacts (restore embeddings + LoRA A/B factors per projection, stacked over
layers) load from a local .npz; the reference fetches PEFT adapters from
``higokri/RestoreKV-<model>``."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import content_hash_eq
from .kvzip import KVzipPress

LORA_TARGETS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def apply_lora(params: dict, lora: dict, scaling: float = 2.0) -> dict:
    """Merged params' = W + scaling · A @ B for each adapted projection.
    lora: {name: {"a": (L, in, r), "b": (L, r, out)}}."""
    layers = dict(params["layers"])
    for name, ab in lora.items():
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scaling
        layers[name] = params["layers"][name] + delta.astype(
            params["layers"][name].dtype
        )
    out = dict(params)
    out["layers"] = layers
    return out


def init_random_lora(key, cfg, rank: int = 8, targets=("wq", "wk", "wv", "wo")):
    """Random adapter (reference test fixture installs a random PEFT LoRA,
    tests/default_presses.py:86-99)."""
    E, F = cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, D, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    dims = {
        "wq": (E, Hq * D), "wk": (E, Hkv * D), "wv": (E, Hkv * D),
        "wo": (Hq * D, E), "wg": (E, F), "wu": (E, F), "wd": (F, E),
    }
    lora = {}
    for i, name in enumerate(targets):
        i_dim, o_dim = dims[name]
        k = jax.random.fold_in(key, i)
        lora[name] = {
            "a": jax.random.normal(k, (L, i_dim, rank)) * 0.01,
            "b": jnp.zeros((L, rank, o_dim)),
        }
    return lora


def save_restore_artifacts(path: str, embeddings, lora: dict,
                           scaling: float = 2.0) -> None:
    flat = {"restore_embeddings": np.asarray(embeddings),
            "lora_scaling": np.asarray(scaling, np.float32)}
    for name, ab in lora.items():
        flat[f"lora_{name}_a"] = np.asarray(ab["a"])
        flat[f"lora_{name}_b"] = np.asarray(ab["b"])
    np.savez(path, **flat)


def load_restore_artifacts(path: str):
    """→ (embeddings, lora, scaling) — scaling is PEFT's lora_alpha/r
    (reference loads it from adapter_config.json via model.load_adapter)."""
    d = np.load(path)
    embeddings = jnp.asarray(d["restore_embeddings"])
    scaling = float(d["lora_scaling"]) if "lora_scaling" in d.files else 2.0
    lora = {}
    for k in d.files:
        if k.startswith("lora_") and k.endswith("_a"):
            name = k[len("lora_"):-2]
            lora[name] = {"a": jnp.asarray(d[k]), "b": jnp.asarray(d[f"lora_{name}_b"])}
    return embeddings, lora, scaling


@content_hash_eq
@dataclasses.dataclass(frozen=True)
class RestoreKVPress(KVzipPress):
    restore_embeddings: Optional[jax.Array] = None    # (n_restore, E)
    lora: Optional[dict] = None
    lora_scaling: float = 2.0

    @property
    def num_restore_tokens(self) -> int:
        return 0 if self.restore_embeddings is None else self.restore_embeddings.shape[0]

    def max_kept(self, seq_len: int, cfg) -> int:
        # The restore pass appends n uncompressible slots.
        return seq_len + self.num_restore_tokens
