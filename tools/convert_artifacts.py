"""Convert the reference ecosystem's published trained artifacts (torch /
safetensors / PEFT formats) into kvpress_tpu's local npz schemas, so hub
artifacts are usable on TPU without torch on the inference path.

Formats handled (reference file:line for each):

  kvzap      nvidia/KVzap-{linear,mlp}-<model> — a KVzapModel PreTrainedModel
             dir (kvzap_press.py:14-48,64-68); state dict keys
             ``layers.{i}.weight`` (linear) or ``layers.{i}.{0,2}.weight``
             (MLP) → stacked {"w","b"} / {"w1","b1","w2","b2"} npz
             (presses/kvzap.py schema; torch Linear stores (out,in) —
             transposed here).
  fastkvzip  Jang-Hyun/Fast-KVzip ``<model>/q{G}_dim16_sink16.pt`` —
             torch.load(...)["module"] = per-layer FastKVzipGate state dicts
             (fastkvzip_press.py:23-106,121-128) → stacked gates npz
             (presses/fastkvzip.py schema).
  restorekv  higokri/RestoreKV-<model> — restore_embeddings.safetensors +
             PEFT adapter (adapter_model.safetensors + adapter_config.json,
             restorekv_press.py:46-59) → save_restore_artifacts npz with
             lora {"a": (L,in,r), "b": (L,r,out)} per projection and
             scaling = lora_alpha / r.
  ea_stats   alessiodevoto/exp_att_stats_* — ExpectedAttentionStats hub-mixin
             dir with query_mean/query_cov parameters
             (expected_attention_with_stats.py:108-135) → {"mu","cov"} npz
             (presses/expected_attention_stats.py schema).
  qfilter    nthngdy/<model>_qfilt safetensors — already readable directly by
             presses/qfilter.py:load_q_filters; listed here for completeness.

Usage:
  python tools/convert_artifacts.py kvzap     <model_dir_or_file> out.npz
  python tools/convert_artifacts.py fastkvzip <gates.pt>          out.npz
  python tools/convert_artifacts.py restorekv <adapter_dir>       out.npz
  python tools/convert_artifacts.py ea_stats  <stats_dir_or_file> out.npz
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# PEFT adapter key → our stacked-layer projection name (models/llama.py).
PEFT_PROJ_MAP = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "wg", "up_proj": "wu", "down_proj": "wd",
}


def _load_torch_state(path: str) -> dict:
    """State dict from a HF model dir / .safetensors / .pt / .bin file."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "adapter_model.safetensors",
                     "pytorch_model.bin", "pytorch_model.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no weights file found in {path}")
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "module" in obj:     # FastKVzip .pt wrapper
        return obj
    return {k: v for k, v in obj.items()}


def _np(t) -> np.ndarray:
    """torch tensor / np array → float32 numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().to("cpu").float().numpy()


def convert_kvzap(src: str, dst: str) -> dict:
    sd = _load_torch_state(src)
    sd = {k: _np(v) for k, v in sd.items()}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    # linear keys: layers.{i}.weight (3 parts); MLP: layers.{i}.{0,2}.weight
    mlp = any(len(k.split(".")) == 4 for k in sd if k.startswith("layers."))
    if mlp:
        out = {
            # torch Linear weight is (out, in): transpose to our (in, out)
            "w1": np.stack([sd[f"layers.{i}.0.weight"].T for i in range(n_layers)]),
            "b1": np.stack([sd[f"layers.{i}.0.bias"] for i in range(n_layers)]),
            "w2": np.stack([sd[f"layers.{i}.2.weight"].T for i in range(n_layers)]),
            "b2": np.stack([sd[f"layers.{i}.2.bias"] for i in range(n_layers)]),
        }
    else:
        out = {
            "w": np.stack([sd[f"layers.{i}.weight"].T for i in range(n_layers)]),
            "b": np.stack([sd[f"layers.{i}.bias"] for i in range(n_layers)]),
        }
    np.savez(dst, **out)
    return out


def convert_fastkvzip(src: str, dst: str) -> dict:
    obj = _load_torch_state(src)
    per_layer = obj["module"] if isinstance(obj, dict) and "module" in obj else obj
    L = len(per_layer)
    sds = [{k: _np(v) for k, v in sd.items()} for sd in per_layer]
    gates = {
        "wq": np.stack([sd["q_proj.weight"].T for sd in sds]),
        "bq": np.stack([sd["q_proj.bias"] for sd in sds]),
        "wk": np.stack([sd["k_proj.weight"].T for sd in sds]),
        "q_norm": np.stack([sd["q_norm.weight"] for sd in sds]),
        "k_norm": np.stack([sd["k_norm.weight"] for sd in sds]),
        "k_base": np.stack([sd["k_base"] for sd in sds]),
        "b": np.stack([sd["b"] for sd in sds]),
    }
    assert gates["k_base"].shape[0] == L
    np.savez(dst, **gates)
    return gates


def convert_restorekv(src_dir: str, dst: str) -> tuple:
    from safetensors import safe_open

    emb_path = os.path.join(src_dir, "restore_embeddings.safetensors")
    with safe_open(emb_path, framework="np") as f:
        embeddings = f.get_tensor("restore_embeddings").astype(np.float32)

    cfg_path = os.path.join(src_dir, "adapter_config.json")
    scaling = 2.0
    if os.path.exists(cfg_path):
        acfg = json.load(open(cfg_path))
        scaling = acfg.get("lora_alpha", 16) / acfg.get("r", 8)

    sd = {k: _np(v) for k, v in _load_torch_state(src_dir).items()}
    # keys: base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
    per_proj: dict = {}
    for k, v in sd.items():
        if ".lora_A." not in k and ".lora_B." not in k:
            continue
        parts = k.split(".")
        i = int(parts[parts.index("layers") + 1])
        proj = next(p for p in parts if p in PEFT_PROJ_MAP)
        ab = "a" if ".lora_A." in k else "b"
        # PEFT stores lora_A as (r, in) and lora_B as (out, r); ours is
        # a: (in, r), b: (r, out) — transpose both.
        per_proj.setdefault(PEFT_PROJ_MAP[proj], {}).setdefault(ab, {})[i] = v.T
    lora = {}
    for name, ab in per_proj.items():
        L = 1 + max(ab["a"])
        lora[name] = {
            "a": np.stack([ab["a"][i] for i in range(L)]),
            "b": np.stack([ab["b"][i] for i in range(L)]),
        }

    from kvpress_tpu.presses.restorekv import save_restore_artifacts

    save_restore_artifacts(dst, embeddings, lora, scaling=scaling)
    return embeddings, lora, scaling


def convert_ea_stats(src: str, dst: str) -> dict:
    sd = {k: _np(v) for k, v in _load_torch_state(src).items()}
    stats = {"mu": sd["query_mean"], "cov": sd["query_cov"]}
    np.savez(dst, **stats)
    return stats


CONVERTERS = {
    "kvzap": convert_kvzap,
    "fastkvzip": convert_fastkvzip,
    "restorekv": convert_restorekv,
    "ea_stats": convert_ea_stats,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=sorted(CONVERTERS))
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args()
    CONVERTERS[args.kind](args.src, args.dst)
    print(f"converted {args.kind}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
