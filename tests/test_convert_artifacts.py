"""Round-trip the reference ecosystem's artifact formats through
tools/convert_artifacts.py: build REAL reference-format artifacts in-process
(torch KVzapModel save_pretrained dirs, FastKVzip .pt gate files, PEFT-layout
safetensors, ExpectedAttentionStats mixin dirs), convert to the local npz
schemas, and assert score parity between the reference module and our press
applying the converted artifact.

Reference formats: kvzap_press.py:14-48, fastkvzip_press.py:23-128,
restorekv_press.py:46-59, expected_attention_with_stats.py:108-135.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.convert_artifacts import (  # noqa: E402
    convert_ea_stats,
    convert_fastkvzip,
    convert_kvzap,
    convert_restorekv,
)

L, E, HKV, HQ, D = 3, 64, 2, 4, 16
OUT = HKV  # kvzap output dim = num kv heads


def test_kvzap_linear_and_mlp_roundtrip(tmp_path):
    import jax.numpy as jnp

    from kvpress_tpu.presses.kvzap import kvzap_apply, load_kvzap_model

    for hidden_dim in (None, 32):
        torch.manual_seed(0)
        layers = []
        for _ in range(L):
            if hidden_dim is None:
                layers.append(torch.nn.Linear(E, OUT))
            else:
                layers.append(torch.nn.Sequential(
                    torch.nn.Linear(E, hidden_dim), torch.nn.GELU(),
                    torch.nn.Linear(hidden_dim, OUT)))
        model = torch.nn.Module()
        model.layers = torch.nn.ModuleList(layers)

        src = tmp_path / f"kvzap_{hidden_dim}"
        src.mkdir()
        # the reference's save_pretrained writes model.safetensors with these
        # exact keys (KVzapModel.layers is a ModuleList)
        from safetensors.torch import save_file

        save_file(model.state_dict(), str(src / "model.safetensors"))
        dst = str(tmp_path / f"kvzap_{hidden_dim}.npz")
        convert_kvzap(str(src), dst)
        surr = load_kvzap_model(dst)

        x = torch.randn(5, E)
        with torch.no_grad():
            for i in range(L):
                ref = layers[i](x).numpy()                     # (5, OUT)
                ours = kvzap_apply(surr, i, jnp.asarray(x.numpy())[None])
                np.testing.assert_allclose(
                    np.asarray(ours)[0].T, ref, rtol=1e-5, atol=1e-5
                )


def test_fastkvzip_gate_roundtrip(tmp_path):
    """Full gate-score parity: reference FastKVzipGate.forward vs our
    gate_scores on the converted artifact."""
    from tests.reference_oracle import load_reference

    load_reference()  # shims cachetools/fire before importing kvpress
    from kvpress.presses.fastkvzip_press import FastKVzipGate

    import jax.numpy as jnp

    from kvpress_tpu.presses.fastkvzip import gate_scores, load_fastkvzip_gates

    torch.manual_seed(1)
    G = HQ // HKV
    out_dim, sink = 16, 4
    mods = []
    for i in range(L):
        m = FastKVzipGate(i, E, HKV, G, torch.float32, out_dim, sink)
        # randomize the zero-init params so parity is non-trivial
        with torch.no_grad():
            m.k_base.normal_(0, 0.5)
            m.b.normal_(0, 0.5)
            m.q_norm.weight.normal_(1.0, 0.1)
            m.k_norm.weight.normal_(1.0, 0.1)
        mods.append(m)

    pt = str(tmp_path / "gates.pt")
    torch.save({"module": [m.state_dict() for m in mods]}, pt)
    dst = str(tmp_path / "gates.npz")
    convert_fastkvzip(pt, dst)
    gates = load_fastkvzip_gates(dst)

    x = torch.randn(1, 7, E)
    for i in range(L):
        with torch.no_grad():
            ref = mods[i](x).numpy()                        # (1, HKV, 7)
        ours = gate_scores(gates, i, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_restorekv_peft_roundtrip(tmp_path):
    from safetensors.torch import save_file

    from kvpress_tpu.presses.restorekv import load_restore_artifacts

    torch.manual_seed(2)
    r, alpha = 4, 12
    emb = torch.randn(8, E)
    src = tmp_path / "adapter"
    src.mkdir()
    save_file({"restore_embeddings": emb},
              str(src / "restore_embeddings.safetensors"))
    json.dump({"r": r, "lora_alpha": alpha, "peft_type": "LORA"},
              open(src / "adapter_config.json", "w"))

    sd = {}
    expect = {}
    dims = {"q_proj": HQ * D, "k_proj": HKV * D, "v_proj": HKV * D,
            "o_proj": E, "gate_proj": 2 * E, "up_proj": 2 * E,
            "down_proj": E}
    ins = {"q_proj": E, "k_proj": E, "v_proj": E, "o_proj": HQ * D,
           "gate_proj": E, "up_proj": E, "down_proj": 2 * E}
    for proj, out in dims.items():
        for i in range(L):
            a = torch.randn(r, ins[proj])          # PEFT lora_A: (r, in)
            b = torch.randn(out, r)                # PEFT lora_B: (out, r)
            sd[f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_A.weight"] = a
            sd[f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_B.weight"] = b
            expect[(proj, i)] = (b @ a).numpy()    # delta W (out, in)
    save_file(sd, str(src / "adapter_model.safetensors"))

    dst = str(tmp_path / "restore.npz")
    convert_restorekv(str(src), dst)
    emb2, lora, scaling = load_restore_artifacts(dst)

    assert scaling == pytest.approx(alpha / r)
    np.testing.assert_allclose(np.asarray(emb2), emb.numpy(), rtol=1e-6)
    from tools.convert_artifacts import PEFT_PROJ_MAP

    for proj, ours_name in PEFT_PROJ_MAP.items():
        for i in range(L):
            # ours: a (in, r) @ b (r, out) = delta^T
            delta = np.asarray(lora[ours_name]["a"][i]) @ np.asarray(
                lora[ours_name]["b"][i])
            np.testing.assert_allclose(
                delta, expect[(proj, i)].T, rtol=1e-5, atol=1e-6
            )


def test_ea_stats_roundtrip(tmp_path):
    from safetensors.torch import save_file

    from kvpress_tpu.presses.expected_attention_stats import load_query_stats

    torch.manual_seed(3)
    mu = torch.randn(L, HQ, D)
    cov = torch.randn(L, HQ, D, D)
    src = tmp_path / "stats"
    src.mkdir()
    # ExpectedAttentionStats (PyTorchModelHubMixin) state dict keys
    save_file({"query_mean": mu, "query_cov": cov},
              str(src / "model.safetensors"))
    dst = str(tmp_path / "stats.npz")
    convert_ea_stats(str(src), dst)
    stats = load_query_stats(dst)
    np.testing.assert_allclose(stats["mu"], mu.numpy(), rtol=1e-6)
    np.testing.assert_allclose(stats["cov"], cov.numpy(), rtol=1e-6)
