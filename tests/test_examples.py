"""Every example script must stay runnable (they are the notebook-equivalent
documentation surface, examples/README.md)."""

import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.parametrize(
    "name",
    [
        "custom_press",
        "per_layer_compression",
        "expected_attention_demo",
        "pipeline_quickstart",
        "decoding_press_demo",
        "speed_and_memory",
        "distributed_serving",
        "long_context_composition",
    ],
)
def test_example_runs(name, capsys):
    runpy.run_path(str(EXAMPLES / f"{name}.py"), run_name="__main__")
    assert capsys.readouterr().out.strip()


def test_evaluation_offline_example_runs(capsys, monkeypatch):
    monkeypatch.setenv("KVPRESS_QUICK", "1")
    runpy.run_path(str(EXAMPLES / "evaluation_offline.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "streaming_llm" in out
