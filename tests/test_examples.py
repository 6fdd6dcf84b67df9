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
    ],
)
def test_example_runs(name, capsys):
    runpy.run_path(str(EXAMPLES / f"{name}.py"), run_name="__main__")
    assert capsys.readouterr().out.strip()
