"""Per-dataset scorers (reference evaluation/benchmarks/*/calculate_metrics.py).

Each scorer takes a pandas DataFrame with at least ``predicted_answer`` and
``answer`` columns (plus dataset-specific columns) and returns a dict/list of
metric values, matching the reference's output shapes."""

from .boxed import calculate_metrics as boxed_metrics
from .longbench import calculate_metrics as longbench_metrics
from .longbench import calculate_metrics_e as longbench_e_metrics
from .longbenchv2 import calculate_metrics as longbenchv2_metrics
from .loogle import calculate_metrics as loogle_metrics
from .needle import calculate_metrics as needle_metrics
from .ruler import calculate_metrics as ruler_metrics
from .infinitebench import calculate_metrics as infinitebench_metrics
from .zero_scrolls import calculate_metrics as zero_scrolls_metrics

__all__ = [
    "boxed_metrics",
    "longbench_metrics",
    "longbench_e_metrics",
    "longbenchv2_metrics",
    "loogle_metrics",
    "needle_metrics",
    "ruler_metrics",
    "infinitebench_metrics",
    "zero_scrolls_metrics",
]
