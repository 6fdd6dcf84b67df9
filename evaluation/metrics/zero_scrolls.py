"""ZeroScrolls: the reference returns no in-tree metrics for this suite
(benchmarks/zero_scrolls/calculate_metrics.py returns {}); scoring happens on
the external leaderboard."""


def calculate_metrics(df) -> dict:
    return {}
