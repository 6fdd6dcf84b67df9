"""RULER string-match metrics (reference benchmarks/ruler/calculate_metrics.py:10-43):
qa tasks use partial match (any reference found), others require all references."""

import re


def string_match_part(preds, refs):
    hits = sum(
        max(1.0 if r.lower() in p.lower() else 0.0 for r in ref)
        for p, ref in zip(preds, refs)
    )
    return round(hits / len(preds) * 100, 2)


def string_match_all(preds, refs):
    hits = sum(
        sum(1.0 if r.lower() in p.lower() else 0.0 for r in ref) / len(ref)
        for p, ref in zip(preds, refs)
    )
    return round(hits / len(preds) * 100, 2)


def calculate_metrics(df) -> dict:
    ctrl = re.compile(r"[\x00-\x1f]")
    df = df.copy()
    df["predicted_answer"] = df["predicted_answer"].apply(
        lambda x: ctrl.sub("", str(x).strip()).strip()
    )
    scores = {}
    for task, sub in df.groupby("task"):
        fn = string_match_part if task.split("_")[0] == "qa" else string_match_all
        scores[task] = {
            "string_match": fn(sub["predicted_answer"].tolist(), sub["answer"].tolist())
        }
    return scores
