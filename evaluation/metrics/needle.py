"""Needle-in-haystack: ROUGE of the generated answer against the needle
(reference benchmarks/needle_in_haystack/calculate_metrics.py)."""


def calculate_metrics(df) -> list:
    from rouge import Rouge

    scorer = Rouge()
    out = []
    for _, row in df.iterrows():
        out.append(
            scorer.get_scores(
                str(row["needle"]).strip(), str(row["predicted_answer"]).strip()
            )[0]
        )
    return out
