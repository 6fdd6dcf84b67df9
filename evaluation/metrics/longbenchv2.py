"""LongBench-v2 multiple-choice accuracy
(reference benchmarks/longbenchv2/calculate_metrics.py)."""


def score(predicted_answer: str, expected_answer: str) -> bool:
    predicted_answer = predicted_answer.replace("*", "")
    return (
        f"The correct answer is ({expected_answer})" in predicted_answer
        or f"The correct answer is {expected_answer}" in predicted_answer
    )


def calculate_metrics(df) -> dict:
    df = df.copy()
    df["score"] = df.apply(
        lambda row: score(str(row["predicted_answer"]), str(row["answer"])), axis=1
    )
    metrics = {"average": float(df["score"].mean())}
    metrics.update(df.groupby("difficulty")["score"].mean().to_dict())
    metrics.update(df.groupby("length")["score"].mean().to_dict())
    return metrics
