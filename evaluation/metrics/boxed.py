"""Boxed-answer exact match for AIME25 / MATH500
(reference benchmarks/aime25/calculate_metrics.py)."""


def extract_boxed(text: str):
    if "boxed{" not in text:
        return None
    return str(text.split("boxed{")[-1].split("}")[0])


def calculate_metrics(df) -> dict:
    correct = sum(
        extract_boxed(str(row["predicted_answer"])) == str(row["answer"])
        for _, row in df.iterrows()
    )
    answered = sum("boxed{" in str(p) for p in df["predicted_answer"])
    return {
        "correct": int(correct),
        "answered": int(answered),
        "accuracy": correct / len(df),
        "total": len(df),
    }
