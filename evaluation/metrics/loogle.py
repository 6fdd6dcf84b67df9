"""LooGLE metrics (reference benchmarks/loogle/calculate_metrics.py):
BLEU-1/4, ROUGE-1/2/L recall, METEOR; bert_score gated on availability.
Short-dependency QA additionally gets exact/partial match over the literal
answer list."""

import ast

import numpy as np


def get_bleu_score(reference: str, hypothesis: str) -> dict:
    from nltk.translate.bleu_score import sentence_bleu

    ref = reference.replace("\n", " ").split()
    hyp = hypothesis.replace("\n", " ").split()
    return {
        "bleu1": sentence_bleu([ref], hyp, weights=(1, 0, 0, 0)),
        "bleu4": sentence_bleu([ref], hyp, weights=(0, 0, 0, 1)),
    }


def get_rouge_score(reference: str, hypothesis: str, metric: str = "r") -> dict:
    from rouge import Rouge

    r = Rouge().get_scores(hyps=[hypothesis], refs=[reference])[0]
    return {k: r[k][metric] for k in ("rouge-1", "rouge-2", "rouge-l")}


def get_meteor_score(reference: str, hypothesis: str) -> dict:
    from nltk.translate.meteor_score import single_meteor_score

    ref = reference.replace("\n", " ").split()
    hyp = hypothesis.replace("\n", " ").split()
    return {"meteor": float(single_meteor_score(set(ref), set(hyp)))}


def get_exact_match(reference: str, hypothesis: str) -> tuple[int, int]:
    # The reference uses eval() on the answer list; ast.literal_eval is the
    # safe equivalent for the list-literal answers the datasets contain.
    try:
        answers = ast.literal_eval(reference)
    except (ValueError, SyntaxError):
        answers = [reference]
    if not isinstance(answers, (list, tuple)):
        answers = [answers]
    count = len(answers)
    exact = sum(1 for a in answers if str(a) in hypothesis)
    return exact, count


def calculate_metrics(df) -> dict:
    task = df["task"].tolist()[0] if "task" in df else "longdep_qa"
    rows = []
    exact, partial, total = 0, 0, 0
    for _, row in df.iterrows():
        ref = str(row["answer"])
        hyp = str(row["predicted_answer"])
        if not hyp.strip():
            continue
        scores = {}
        try:
            scores.update(get_bleu_score(ref, hyp))
            scores.update(get_rouge_score(ref, hyp))
            scores.update(get_meteor_score(ref, hyp))
        except ValueError:
            continue
        try:
            from bert_score import score as bert_score_fn

            _, _, f1 = bert_score_fn([hyp], [ref], lang="en")
            scores["bert"] = float(f1[0])
        except ImportError:
            pass
        if task == "shortdep_qa":
            e, c = get_exact_match(ref, hyp)
            exact += e
            total += c
            partial += e
        rows.append(scores)
    out = {
        k: float(np.mean([r[k] for r in rows])) for k in (rows[0].keys() if rows else [])
    }
    if total:
        out["exact_match"] = exact / total
    return out
