"""InfiniteBench per-task scoring (reference
benchmarks/infinite_bench/calculate_metrics.py; upstream
github.com/OpenBMB/InfiniteBench). Covers the retrieval/code/math/QA tasks."""

import re

import numpy as np

from .longbench import normalize_answer, _f1


def _first_int(pred: str) -> str:
    for tok in re.split(r"[^0-9]", pred):
        if tok:
            return tok
    return ""


def _strip_label(label):
    return label[0] if isinstance(label, (list, tuple, np.ndarray)) else label


def score_passkey(pred, label) -> bool:
    return str(_strip_label(label)) == _first_int(str(pred))


score_number_string = score_passkey


def score_kv_retrieval(pred, label) -> bool:
    label = _strip_label(label)
    for c in ["\n", ":", '"', "'", ".", ",", "?", "!", "{", "}"]:
        pred = pred.replace(c, " ")
    return label in pred.split()


def score_code_run(pred, label) -> bool:
    label = _strip_label(label)
    pred = pred.strip()
    for c in ["\n", ".", "`", "'", '"', ":"]:
        pred = pred.replace(c, " ")
    words = pred.split()
    if not words:
        return False
    try:
        return int(label) == int(words[-1])
    except (ValueError, TypeError):
        return False


def score_code_debug(pred, label) -> bool:
    pred = pred.strip()
    fn_name, label_c = label[0], label[1]
    m = re.search(r"\b[A-J]\b(?!.*\b[A-J]\b)", pred)
    if m and m.group(0) == label_c:
        return True
    for c in ["\n", "`", "'", '"', "-", "*", "Option", "option"]:
        pred = pred.replace(c, " ")
    pred = re.sub(r"  +", " ", pred).strip()
    if pred.startswith(label_c) or pred.startswith(fn_name):
        return True
    for prefix in ("answer is:", "is:", "answer:", "correct option is:"):
        idx = pred.find(prefix)
        if idx == -1:
            continue
        tail = pred[idx + len(prefix) + 1 :]
        return tail.startswith(label_c) or tail.startswith(fn_name)
    return False


def score_math_find(pred, label) -> bool:
    label = _strip_label(label)
    m = re.search(r"\d+\.\d+|\d+", pred)
    if m is None:
        return False
    value = m.group(0).strip()
    try:
        if isinstance(label, float) or (isinstance(label, str) and "." in str(label)):
            return float(value) == float(label)
        return int(float(value)) == int(label)
    except ValueError:
        return False


def score_longdialogue_qa(pred, label) -> float:
    pred = pred.strip().upper()
    labels = label if isinstance(label, (list, tuple, np.ndarray)) else [label]
    return 1.0 if any(str(x).upper() in pred for x in labels) else 0.0


def score_longbook_choice(pred, label) -> bool:
    labels = label if isinstance(label, (list, tuple, np.ndarray)) else [label]
    return any(str(x) in pred for x in labels)


def score_longbook_qa(pred, label) -> float:
    labels = label if isinstance(label, (list, tuple, np.ndarray)) else [label]
    p = normalize_answer(str(pred)).split()
    best = 0.0
    for ref in labels:
        r = normalize_answer(str(ref)).split()
        if p and r:
            best = max(best, _f1(p, r))
    return best


TASK_SCORERS = {
    "passkey": score_passkey,
    "number_string": score_number_string,
    "kv_retrieval": score_kv_retrieval,
    "code_run": score_code_run,
    "code_debug": score_code_debug,
    "math_find": score_math_find,
    "longdialogue_qa_eng": score_longdialogue_qa,
    "longbook_choice_eng": score_longbook_choice,
    "longbook_qa_eng": score_longbook_qa,
    "longbook_qa_chn": score_longbook_qa,
}


def calculate_metrics(df) -> dict:
    scores = {}
    for task, sub in df.groupby("task"):
        fn = TASK_SCORERS.get(task)
        if fn is None:
            continue
        vals = [
            float(fn(str(row["predicted_answer"]), row["answer"]))
            for _, row in sub.iterrows()
        ]
        scores[task] = round(100 * float(np.mean(vals)), 2)
    return scores
