"""LongBench metrics (reference benchmarks/longbench/calculate_metrics.py):
per-task metric dispatch — QA F1 (en/zh via jieba), ROUGE, classification,
retrieval, count, code-sim — with a length-bucketed "-e" variant.
fuzz.ratio is difflib-based (same algorithm family as fuzzywuzzy's pure-python
mode)."""

import re
import string
from collections import Counter
from difflib import SequenceMatcher

import numpy as np


def _fuzz_ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio() * 100


def normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def normalize_zh_answer(s: str) -> str:
    cn_punct = "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏."
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation + cn_punct))
    return "".join(s.split())


def _f1(pred_tokens, ref_tokens) -> float:
    common = Counter(pred_tokens) & Counter(ref_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_tokens)
    recall = num_same / len(ref_tokens)
    return 2 * precision * recall / (precision + recall)


def qa_f1_score(prediction, ground_truth, **kw) -> float:
    pred = normalize_answer(prediction).split()
    ref = normalize_answer(ground_truth).split()
    if not pred or not ref:
        return 0.0
    return _f1(pred, ref)


def qa_f1_zh_score(prediction, ground_truth, **kw) -> float:
    import jieba

    pred = [normalize_zh_answer(t) for t in jieba.cut(prediction, cut_all=False)]
    ref = [normalize_zh_answer(t) for t in jieba.cut(ground_truth, cut_all=False)]
    pred = [t for t in pred if t]
    ref = [t for t in ref if t]
    if not pred or not ref:
        return 0.0
    return _f1(pred, ref)


def rouge_score(prediction, ground_truth, **kw) -> float:
    from rouge import Rouge

    try:
        return Rouge().get_scores([prediction], [ground_truth], avg=True)["rouge-l"]["f"]
    except ValueError:
        return 0.0


def rouge_zh_score(prediction, ground_truth, **kw) -> float:
    import jieba

    p = " ".join(jieba.cut(prediction, cut_all=False))
    g = " ".join(jieba.cut(ground_truth, cut_all=False))
    return rouge_score(p, g)


def classification_score(prediction, ground_truth, all_classes=None, **kw) -> float:
    em_match_list = [c for c in (all_classes or []) if c in prediction]
    for match in list(em_match_list):
        if match in ground_truth and match != ground_truth:
            em_match_list.remove(match)
    if ground_truth in em_match_list:
        return 1.0 / len(em_match_list)
    return 0.0


def retrieval_score(prediction, ground_truth, **kw) -> float:
    pattern = r"Paragraph (\d+)"
    ref = re.findall(pattern, ground_truth)
    ref_id = ref[0] if ref else ""
    numbers = re.findall(r"\d+", prediction)
    return float(sum(1.0 for n in numbers if n == ref_id) / len(numbers)) if numbers else 0.0


def retrieval_zh_score(prediction, ground_truth, **kw) -> float:
    ref = re.findall(r"段落(\d+)", ground_truth)
    ref_id = ref[0] if ref else ""
    numbers = re.findall(r"\d+", prediction)
    return float(sum(1.0 for n in numbers if n == ref_id) / len(numbers)) if numbers else 0.0


def count_score(prediction, ground_truth, **kw) -> float:
    numbers = re.findall(r"\d+", prediction)
    if not numbers:
        return 0.0
    return float(sum(1.0 for n in numbers if n == str(ground_truth)) / len(numbers))


def code_sim_score(prediction, ground_truth, **kw) -> float:
    all_lines = prediction.lstrip("\n").split("\n")
    prediction = ""
    for line in all_lines:
        if ("`" not in line) and ("#" not in line) and ("//" not in line):
            prediction = line
            break
    return _fuzz_ratio(prediction, ground_truth) / 100


DATASET2METRIC = {
    "narrativeqa": qa_f1_score,
    "qasper": qa_f1_score,
    "multifieldqa_en": qa_f1_score,
    "multifieldqa_zh": qa_f1_zh_score,
    "hotpotqa": qa_f1_score,
    "2wikimqa": qa_f1_score,
    "musique": qa_f1_score,
    "dureader": rouge_zh_score,
    "gov_report": rouge_score,
    "qmsum": rouge_score,
    "multi_news": rouge_score,
    "vcsum": rouge_zh_score,
    "trec": classification_score,
    "triviaqa": qa_f1_score,
    "samsum": rouge_score,
    "lsht": classification_score,
    "passage_retrieval_en": retrieval_score,
    "passage_count": count_score,
    "passage_retrieval_zh": retrieval_zh_score,
    "lcc": code_sim_score,
    "repobench-p": code_sim_score,
}

_FIRSTLINE_TASKS = {"trec", "triviaqa", "samsum", "lsht"}


def _score_rows(task, predictions, answers, all_classes, strip_mode):
    scores = []
    for pred, refs in zip(predictions, answers):
        if task in _FIRSTLINE_TASKS:
            pred = pred.lstrip(strip_mode).split("\n")[0]
        best = 0.0
        for ref in refs:
            best = max(
                best,
                DATASET2METRIC[task](
                    pred.lstrip() if strip_mode is None else pred,
                    ref,
                    all_classes=all_classes,
                ),
            )
        scores.append(best)
    return scores


def calculate_metrics(df) -> float:
    task = df["task"].tolist()[0]
    all_classes = df["all_classes"].tolist()[0]
    scores = _score_rows(
        task, df["predicted_answer"].tolist(), df["answers"].tolist(),
        all_classes, strip_mode=None,
    )
    return round(100 * float(np.mean(scores)), 2)


def calculate_metrics_e(df) -> dict:
    task = df["task"].tolist()[0].removesuffix("-e")
    all_classes = df["all_classes"].tolist()[0]
    buckets = {"0-4k": [], "4-8k": [], "8k+": []}
    for (_, row) in df.iterrows():
        pred = str(row["predicted_answer"])
        if task in _FIRSTLINE_TASKS:
            pred = pred.lstrip("\n").split("\n")[0]
        best = max(
            (DATASET2METRIC[task](pred, ref, all_classes=all_classes)
             for ref in row["answers"]),
            default=0.0,
        )
        length = row["length"]
        key = "0-4k" if length < 4000 else ("4-8k" if length < 8000 else "8k+")
        buckets[key].append(best)
    return {k: round(100 * float(np.mean(v)), 2) if v else 0.0 for k, v in buckets.items()}
