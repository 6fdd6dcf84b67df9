"""Shared helpers for the benchmark dataset builders.

Every builder emits the evaluation schema the runner consumes
(evaluation/evaluate.py): columns ``context, question, answer_prefix, answer,
task, max_new_tokens`` — one hub config per benchmark variant. Mirrors the
reference's ``evaluation/benchmarks/*/create_huggingface_dataset.py`` output
contract; the transforms here are fresh implementations that pull prompt
protocol tables from each benchmark's upstream repository instead of inlining
them.
"""

from __future__ import annotations

import json
import urllib.request

COLUMNS = ["context", "question", "answer_prefix", "answer", "task", "max_new_tokens"]


def fetch_json(url: str) -> dict:
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def split_full_template(tpl: str) -> tuple[str, str, str]:
    """Split an upstream single-string prompt template into the runner's
    (context_template, question_template, answer_prefix) triple.

    Upstream benchmarks (LongBench dataset2prompt.json, LooGLE
    task2prompt.json) ship one template containing ``{context}``/``{input}``
    placeholders followed by an answer cue. The context part is everything
    through the context placeholder; the question part is the remainder up to
    the final answer cue line (which becomes answer_prefix — generation
    starts after it)."""
    for marker in ("{context}", "{input}"):
        if marker in tpl:
            head, tail = tpl.split(marker, 1)
            ctx_tpl = head + "{context}"
            break
    else:
        raise ValueError(f"no context placeholder in template: {tpl[:80]}")
    # answer cue = the last non-empty line without a placeholder, if it looks
    # like a prefix ("Answer:", "Summary:", …); else empty.
    lines = tail.rstrip().rsplit("\n", 1)
    if len(lines) == 2 and "{" not in lines[1] and lines[1].strip().endswith(":"):
        return ctx_tpl, lines[0] + "\n", lines[1]
    return ctx_tpl, tail, ""


def standardize(df, task: str, max_new_tokens: int):
    df = df.copy()
    df["task"] = task
    df["max_new_tokens"] = max_new_tokens
    for c in COLUMNS:
        assert c in df.columns, f"builder produced no `{c}` column"
    return df[COLUMNS].reset_index(drop=True)


def push(df, repo_id: str, config_name: str = "default", split: str = "test"):
    from datasets import Dataset

    Dataset.from_pandas(df).push_to_hub(
        repo_id=repo_id, config_name=config_name, split=split
    )
