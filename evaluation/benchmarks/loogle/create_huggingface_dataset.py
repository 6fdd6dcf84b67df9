"""Build LooGLE (long-dependency QA / cloze / summarization; reference:
evaluation/benchmarks/loogle/create_huggingface_dataset.py — prompt protocol
pulled from the upstream bigai-nlco/LooGLE config at build time).

Usage: python create_huggingface_dataset.py --repo-id <user>/loogle
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import fetch_json, push, split_full_template, standardize

RAW = "https://raw.githubusercontent.com/bigai-nlco/LooGLE/main/config"
TASKS = ["shortdep_qa", "longdep_qa", "shortdep_cloze", "longdep_summarization"]


def main(repo_id: str):
    import pandas as pd
    from datasets import load_dataset

    prompts = fetch_json(f"{RAW}/task2prompt.json")
    maxlens = fetch_json(f"{RAW}/task2maxlen.json")

    for task in TASKS:
        df = load_dataset(
            "bigainlco/LooGLE", task, split="test", trust_remote_code=True
        ).to_pandas()
        if task == "longdep_summarization":
            df = df.rename(columns={"output": "answer", "input": "context"})
            df["question"] = ""
        else:
            # one row per QA pair; qa_pairs is a python-literal string
            df["qa_pairs"] = df["qa_pairs"].map(
                lambda x: eval(x) if x != "none" else [{"Q": "", "A": ""}]
            )
            df = df.explode("qa_pairs", ignore_index=True)
            df["question"] = df["qa_pairs"].map(lambda d: d.get("Q", ""))
            df["answer"] = df["qa_pairs"].map(lambda d: d.get("A", ""))
            df = df.rename(columns={"input": "context"})
            if task == "shortdep_cloze":
                df["answer"] = df["answer"].map(
                    lambda a: json.dumps(a, ensure_ascii=False)
                )
        ctx_tpl, q_tpl, ans_prefix = split_full_template(prompts[task])
        df["context"] = df["context"].map(
            lambda x: ctx_tpl.replace("{input}", str(x)).replace("{context}", str(x))
        )
        df["question"] = df["question"].map(
            lambda x: q_tpl.replace("{Q}", str(x))
        )
        df["answer_prefix"] = ans_prefix
        push(standardize(pd.DataFrame(df), task, int(maxlens[task])),
             repo_id, config_name=task)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", required=True)
    main(ap.parse_args().repo_id)
