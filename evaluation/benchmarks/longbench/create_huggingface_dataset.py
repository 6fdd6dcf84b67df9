"""Build the LongBench evaluation dataset (reference:
evaluation/benchmarks/longbench/create_huggingface_dataset.py — this version
pulls the per-task prompt protocol from the upstream LongBench repo instead of
inlining it, then splits each template into the runner's
context/question/answer_prefix triple).

Usage (network required):
    python create_huggingface_dataset.py --repo-id <user>/longbench
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import fetch_json, push, split_full_template, standardize

RAW = "https://raw.githubusercontent.com/THUDM/LongBench/main/LongBench/config"


def main(repo_id: str, version: str = "v1"):
    import pandas as pd
    from datasets import load_dataset

    prompts = fetch_json(f"{RAW}/dataset2prompt.json")
    maxlens = fetch_json(f"{RAW}/dataset2maxlen.json")

    for suffix, config in (("", "default"), ("_e", "e")):
        frames = []
        for task, tpl in prompts.items():
            try:
                ds = load_dataset("THUDM/LongBench", task + suffix, split="test")
            except ValueError:
                continue  # task has no _e variant
            df = ds.to_pandas()
            ctx_tpl, q_tpl, ans_prefix = split_full_template(tpl)
            df["question"] = df["input"].map(
                lambda x: q_tpl.replace("{input}", str(x))
            )
            df["context"] = df["context"].map(
                lambda x: ctx_tpl.replace("{context}", str(x))
            )
            df["answer_prefix"] = ans_prefix
            df["answer"] = df["answers"].map(list)
            frames.append(standardize(df, task, int(maxlens[task])))
        if frames:
            push(pd.concat(frames), repo_id, config_name=config)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", required=True)
    main(ap.parse_args().repo_id)
