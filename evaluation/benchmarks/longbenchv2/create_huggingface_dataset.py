"""Build LongBench-v2 (4-choice QA over very long contexts; reference:
evaluation/benchmarks/longbenchv2/create_huggingface_dataset.py).

Usage: python create_huggingface_dataset.py --repo-id <user>/longbench-v2
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import push, standardize

CTX = (
    "Please read the following text and answer the question below.\n"
    "<text>\n{context}\n</text>\n\n"
)
Q = (
    "What is the correct answer to this question: {question}\nChoices:\n"
    "(A) {A}\n(B) {B}\n(C) {C}\n(D) {D}\n\n"
    'Format your response as follows: "The correct answer is (insert answer here)."'
)


def main(repo_id: str):
    from datasets import load_dataset

    df = load_dataset("THUDM/LongBench-v2", split="train").to_pandas()
    df["context"] = df["context"].map(lambda x: CTX.format(context=x))
    df["question"] = df.apply(
        lambda r: Q.format(question=r["question"], A=r["choice_A"],
                           B=r["choice_B"], C=r["choice_C"], D=r["choice_D"]),
        axis=1,
    )
    df["answer_prefix"] = ""
    push(standardize(df, "longbench-v2", 16), repo_id, config_name="0shot")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", required=True)
    main(ap.parse_args().repo_id)
