"""Build ZeroSCROLLS (10 zero-shot long-context tasks; reference:
evaluation/benchmarks/zero_scrolls/create_huggingface_dataset.py). The
upstream dataset marks the document/query boundaries with character indices,
so the split into context/question/answer_prefix is exact.

Usage: python create_huggingface_dataset.py --repo-id <user>/zero_scrolls
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import push, standardize

MAX_NEW_TOKENS = {
    "gov_report": 1024, "summ_screen_fd": 512, "qmsum": 512, "qasper": 128,
    "narrative_qa": 64, "quality": 10, "musique": 32, "squality": 512,
    "space_digest": 36, "book_sum_sort": 256,
}


def main(repo_id: str):
    import pandas as pd
    from datasets import load_dataset

    frames = []
    for task, mnt in MAX_NEW_TOKENS.items():
        df = load_dataset("tau/zero_scrolls", task, split="test").to_pandas()
        de = df["document_end_index"]
        qe = df["query_end_index"]
        df["context"] = [t[:d] for t, d in zip(df["input"], de)]
        df["question"] = [t[d:q] for t, d, q in zip(df["input"], de, qe)]
        df["answer_prefix"] = [t[q:].strip() for t, q in zip(df["input"], qe)]
        df["answer"] = ""
        frames.append(standardize(df, task, mnt))
    push(pd.concat(frames), repo_id)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", required=True)
    main(ap.parse_args().repo_id)
