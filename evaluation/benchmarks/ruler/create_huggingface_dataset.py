"""Build RULER from the upstream generator's jsonl output (reference:
evaluation/benchmarks/ruler/create_huggingface_dataset.py).

RULER ships a generator (github.com/hsiehjackson/RULER `generate.sh`) that
writes one jsonl per task per context length, with the context and question
concatenated in a single `input` field. Each task family has a fixed question
cue and answer cue (RULER scripts/data/synthetic templates); we split at the
LAST question-cue occurrence (needles repeat the cue wording inside the
haystack) and the first answer cue after it.

Usage:
    python create_huggingface_dataset.py --data-dir <RULER>/scripts/data/data \
        --repo-id <user>/ruler
(data-dir contains one subdirectory per context length, e.g. 4096/)
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import push, standardize

# Question/answer cues per task family, from the upstream RULER synthetic
# task templates (scripts/data/synthetic/constants.py).
CUES = {
    "niah": (r"What (?:is|are all) the special magic", r"The special magic"),
    "vt": (r"Question: Find all variables that are assigned the value",
           r"Answer:"),
    "cwe": (r"Question: What are the 10 most common words in the above list\?",
            r"Answer:"),
    "fwe": (r"Question: Do not provide any explanation\.", r"Answer:"),
    "qa": (r"Answer the question based on the given documents\.", r"Answer:"),
}
MAX_NEW_TOKENS = {"niah": 128, "vt": 30, "cwe": 120, "fwe": 50, "qa": 32}


def split_row(text: str, family: str) -> tuple[str, str, str]:
    q_cue, a_cue = (re.compile(p) for p in CUES[family])
    q_start = list(q_cue.finditer(text))[-1].start()
    context, rest = text[:q_start], text[q_start:]
    a_start = a_cue.search(rest).start()
    return context, rest[:a_start], rest[a_start:]


def build_length(path: Path):
    import pandas as pd

    frames = []
    for f in sorted(path.glob("**/*.jsonl")):
        task = f.parent.stem
        family = task.split("_")[0]
        df = pd.read_json(f, lines=True)
        parts = [split_row(t, family) for t in df["input"]]
        df["context"] = [p[0] for p in parts]
        df["question"] = [p[1] for p in parts]
        df["answer_prefix"] = [p[2] for p in parts]
        df["answer"] = df["outputs"].map(list)
        frames.append(standardize(df, task, MAX_NEW_TOKENS[family]))
    return pd.concat(frames)


def main(data_dir: str, repo_id: str):
    for path in sorted(Path(data_dir).glob("*/")):
        push(build_length(path), repo_id, config_name=path.stem)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--repo-id", required=True)
    a = ap.parse_args()
    main(a.data_dir, a.repo_id)
