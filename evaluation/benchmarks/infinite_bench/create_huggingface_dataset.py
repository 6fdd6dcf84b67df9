"""Build InfiniteBench (12 tasks at 100K+ tokens; reference:
evaluation/benchmarks/infinite_bench/create_huggingface_dataset.py).

The prompt protocol (yarn_mistral_templates) is extracted from the upstream
OpenBMB/InfiniteBench ``src/prompt.py`` at build time by AST-parsing the
module — no template tables are inlined here. Each full template is split
into the runner's context/question/answer_prefix triple; choice tasks format
their options into the question.

Usage: python create_huggingface_dataset.py --repo-id <user>/infinitebench
"""

import argparse
import ast
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import push, split_full_template, standardize

PROMPT_PY = (
    "https://raw.githubusercontent.com/OpenBMB/InfiniteBench/main/src/prompt.py"
)
MAX_NEW_TOKENS = {
    "passkey": 6, "number_string": 12, "kv_retrieval": 50,
    "longbook_sum_eng": 1200, "longbook_choice_eng": 40,
    "longbook_qa_eng": 40, "longbook_qa_chn": 40, "longdialogue_qa_eng": 40,
    "math_find": 3, "math_calc": 30000, "code_run": 5, "code_debug": 5,
}


def fetch_templates() -> dict:
    with urllib.request.urlopen(PROMPT_PY) as r:
        tree = ast.parse(r.read().decode())
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", "") == "yarn_mistral_templates" for t in node.targets
        ):
            return ast.literal_eval(node.value)
    raise RuntimeError("yarn_mistral_templates not found in upstream prompt.py")


def main(repo_id: str):
    from datasets import load_dataset

    templates = fetch_templates()
    ds = load_dataset("xinrongzhang2022/InfiniteBench")
    for task, mnt in MAX_NEW_TOKENS.items():
        df = ds[task].to_pandas()
        ctx_tpl, q_tpl, ans_prefix = split_full_template(templates[task])
        df["context"] = df["context"].map(
            lambda x: ctx_tpl.replace("{context}", str(x))
        )

        def render_question(row, q_tpl=q_tpl):
            q = q_tpl.replace("{input}", str(row.get("input", "")))
            opts = list(row.get("options", []) or [])
            for letter, opt in zip("ABCD", opts):
                q = q.replace("{OPTION_%s}" % letter, str(opt))
            return q

        df["question"] = df.apply(render_question, axis=1)
        df["answer_prefix"] = ans_prefix
        df["answer"] = df["answer"].map(list)
        # +20 headroom as the evaluation protocol allows a short preamble
        push(standardize(df, task, mnt + 20), repo_id, config_name=task)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", required=True)
    main(ap.parse_args().repo_id)
