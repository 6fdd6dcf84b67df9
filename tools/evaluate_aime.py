"""AIME sampling evaluation with decode-time compression (reference
kvzap/evaluate_aime.py): temp-0.6 / top-p-0.95 sampling with
DMSPress(KVzapPress, decoding=True), boxed-answer accuracy.

Usage:
    python tools/evaluate_aime.py --model <path> --kvzap_artifact kvzap.npz \
        --threshold -4 --n_samples 4
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "evaluation"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", default="alessiodevoto/aime25")
    p.add_argument("--kvzap_artifact", default=None)
    p.add_argument("--threshold", type=float, default=-4.0)
    p.add_argument("--sliding_window_size", type=int, default=128)
    p.add_argument("--max_new_tokens", type=int, default=8192)
    p.add_argument("--temperature", type=float, default=0.6)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--fraction", type=float, default=1.0)
    p.add_argument("--output", default="results/aime.json")
    args = p.parse_args()

    from datasets import load_dataset

    from kvpress_tpu.pipeline import KVPressPipeline
    from kvpress_tpu.presses import DMSPress, KVzapPress, load_kvzap_model
    from metrics.boxed import extract_boxed

    pipe = KVPressPipeline.from_pretrained(args.model)
    press = None
    if args.kvzap_artifact:
        press = DMSPress(
            press=KVzapPress(surrogate=load_kvzap_model(args.kvzap_artifact)),
            threshold=args.threshold,
            sliding_window_size=args.sliding_window_size,
            decoding=True,
        )

    df = load_dataset(args.dataset, split="test").to_pandas()
    if args.fraction < 1.0:
        df = df.sample(frac=args.fraction, random_state=0)

    correct, answered, total = 0, 0, 0
    records = []
    for _, row in df.iterrows():
        for sample_idx in range(args.n_samples):
            out = pipe(
                row.get("context", ""),
                question=row["question"],
                press=press,
                max_new_tokens=args.max_new_tokens,
                do_sample=True,
                temperature=args.temperature,
                top_p=args.top_p,
                seed=sample_idx,
            )
            pred = out["answer"]
            ok = extract_boxed(pred) == str(row["answer"])
            correct += ok
            answered += "boxed{" in pred
            total += 1
            records.append({"question": row["question"][:80], "ok": bool(ok)})

    metrics = {
        "correct": correct,
        "answered": answered,
        "total": total,
        "accuracy": correct / max(total, 1),
    }
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps({"metrics": metrics, "records": records}, indent=2))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
