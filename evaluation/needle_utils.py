"""Needle-in-haystack dataset builder (reference
benchmarks/needle_in_haystack/utils.py:13-90): token-level needle insertion at
each requested depth, one row per depth."""

from __future__ import annotations

from typing import Optional

import pandas as pd

CONTEXT_WRAPPER = "This is a very long story book: <book> {context} </book>."


def insert_needle_in_haystack(
    df: pd.DataFrame,
    tokenizer,
    max_context_length: int,
    needle_depth,
    context_wrapper: str = CONTEXT_WRAPPER,
    needle_text: Optional[str] = None,
    answer_prefix: Optional[str] = None,
    question_text: Optional[str] = None,
) -> pd.DataFrame:
    original_context = df["context"][0]
    needle_text = needle_text or df["needle"][0]
    question_text = question_text or df["question"][0]
    answer_prefix = answer_prefix or df["answer_prefix"][0]
    max_new_tokens = df["max_new_tokens"][0]

    needle_tokens = tokenizer.encode(needle_text, add_special_tokens=False)
    limit = max_context_length - len(needle_tokens) - 150
    context_tokens = tokenizer.encode(original_context, add_special_tokens=False)[:limit]

    depths = [needle_depth] if isinstance(needle_depth, int) else list(needle_depth)
    rows = []
    for depth in depths:
        idx = int(len(context_tokens) * depth / 100)
        merged = context_tokens[:idx] + needle_tokens + context_tokens[idx:]
        decoded = tokenizer.decode(merged, skip_special_tokens=True)
        rows.append({
            "context": context_wrapper.format(context=decoded),
            "needle": needle_text,
            "needle_depth": depth,
            "question": question_text,
            "answer_prefix": answer_prefix,
            "max_new_tokens": max_new_tokens,
        })
    return pd.DataFrame(rows)
