"""Evaluation subsystem: metric correctness (vs reference implementations'
semantics) and an end-to-end CLI-runner pass over a synthetic dataset with
the tiny model pipeline."""

import json
import sys

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/evaluation")

from kvpress_tpu import Runner, init_params, tiny_config
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer


def test_ruler_string_match():
    from metrics.ruler import calculate_metrics

    df = pd.DataFrame({
        "task": ["niah_single", "niah_single", "qa_1", "qa_1"],
        "predicted_answer": ["the key is 42", "nothing", "Paris is the city", "no idea"],
        "answer": [["42"], ["7"], ["Paris", "paris city"], ["London"]],
    })
    scores = calculate_metrics(df)
    assert scores["niah_single"]["string_match"] == 50.0
    assert scores["qa_1"]["string_match"] == 50.0


def test_boxed_metrics():
    from metrics.boxed import calculate_metrics

    df = pd.DataFrame({
        "predicted_answer": ["so \\boxed{42}", "answer \\boxed{7}", "dunno"],
        "answer": ["42", "8", "1"],
    })
    m = calculate_metrics(df)
    assert m["correct"] == 1 and m["answered"] == 2 and m["total"] == 3


def test_longbench_qa_f1():
    from metrics.longbench import qa_f1_score

    assert qa_f1_score("The answer is Paris", "Paris") > 0.3
    assert qa_f1_score("nothing", "Paris") == 0.0


def test_longbench_calculate():
    from metrics.longbench import calculate_metrics

    df = pd.DataFrame({
        "task": ["hotpotqa", "hotpotqa"],
        "predicted_answer": ["Paris", "London"],
        "answers": [[["Paris"]][0:1] * 1 + [], []],
    })
    df = pd.DataFrame({
        "task": ["hotpotqa", "hotpotqa"],
        "predicted_answer": ["Paris", "London"],
        "answers": [["Paris"], ["Paris"]],
        "all_classes": [None, None],
    })
    score = calculate_metrics(df)
    assert score == 50.0


def test_longbenchv2():
    from metrics.longbenchv2 import calculate_metrics

    df = pd.DataFrame({
        "predicted_answer": ["The correct answer is (B)", "The correct answer is C", "wrong"],
        "answer": ["B", "C", "A"],
        "difficulty": ["easy", "hard", "easy"],
        "length": ["short", "long", "short"],
    })
    m = calculate_metrics(df)
    assert abs(m["average"] - 2 / 3) < 1e-9


def test_infinitebench_scorers():
    from metrics.infinitebench import calculate_metrics

    df = pd.DataFrame({
        "task": ["passkey", "passkey", "kv_retrieval"],
        "predicted_answer": ["the key is 1234.", "nope", "value: abc-def"],
        "answer": [["1234"], ["99"], ["abc-def"]],
    })
    m = calculate_metrics(df)
    assert m["passkey"] == 50.0
    assert m["kv_retrieval"] == 100.0


def test_evaluation_runner_end_to_end(tmp_path):
    """CLI runner over a synthetic ruler-style dataset with the tiny model."""
    from evaluate import EvaluationConfig, EvaluationRunner

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))

    ctx = " ".join(f"word{i}" for i in range(30))
    df = pd.DataFrame({
        "context": [ctx, ctx, ctx + " extra"],
        "question": ["q one ?", "q two ?", "q three ?"],
        "answer_prefix": ["", "", ""],
        "answer": [["word3"], ["word7"], ["word9"]],
        "max_new_tokens": [6, 6, 6],
        "task": ["niah_1", "niah_1", "niah_1"],
    })

    config = EvaluationConfig(
        dataset="ruler", press_name="knorm", compression_ratio=0.5,
        output_dir=str(tmp_path), model="tiny",
    )
    runner = EvaluationRunner(config, pipeline=pipe, dataset_df=df)
    metrics = runner.run()
    assert "niah_1" in metrics

    out_dir = config.results_dir()
    assert (out_dir / "predictions.csv").exists()
    assert (out_dir / "metrics.json").exists()
    saved = pd.read_csv(out_dir / "predictions.csv")
    assert saved["predicted_answer"].notna().all()
    assert (saved["compression_ratio"] == 0.5).all()

    # Re-running with identical config skips inference (skip-if-exists).
    runner2 = EvaluationRunner(config, pipeline=pipe, dataset_df=df)
    metrics2 = runner2.run()
    assert json.dumps(metrics, default=float) == json.dumps(metrics2, default=float)


def test_configure_press_dispatch():
    from evaluate import EvaluationConfig, configure_press
    from kvpress_tpu.presses import AdaKVPress, DecodingPress, ThinKPress

    p = configure_press(EvaluationConfig(press_name="snapkv", compression_ratio=0.7))
    assert p.compression_ratio == 0.7
    p = configure_press(EvaluationConfig(press_name="adakv_snapkv", compression_ratio=0.3))
    assert isinstance(p, AdaKVPress) and p.press.compression_ratio == 0.3
    p = configure_press(EvaluationConfig(press_name="think", compression_ratio=0.4))
    assert isinstance(p, ThinKPress) and p.key_channel_compression_ratio == 0.4
    p = configure_press(EvaluationConfig(
        press_name="decoding_knorm", compression_interval=7, target_size=128
    ))
    assert isinstance(p, DecodingPress)
    assert p.compression_interval == 7 and p.target_size == 128
    assert configure_press(EvaluationConfig(press_name="no_press")) is None


def test_cli_parse_args_yaml_merge(tmp_path):
    """defaults <- YAML <- CLI layering (reference evaluate.py:538-568)."""
    from evaluate import parse_args

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text("press_name: snapkv\ncompression_ratio: 0.75\nseed: 7\n")
    cfg = parse_args([
        "--config", str(cfg_file), "--compression_ratio", "0.25",
        "--dataset", "ruler",
    ])
    assert cfg.press_name == "snapkv"       # from YAML
    assert cfg.compression_ratio == 0.25    # CLI overrides YAML
    assert cfg.seed == 7                    # from YAML
    assert cfg.dataset == "ruler"           # CLI


def test_duo_on_the_fly_scores_from_bundled_calibration(tmp_path):
    """press_name=duo_attention_on_the_fly: head scores computed at setup
    from the BUNDLED calibration text (the reference downloads held-out
    booksum samples, duo_attention_press.py:144-210) — never from the
    evaluation rows (calibration leakage)."""
    from evaluate import (EvaluationConfig, EvaluationRunner,
                          duo_calibration_samples)

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))

    ctx = " ".join(f"word{i}" for i in range(600))
    df = pd.DataFrame({
        "context": [ctx, ctx],
        "question": ["q one ?", "q two ?"],
        "answer_prefix": ["", ""],
        "answer": [["word3"], ["word7"]],
        "max_new_tokens": [4, 4],
        "task": ["niah_1", "niah_1"],
    })
    config = EvaluationConfig(
        dataset="ruler", press_name="duo_attention_on_the_fly",
        head_compression_ratio=0.5, output_dir=str(tmp_path), model="tiny",
    )
    runner = EvaluationRunner(config, pipeline=pipe, dataset_df=df)
    metrics = runner.run()
    assert "niah_1" in metrics
    assert runner.press.head_scores is not None
    assert runner.press.head_scores.shape == (cfg.num_layers, cfg.num_kv_heads)
    assert runner.press.head_compression_ratio == 0.5
    # Calibration-source disjointness: the calibration token stream is the
    # bundled text, not the dataset contexts (protocol-leakage regression).
    cal = duo_calibration_samples(pipe.tokenizer)
    ctx_ids = pipe.tokenizer.encode(ctx, add_special_tokens=False)
    for s in cal:
        assert list(np.asarray(s[0])[: len(ctx_ids)]) != ctx_ids


def test_evaluation_runner_quantized_kv(tmp_path):
    """kv_bits config drives the pipeline's int KV cache and lands in the
    results-dir name (separate runs per cache width)."""
    import pandas as pd

    from evaluate import EvaluationConfig, EvaluationRunner

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pipe = KVPressPipeline(Runner.create(cfg), params, ToyTokenizer(cfg.vocab_size))

    ctx = " ".join(f"word{i}" for i in range(30))
    df = pd.DataFrame({
        "context": [ctx, ctx],
        "question": ["q one ?", "q two ?"],
        "answer_prefix": ["", ""],
        "answer": [["word3"], ["word7"]],
        "max_new_tokens": [5, 5],
        "task": ["niah_1", "niah_1"],
    })
    config = EvaluationConfig(
        dataset="ruler", press_name="knorm", compression_ratio=0.5,
        output_dir=str(tmp_path), model="tiny", kv_bits=4,
    )
    assert "kv4" in str(config.results_dir())
    runner = EvaluationRunner(config, pipeline=pipe, dataset_df=df)
    metrics = runner.run()
    assert "niah_1" in metrics
    saved = pd.read_csv(config.results_dir() / "predictions.csv")
    assert saved["predicted_answer"].notna().all()
