#!/bin/bash
# Press × compression-ratio sweep (reference evaluation/evaluate.sh). The
# reference fans out one press per GPU; on TPU the single-host sweep is
# sequential per chip — parallelise across hosts by sharding PRESSES.
set -e

MODEL=${MODEL:-"meta-llama/Llama-3.1-8B-Instruct"}
DATASET=${DATASET:-"ruler"}
DATA_DIR=${DATA_DIR:-"4096"}
FRACTION=${FRACTION:-"1.0"}
PRESSES=${PRESSES:-"expected_attention knorm observed_attention random snapkv streaming_llm tova think"}
RATIOS=${RATIOS:-"0.25 0.5 0.75 0.875"}

for press in $PRESSES; do
  for ratio in $RATIOS; do
    python evaluate.py \
      --dataset "$DATASET" --data_dir "$DATA_DIR" --model "$MODEL" \
      --press_name "$press" --compression_ratio "$ratio" --fraction "$FRACTION"
  done
done
