#!/bin/bash
# Leaderboard protocol (reference evaluation/leaderboard.sh): RULER-4096,
# ratios {0.25, 0.5, 0.75, 0.875} + no_press baseline; threshold presses swept
# by threshold; query-aware loop for the observation-window presses.
set -e

MODEL=${MODEL:-"Qwen/Qwen3-8B"}
DATASET="ruler"
DATA_DIR="4096"

python evaluate.py --dataset $DATASET --data_dir $DATA_DIR --model "$MODEL" \
  --press_name no_press --compression_ratio 0.0

for press in knorm random streaming_llm snapkv tova expected_attention \
             adakv_snapkv critical_snapkv critical_expected_attention \
             pyramidkv keydiff lagkv cur block_keydiff chunkkv compactor; do
  for ratio in 0.25 0.5 0.75 0.875; do
    python evaluate.py --dataset $DATASET --data_dir $DATA_DIR --model "$MODEL" \
      --press_name "$press" --compression_ratio "$ratio"
  done
done

# DuoAttention: swept by --head_compression_ratio (its compression_ratio is
# a derived observable, reference leaderboard.sh:32-36).
for press in duo_attention duo_attention_on_the_fly; do
  for hr in 0.25 0.5 0.75; do
    python evaluate.py --dataset $DATASET --data_dir $DATA_DIR --model "$MODEL" \
      --press_name "$press" --head_compression_ratio "$hr"
  done
done

# Threshold presses (DMS / KVzap): swept by threshold instead of ratio.
for t in -3 -4 -5 -6; do
  python evaluate.py --dataset $DATASET --data_dir $DATA_DIR --model "$MODEL" \
    --press_name kvzap_mlp --threshold "$t" \
    ${KVZAP_ARTIFACT:+--press_artifact "$KVZAP_ARTIFACT"}
done

# Query-aware presses.
for press in snapkv adakv_snapkv finch chunkkv; do
  for ratio in 0.25 0.5 0.75 0.875; do
    python evaluate.py --dataset $DATASET --data_dir $DATA_DIR --model "$MODEL" \
      --press_name "$press" --compression_ratio "$ratio" --query_aware
  done
done
