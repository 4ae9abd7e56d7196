#!/usr/bin/env bash
# One-shot accuracy sweep for the moment REAL WEIGHTS appear (VERDICT r1
# item 4). This environment has no network, so every number so far ran on
# random weights + the byte tokenizer; mount a HuggingFace checkpoint dir
# (config.json + *.safetensors + tokenizer files — bf16 or QServe W8A8
# exports are auto-detected, kvzip_tpu/models/params.py) and run:
#
#     tools/accuracy_sweep.sh /path/to/checkpoint [num_samples]
#
# It runs the reference eval protocol (ratios 0.9..0.1 from ONE prefill per
# sample, reference eval.py:4-9) on SQuAD, NIAH and GSM8K, then prints the
# ratio -> score tables to compare against BASELINE.md (e.g. SQuAD ~93% at
# ratio 0.2, NIAH ~100% down to 0.1, GSM8K ~61% at 0.2 for
# Qwen2.5-7B-Instruct-1M).
set -euo pipefail

CKPT=${1:?usage: tools/accuracy_sweep.sh /path/to/checkpoint [num_samples]}
NUM=${2:-10}
cd "$(dirname "$0")/.."
TAG=$(basename "${CKPT%/}")

for DATA in squad needle gsm; do
    echo "== eval $DATA ($NUM samples) =="
    python -m kvzip_tpu.cli eval -m "$CKPT" -d "$DATA" --num "$NUM"
    python -m kvzip_tpu.cli parse -m "$TAG" -d "$DATA"
done
