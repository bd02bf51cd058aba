#!/usr/bin/env bash
# Conformer-large CSS training recipe — TPU-native counterpart of the
# reference train.sh (hyperparameters from /root/reference/train.sh:6-17:
# adam, lr 1e-4, warmup 20000, decay 1e-5, wd 1e-2, clip 5.0, batch 32,
# 500 batches/epoch, 100 epochs).
#
# The reference ramped 1->4 independent SGE jobs with post-hoc weight
# averaging (train_parallel.sh); on a TPU mesh choose:
#   --strategy dp          synchronous data parallelism (psum over ICI)
#   --strategy replica_avg the reference's averaging algorithm, on-mesh
#
# THROUGHPUT MODE is the default here: batch 64 + lane-aligned T=128
# window buckets (--align-window-frames 128) measured +37% step
# throughput over batch 32 @ T=155 (BASELINE.md round 4,
# scripts/step_shapes.py). For best separation QUALITY use
# recipes/train_quality.sh, which keeps alignment OFF (aligned buckets
# collapse the window-length distribution and cost ~3 dB — BASELINE.md
# round 4 continuation) — or set parity=1 for the reference's exact
# batch-32 unaligned hyperparameters.
set -euo pipefail

expdir=${1:-exp/conformer_large}
train_manifest=${2:-}   # jsonl from `python -m css_tpu.cli.prepare utterances`
strategy=${strategy:-dp}

data_args=(--synthetic-data --synthetic-rirs)
if [[ -n "$train_manifest" ]]; then
  data_args=(--train-manifest "$train_manifest")
fi

speed_args=(--batch-size 64 --align-window-frames 128)
if [[ "${parity:-0}" = 1 ]]; then
  speed_args=(--batch-size 32)
fi

python -m css_tpu.cli.train \
  --expdir "$expdir" \
  "${data_args[@]}" \
  "${speed_args[@]}" \
  --model Conformer --objective MSE \
  --batches-per-epoch 500 --num-epochs 100 \
  --optim adam --lr 1e-4 --weight-decay 1e-2 --grad-thresh 5.0 \
  --warmup 20000 --decay 1e-5 \
  --mse-noise-weight 0.3 \
  --strategy "$strategy" --bf16 \
  --keep-every 20 --keep-last 2 \
  "$@"
