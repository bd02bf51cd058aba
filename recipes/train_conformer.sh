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
set -euo pipefail

expdir=${1:-exp/conformer_large}
train_manifest=${2:-}   # jsonl from `python -m css_tpu.cli.prepare utterances`
strategy=${strategy:-dp}

data_args=(--synthetic-data --synthetic-rirs)
if [[ -n "$train_manifest" ]]; then
  data_args=(--train-manifest "$train_manifest")
fi

python -m css_tpu.cli.train \
  --expdir "$expdir" \
  "${data_args[@]}" \
  --model Conformer --objective MSE \
  --batch-size 32 --batches-per-epoch 500 --num-epochs 100 \
  --optim adam --lr 1e-4 --weight-decay 1e-2 --grad-thresh 5.0 \
  --warmup 20000 --decay 1e-5 \
  --mse-noise-weight 0.3 \
  --strategy "$strategy" --bf16 \
  --keep-every 20 --keep-last 2 \
  "$@"
