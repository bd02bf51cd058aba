#!/usr/bin/env bash
# Full-scale synthetic quality recipe (the run behind BASELINE.md's
# held-out SI-SNRi headline) + fast-decay continuation + held-out eval.
#
# Phase 1 trains Conformer-large on a DENSE-f0 synthetic corpus with
# on-device mixture synthesis (reference hyperparameters per
# /root/reference/train.sh:6-17, except the corpus: 96 speakers packed
# into f0 [90, 400] — a sparse 25 Hz ladder lets the mask model key on
# exact trained fundamentals and fail on held-out speakers, measured
# +7.5 dB in-distribution vs +0.1 held-out).
#
# Phase 2 is a fast-decay continuation: the main schedule's decay
# (1e-5/step) leaves lr at ~75% of peak after 100x512 steps; warm-start
# from the phase-1 checkpoint and sweep lr down two decades.
#
# NOTE on checkpoint choice: validation-MSE `--keep-best` selection does
# NOT track held-out session SI-SNRi (BASELINE.md) — evaluate late raw
# checkpoints too, and average them with cli.combine.
set -euo pipefail

expdir=${1:-exp/quality}

python -m css_tpu.cli.train \
  --expdir "$expdir" --model Conformer --objective MSE \
  --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
  --synthetic-f0-max 400 \
  --batch-size 32 --num-epochs 100 --batches-per-epoch 512 \
  --optim adam --lr 1e-4 --weight-decay 0.01 --grad-thresh 5.0 \
  --warmup 20000 --decay 1e-5 --mse-noise-weight 0.3 \
  --keep-best --validate-batches 16 --keep-every 10 --keep-last 3 \
  --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1

python -m css_tpu.cli.train \
  --expdir "$expdir/decay" --model Conformer --objective MSE \
  --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
  --synthetic-f0-max 400 \
  --batch-size 32 --num-epochs 20 --batches-per-epoch 512 \
  --optim adam --lr 7e-5 --weight-decay 0.01 --grad-thresh 5.0 \
  --warmup 100 --decay 2e-4 --mse-noise-weight 0.3 \
  --keep-best --validate-batches 16 --keep-every 10 --keep-last 5 \
  --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 \
  --init "$expdir/best.1.mdl" --seed 7 --job 1

# average the last few decay-phase checkpoints (combine_models.py
# semantics) and evaluate everything on held-out sessions
python -m css_tpu.cli.combine "$expdir/decay/avg.mdl" --save-models \
  --models "$expdir"/decay/{16,17,18,19,20}.1.mdl

for ck in "$expdir/decay/avg.mdl" "$expdir/decay/best.1.mdl" \
          "$expdir/decay/20.1.mdl"; do
  echo "== $ck"
  python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
    --sessions 8 --workdir "/tmp/quality_eval_$(basename "$ck" .mdl)"
done
