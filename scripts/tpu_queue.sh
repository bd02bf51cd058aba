#!/usr/bin/env bash
# Prioritized TPU work queue for quality/perf runs (resumable; each step
# logs to exp/<name>.log and is skipped if its done-marker exists).
# Usage: bash scripts/tpu_queue.sh [start_step]
#
# Steps:
#  1 q5     fast-decay continuation of the round-2 harmonic run
#           (INIT exp/q4/93.1.mdl — raw late checkpoints transfer best)
#  2 q5eval held-out eval of the decay result (3- and 8-session)
#  3 q5ft   MaskSNR fine-tune from the decay checkpoint
#  4 q5ftev eval of the fine-tune
#  5 f1     formant-voice base run (the corpus where close-f0 pairs are
#           separable; shorter than the 100-epoch recipe to fit the
#           session)
#  6 f1eval held-out formant-protocol eval
#  7 bench  refresh bench.py on the chip
set -uo pipefail
cd "$(dirname "$0")/.."

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

if step 1 q5; then
  INIT=exp/q4/93.1.mdl VOICE=harmonic \
    bash recipes/train_quality.sh decay exp/q5 2>&1 | tee exp/q5.log \
    && marker q5
fi

if step 2 q5eval; then
  {
    for ck in exp/q5/20.1.mdl exp/q5/best.1.mdl; do
      [ -f "$ck" ] || continue
      echo "== $ck (3-session)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --sessions 3 --workdir "/tmp/q5e3_$(basename "$ck" .mdl)"
      echo "== $ck (8-session)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --sessions 8 --workdir "/tmp/q5e8_$(basename "$ck" .mdl)"
    done
  } 2>&1 | tee exp/q5eval.log && marker q5eval
fi

if step 3 q5ft; then
  INIT=exp/q5/20.1.mdl VOICE=harmonic \
    bash recipes/train_quality.sh masksnr exp/q5ft 2>&1 | tee exp/q5ft.log \
    && marker q5ft
fi

if step 4 q5ftev; then
  {
    for ck in exp/q5ft/15.1.mdl exp/q5ft/best.1.mdl; do
      [ -f "$ck" ] || continue
      echo "== $ck (3-session)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --sessions 3 --workdir "/tmp/qfte3_$(basename "$ck" .mdl)"
      echo "== $ck (8-session)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --sessions 8 --workdir "/tmp/qfte8_$(basename "$ck" .mdl)"
    done
  } 2>&1 | tee exp/q5ftev.log && marker q5ftev
fi

if step 5 f1; then
  python -m css_tpu.cli.train \
    --expdir exp/f1 --model Conformer --objective MSE \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 60 --batches-per-epoch 512 \
    --optim adam --lr 1e-4 --warmup 15000 --decay 2e-5 \
    --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3 \
    --keep-best --validate-batches 16 --keep-every 10 --keep-last 3 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    2>&1 | tee exp/f1.log && marker f1
fi

if step 6 f1eval; then
  {
    for ck in exp/f1/60.1.mdl exp/f1/best.1.mdl; do
      [ -f "$ck" ] || continue
      echo "== $ck (3-session formant)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 3 \
        --workdir "/tmp/f1e3_$(basename "$ck" .mdl)"
      echo "== $ck (8-session formant, stratified)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 \
        --workdir "/tmp/f1e8_$(basename "$ck" .mdl)"
    done
  } 2>&1 | tee exp/f1eval.log && marker f1eval
fi

if step 7 bench; then
  python bench.py 2>&1 | tee exp/bench_queue.log && marker bench
fi

echo "queue complete (markers in exp/.queue/)"
