#!/usr/bin/env bash
# Prioritized TPU work queue for round-3 quality/perf runs (resumable;
# each step logs to exp/<name>.log and is skipped if its done-marker
# exists). Usage: bash scripts/tpu_queue.sh [start_step]
#
# Round-3 flagship (VERDICT next-round #1): formant-voice Conformer-large
# base run with probe-based checkpoint selection, then MaskSNR fine-tune,
# evaluated on the held-out 3- and 8-session protocols. Then the 7ch
# spatial Conformer run (#2), kernel settle benchmarks (#8), and a bench
# refresh (#3).
set -uo pipefail
cd "$(dirname "$0")/.."

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

evalboth() { # evalboth <log> <ck...>: 3-session + stratified 8-session
  local log=$1; shift
  {
    for ck in "$@"; do
      [ -f "$ck" ] || continue
      echo "== $ck (3-session formant)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 3 \
        --workdir "/tmp/qe3_$(basename "$ck" .mdl)_$$"
      echo "== $ck (8-session formant, stratified)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 \
        --workdir "/tmp/qe8_$(basename "$ck" .mdl)_$$"
    done
  } 2>&1 | tee "exp/$log"
}

if step 1 f1; then
  python -m css_tpu.cli.train \
    --expdir exp/f1 --model Conformer --objective MSE \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 60 --batches-per-epoch 512 \
    --optim adam --lr 1e-4 --warmup 15000 --decay 2e-5 \
    --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 10 --keep-last 3 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    2>&1 | tee exp/f1.log && marker f1
fi

if step 2 f1eval; then
  evalboth f1eval.log exp/f1/60.1.mdl exp/f1/best.1.mdl && marker f1eval
fi

if step 3 f1ft; then
  init=exp/f1/best.1.mdl; [ -f "$init" ] || init=exp/f1/60.1.mdl
  INIT=$init VOICE=formant \
    bash recipes/train_quality.sh masksnr exp/f1ft 2>&1 | tee exp/f1ft.log \
    && marker f1ft
fi

if step 4 f1ftev; then
  evalboth f1ftev.log exp/f1ft/15.1.mdl exp/f1ft/best.1.mdl && marker f1ftev
fi

if step 5 s7; then
  python -m css_tpu.cli.train \
    --expdir exp/s7 --model Conformer --objective MSE \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --spatialize-channels 7 \
    --batch-size 32 --num-epochs 40 --batches-per-epoch 512 \
    --optim adam --lr 1e-4 --warmup 12000 --decay 2e-5 \
    --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3 \
    --keep-best --validate-batches 16 \
    --keep-every 10 --keep-last 3 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    2>&1 | tee exp/s7.log && marker s7
fi

if step 6 s7eval; then
  {
    for ck in exp/s7/40.1.mdl exp/s7/best.1.mdl; do
      [ -f "$ck" ] || continue
      echo "== $ck (trained-mask spatial, MVDR vs masking + ablation grid)"
      python scripts/spatial_quality_eval.py --checkpoint "$ck" \
        --model Conformer --voice formant --merge --ablate
    done
  } 2>&1 | tee exp/s7eval.log && marker s7eval
fi

if step 7 kernels; then
  {
    echo "== fused LSTM train kernel (VERDICT weak #5)"
    python scripts/lstm_kernel_bench.py || true
    echo "== Pallas STFT forward (VERDICT weak #6)"
    python scripts/stft_kernel_bench.py || true
  } 2>&1 | tee exp/kernels.log && marker kernels
fi

causal_common=(--objective MSE
  --synthetic-data --synthetic-speakers 96 --synthetic-utts 12
  --synthetic-f0-max 400 --synthetic-voice formant
  --batch-size 32 --num-epochs 30 --batches-per-epoch 512
  --optim adam --lr 1e-4 --warmup 10000 --decay 2e-5
  --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3
  --keep-best --validate-batches 16 --probe-sessions 4
  --keep-every 10 --keep-last 2
  --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1)

if step 8 c1; then
  python -m css_tpu.cli.train --expdir exp/c1 --model Conformer \
    --conformer-causal "${causal_common[@]}" \
    2>&1 | tee exp/c1.log && marker c1
fi

if step 9 c2; then
  python -m css_tpu.cli.train --expdir exp/c2 --model BLSTM \
    --blstm-causal "${causal_common[@]}" \
    2>&1 | tee exp/c2.log && marker c2
fi

if step 10 curve; then
  {
    for spec in "Conformer exp/f1/best.1.mdl offline,window" \
                "Conformer exp/c1/best.1.mdl offline,window,hop" \
                "BLSTM exp/c2/best.1.mdl offline,window,hop"; do
      set -- $spec
      [ -f "$2" ] || continue
      echo "== latency/quality curve: $2"
      python scripts/causal_quality_curve.py --checkpoint "$2" \
        --model "$1" --modes "$3" --voice formant \
        --workdir "/tmp/curve_$(basename "$2" .mdl)_$1"
    done
  } 2>&1 | tee exp/curve.log && marker curve
fi

if step 11 bench; then
  python bench.py 2>&1 | tee exp/bench_queue.log && marker bench
fi

echo "queue complete (markers in exp/.queue/)"
