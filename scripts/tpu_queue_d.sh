#!/usr/bin/env bash
# Round-3 queue D: hard-pair-curriculum flagship (f4 = order-loss MSE
# pretrain with 30% close-f0 pair oversampling -> MaskSNR fine-tune),
# two-protocol evals with re-anchoring, and the causal-model
# (latency-vs-quality) protocol rows. Resumable via exp/.queue markers.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

evalboth() { # evalboth <log> <model> <ck...>: ladder + matched, reanchor on
  local log=$1 model=$2; shift 2
  {
    for ck in "$@"; do
      [ -f "$ck" ] || continue
      tag=$(echo "$ck" | tr '/.' '__')
      echo "== $ck (LADDER, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model "$model" \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qdL_$tag"
      echo "== $ck (MATCHED dense-f0, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model "$model" \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qdM_$tag"
    done
  } 2>&1 | tee "exp/$log"
}

if step 1 f4; then
  python -m css_tpu.cli.train \
    --expdir exp/f4 --model Conformer --objective MSE \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 60 --batches-per-epoch 512 \
    --optim adam --lr 1e-4 --warmup 15000 --decay 2e-5 \
    --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3 \
    --mse-order-weight 0.6 --hard-pair-frac 0.3 --hard-pair-df0 80 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 10 --keep-last 3 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    2>&1 | tee exp/f4.log && marker f4
fi

if step 2 f4ft; then
  init=exp/f4/best.1.mdl; [ -f "$init" ] || init=exp/f4/60.1.mdl
  python -m css_tpu.cli.train \
    --expdir exp/f4ft --model Conformer --objective MaskSNR \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 15 --batches-per-epoch 512 \
    --optim adam --lr 2e-5 --warmup 100 --decay 1e-4 \
    --weight-decay 0.01 --grad-thresh 5.0 --masksnr-mag-weight 0.05 \
    --hard-pair-frac 0.3 --hard-pair-df0 80 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 3 --keep-last 5 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    --init "$init" --seed 11 \
    2>&1 | tee exp/f4ft.log && marker f4ft
fi

if step 3 f4ftev; then
  evalboth f4ftev.log Conformer exp/f4ft/best.1.mdl exp/f4ft/15.1.mdl \
    && marker f4ftev
fi

if step 4 causalev; then
  # latency-vs-quality table rows: causal Conformer / causal BLSTM on
  # the matched protocol (hop-streaming == the causal forward bit-for-bit
  # per tests, so these offline scores ARE the ~48 ms hop-mode quality)
  evalboth causalev.log Conformer exp/c1/best.1.mdl
  evalboth causalev_blstm.log BLSTM exp/c2/best.1.mdl
  marker causalev
fi

echo "queue D complete"
