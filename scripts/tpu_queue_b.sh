#!/usr/bin/env bash
# Round-3 follow-up TPU queue (after tpu_queue.sh): rerun the MaskSNR
# fine-tune (istft length fix), evaluate both held-out protocols, and
# run the order-loss flagship (f2) — the confidence-gated canonical
# slot-ordering objective that lifted the formant-ladder protocol by
# +5 dB at smoke scale. Resumable via exp/.queue markers.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

evalboth() { # evalboth <log> <ck...>: ladder + matched-dense protocols
  local log=$1; shift
  {
    for ck in "$@"; do
      [ -f "$ck" ] || continue
      echo "== $ck (8-session formant LADDER, stratified)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 \
        --workdir "/tmp/qeL_$(basename "$ck" .mdl)_$$"
      echo "== $ck (8-session formant MATCHED dense-f0, stratified)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 \
        --workdir "/tmp/qeM_$(basename "$ck" .mdl)_$$"
    done
  } 2>&1 | tee "exp/$log"
}

if step 1 f1ft; then
  init=exp/f1/best.1.mdl; [ -f "$init" ] || init=exp/f1/60.1.mdl
  INIT=$init VOICE=formant \
    bash recipes/train_quality.sh masksnr exp/f1ft 2>&1 | tee exp/f1ft.log \
    && marker f1ft
fi

if step 2 f1ftev; then
  evalboth f1ftev.log exp/f1ft/15.1.mdl exp/f1ft/best.1.mdl && marker f1ftev
fi

if step 3 f1eval2; then
  # the f1 base checkpoints on the MATCHED protocol (f1eval only ran
  # the ladder protocol at full scale)
  evalboth f1eval2.log exp/f1/best.1.mdl && marker f1eval2
fi

if step 4 f2; then
  python -m css_tpu.cli.train \
    --expdir exp/f2 --model Conformer --objective MSE \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 60 --batches-per-epoch 512 \
    --optim adam --lr 1e-4 --warmup 15000 --decay 2e-5 \
    --weight-decay 0.01 --grad-thresh 5.0 --mse-noise-weight 0.3 \
    --mse-order-weight 0.6 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 10 --keep-last 3 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    2>&1 | tee exp/f2.log && marker f2
fi

if step 5 f2eval; then
  evalboth f2eval.log exp/f2/60.1.mdl exp/f2/best.1.mdl && marker f2eval
fi

if step 6 f2ft; then
  init=exp/f2/best.1.mdl; [ -f "$init" ] || init=exp/f2/60.1.mdl
  INIT=$init VOICE=formant \
    bash recipes/train_quality.sh masksnr exp/f2ft 2>&1 | tee exp/f2ft.log \
    && marker f2ft
fi

if step 7 f2ftev; then
  evalboth f2ftev.log exp/f2ft/15.1.mdl exp/f2ft/best.1.mdl && marker f2ftev
fi

echo "queue B complete"
