#!/usr/bin/env bash
# Round-3 queue C: dispatch/transfer probe, extended MaskSNR fine-tune
# (f3) from the f2ft probe-best checkpoint, and both held-out protocol
# evals with session-level re-anchoring enabled. Resumable via
# exp/.queue markers.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

if step 1 dprobe; then
  python scripts/dispatch_probe.py --groups 16 64 --iters 8 \
    2>&1 | tee exp/dispatch_probe.log && marker dprobe
fi

if step 2 f3; then
  python -m css_tpu.cli.train \
    --expdir exp/f3 --model Conformer --objective MaskSNR \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 20 --batches-per-epoch 512 \
    --optim adam --lr 6e-6 --warmup 50 --decay 1e-4 \
    --weight-decay 0.01 --grad-thresh 5.0 --masksnr-mag-weight 0.05 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 4 --keep-last 4 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    --init exp/f2ft/best.1.mdl --seed 12 \
    2>&1 | tee exp/f3.log && marker f3
fi

if step 3 f3ev; then
  {
    for ck in exp/f3/best.1.mdl exp/f3/20.1.mdl; do
      [ -f "$ck" ] || continue
      tag=$(basename "$ck" .mdl)
      echo "== $ck (LADDER, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qf3L_$tag"
      echo "== $ck (MATCHED dense-f0, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qf3M_$tag"
    done
  } 2>&1 | tee exp/f3ev.log && marker f3ev
fi

echo "queue C complete"
