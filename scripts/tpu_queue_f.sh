#!/usr/bin/env bash
# Round-3 queue F: the f4 BASE checkpoint evals (its probe beat every
# previous pretrain; the curriculum MaskSNR fine-tune regressed, so the
# base itself is a flagship candidate) and a no-curriculum MaskSNR
# fine-tune retry from the same base.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

evalboth() { # evalboth <log> <ck...>
  local log=$1; shift
  {
    for ck in "$@"; do
      [ -f "$ck" ] || continue
      tag=$(echo "$ck" | tr '/.' '__')
      echo "== $ck (LADDER, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qfL_$tag"
      echo "== $ck (MATCHED dense-f0, stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qfM_$tag"
    done
  } 2>&1 | tee "exp/$log"
}

if step 1 f4ev; then
  evalboth f4ev.log exp/f4/best.1.mdl && marker f4ev
fi

if step 2 f4ft2; then
  python -m css_tpu.cli.train \
    --expdir exp/f4ft2 --model Conformer --objective MaskSNR \
    --synthetic-data --synthetic-speakers 96 --synthetic-utts 12 \
    --synthetic-f0-max 400 --synthetic-voice formant \
    --batch-size 32 --num-epochs 15 --batches-per-epoch 512 \
    --optim adam --lr 2e-5 --warmup 100 --decay 1e-4 \
    --weight-decay 0.01 --grad-thresh 5.0 --masksnr-mag-weight 0.05 \
    --keep-best --validate-batches 16 --probe-sessions 4 \
    --keep-every 3 --keep-last 5 \
    --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1 \
    --init exp/f4/best.1.mdl --seed 11 \
    2>&1 | tee exp/f4ft2.log && marker f4ft2
fi

if step 3 f4ft2ev; then
  evalboth f4ft2ev.log exp/f4ft2/best.1.mdl && marker f4ft2ev
fi

echo "queue F complete"
