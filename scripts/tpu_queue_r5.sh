#!/usr/bin/env bash
# Round-5 queue: MaskSNR fine-tune seed sweep from the h2 base.
#
# The r4c A/B (exp/h2ev.log) settled the round-4 question: the exact f2
# recipe (5 window buckets + order loss 0.6) reproduces the LADDER
# protocol exactly (+2.89 vs round-3's +2.90) but NOT the +5.54 MATCHED
# headline — three independent MaskSNR fine-tunes (h1ft +2.21, g2ft
# +1.37, h2ft +2.49) all land at +2.2-2.5 matched. Hypothesis: the
# matched number is dominated by WHICH basin the short fine-tune lands
# in (seed), not by the recipe. This queue tests it the cheap way: more
# fine-tune seeds from the SAME h2/best base (per-run epoch selection by
# the legacy probe — within-run its only validated role), then
# full-protocol evals of EVERY candidate (no probe ranks across
# lineages — BASELINE.md round 5). If a seed clears +4 matched, promote it to
# exp/flagship.mdl and persist slim; either way BASELINE.md records the
# seed-variance finding with numbers.
#
#   scripts/tpu_watchdog.sh scripts/tpu_queue_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
. scripts/queue_lib.sh

resume_or_init() {
  local dir=$1 init=${2:-}
  local latest
  latest=$(ls "$dir"/[0-9]*.1.mdl 2>/dev/null \
           | sed 's/.*\/\([0-9]*\)\.1\.mdl/\1 &/' | sort -n \
           | tail -1 | cut -d' ' -f2)
  if [ -n "$latest" ]; then
    echo "--resume $(basename "$latest")"
  elif [ -n "$init" ]; then
    echo "--init $init"
  fi
}

# quality lineage: alignment OFF, order loss as in h2; legacy 4x12s
# probe for --keep-best/avgtop — the only selector with validated
# WITHIN-run behavior (the stratified probe failed its third
# cross-lineage validation point, BASELINE.md round 5; candidates are
# promoted on the FULL protocol below, not on any probe)
common=(--synthetic-data --synthetic-speakers 96 --synthetic-utts 12
        --synthetic-f0-max 400 --synthetic-voice formant
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1)

ft() { # ft <expdir> <seed>
  local dir=$1 seed=$2
  python -m css_tpu.cli.train --expdir "$dir" "${common[@]}" \
    --model Conformer --objective MaskSNR \
    --num-epochs 15 --batches-per-epoch 512 \
    --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
    --average-probe-top 2 --keep-every 3 --keep-last 5 \
    $(resume_or_init "$dir" exp/h2/best.1.mdl) --seed "$seed" \
    2>&1 | tee -a "$dir.log"
}

if step 1 ft22; then
  ft exp/ft22 22 && marker ft22 exp/ft22/avgtop.1.mdl
fi
if step 2 ft33; then
  ft exp/ft33 33 && marker ft33 exp/ft33/avgtop.1.mdl
fi
if step 3 ft44; then
  ft exp/ft44 44 && marker ft44 exp/ft44/avgtop.1.mdl
fi

if step 4 sweepprobe; then
  # stratified-probe ranking of all candidates (also 3 more validation
  # points for the probe-vs-protocol study)
  python scripts/probe_validate.py \
    --checkpoints exp/h2ft/best.1.mdl exp/ft22/avgtop.1.mdl \
                  exp/ft33/avgtop.1.mdl exp/ft44/avgtop.1.mdl \
    --f0-max 400 --voice formant 2>&1 | tee exp/sweep_probe.log \
    && marker sweepprobe exp/sweep_probe.log
fi

if step 5 sweepev; then
  {
    for ck in exp/ft22/avgtop.1.mdl exp/ft33/avgtop.1.mdl \
              exp/ft44/avgtop.1.mdl; do
      [ -f "$ck" ] || continue
      tag=$(echo "$ck" | tr '/.' '__')
      echo "== $ck MATCHED dense-f0 (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --skip-oracle --workdir "/tmp/qM_$tag"
      echo "== $ck LADDER (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --skip-oracle --workdir "/tmp/qL_$tag"
    done
  } 2>&1 | tee exp/sweep_ev.log && marker sweepev exp/sweep_ev.log
fi

flagship() {
  for ck in exp/flagship.mdl exp/h2ft/best.1.mdl; do
    [ -f "$ck" ] && { echo "$ck"; return; }
  done
  echo checkpoints/h2ft_masksnr_best.mdl
}

if step 6 wers; then
  # streaming-executor WER column (VERDICT r4 next #10; the r4c wer2
  # step ran before the --streaming arm existed)
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor --streaming \
    --workdir /tmp/werq_s 2>&1 | tee exp/wer_streaming.log \
    && marker wers exp/wer_streaming.log
fi

echo "QUEUE_R5_DONE"
