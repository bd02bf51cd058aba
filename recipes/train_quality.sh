#!/usr/bin/env bash
# Full-scale synthetic quality recipe behind BASELINE.md's held-out
# SI-SNRi headline, split into selectable phases:
#
#   base       Conformer-large on the DENSE-f0 synthetic corpus with
#              on-device mixture synthesis (reference hyperparameters per
#              /root/reference/train.sh:6-17 except the corpus: 96
#              speakers packed into f0 [90, 400]; a sparse 25 Hz ladder
#              lets the model key on exact trained fundamentals and fail
#              on held-out speakers — measured +7.5 dB in-distribution vs
#              +0.1 held-out).
#   decay      fast-decay continuation: the main schedule's decay
#              (1e-5/step) leaves lr at ~75% of peak after 100x512 steps;
#              warm-start from a late BASE checkpoint and sweep lr down
#              two decades.
#   masksnr    fine-tune with the MaskSNR objective (time-domain SI-SNR
#              through masked-iSTFT resynthesis — optimizes exactly what
#              the held-out protocol scores) from a late checkpoint of
#              the previous phase.
#   eval       held-out-session evaluation of the named checkpoints.
#
# VOICE=formant switches every phase (training corpus AND eval protocol)
# to the formant voice model — per-speaker vocal-tract timbre, the cue
# that makes close-f0 speaker pairs separable (see corpus.py).
#
# NOTE on checkpoint choice (BASELINE.md): validation-MSE `--keep-best`
# selection does NOT track held-out session SI-SNRi — evaluate late raw
# checkpoints, and only average checkpoints that sit in one basin.
set -euo pipefail

phase=${1:-base}
expdir=${2:-exp/quality}
VOICE=${VOICE:-harmonic}
INIT=${INIT:-}

objective=MSE
[ "$phase" = masksnr ] && objective=MaskSNR
common=(--model Conformer --objective "$objective"
        --synthetic-data --synthetic-speakers 96 --synthetic-utts 12
        --synthetic-f0-max 400 --synthetic-voice "$VOICE"
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        # NOTE on probe config (round 5, scripts/probe_validate.py): a
        # 6x30s f0-stratified probe fixed the 2-point rank inversion
        # (h1ft vs g2ft) but the third point (h2ft) inverted EVERY probe
        # config vs the reanchored 8-session protocol — no cheap probe
        # ranks across lineages; the probe stays a WITHIN-run selector
        # (where it has picked the protocol-best epoch three times) and
        # cross-lineage decisions use the full protocol (BASELINE.md)
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1)

case "$phase" in
  base)
    python -m css_tpu.cli.train --expdir "$expdir" "${common[@]}" \
      --num-epochs 100 --batches-per-epoch 512 \
      --lr 1e-4 --warmup 20000 --decay 1e-5 --mse-noise-weight 0.3 \
      --keep-every 10 --keep-last 3
    ;;
  decay)
    : "${INIT:?decay needs INIT=<base checkpoint .mdl>}"
    python -m css_tpu.cli.train --expdir "$expdir" "${common[@]}" \
      --num-epochs 20 --batches-per-epoch 512 \
      --lr 7e-5 --warmup 100 --decay 2e-4 --mse-noise-weight 0.3 \
      --keep-every 5 --keep-last 5 --init "$INIT" --seed 7
    ;;
  masksnr)
    # --average-probe-top encodes the measured-winning selection recipe
    # (BASELINE.md avg23: probe-select + within-basin averaging): the run
    # emits avgtop.1.mdl alongside best.1.mdl — evaluate both, ship the
    # higher probe scorer.
    : "${INIT:?masksnr needs INIT=<pretrained checkpoint .mdl>}"
    python -m css_tpu.cli.train --expdir "$expdir" "${common[@]}" \
      --num-epochs 15 --batches-per-epoch 512 \
      --lr 2e-5 --warmup 100 --decay 1e-4 \
      --masksnr-mag-weight 0.05 --average-probe-top 2 \
      --keep-every 3 --keep-last 5 --init "$INIT" --seed 11
    ;;
  eval)
    if [ "$#" -lt 3 ]; then
      echo "usage: $0 eval <expdir> <checkpoint.mdl> [more...]" >&2; exit 2
    fi
    shift 2
    for ck in "$@"; do
      echo "== $ck (3-session protocol)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice "$VOICE" --sessions 3 \
        --workdir "/tmp/qe3_$(basename "$ck" .mdl)"
      echo "== $ck (8-session protocol)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice "$VOICE" --sessions 8 \
        --workdir "/tmp/qe8_$(basename "$ck" .mdl)"
    done
    ;;
  *)
    echo "unknown phase: $phase (base|decay|masksnr|eval)" >&2; exit 2
    ;;
esac
