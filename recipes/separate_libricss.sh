#!/usr/bin/env bash
# LibriCSS continuous separation — counterpart of the reference run.sh +
# separate_libricss.py. Sessions shard embarrassingly parallel via
# --session (run one process per session, per host/chip).
set -euo pipefail

corpus_dir=${1:?usage: separate_libricss.sh <corpus_dir> <checkpoint> [outdir]}
checkpoint=${2:?}
outdir=${3:-exp/separated}
config=${config:-configs/infer_1ch.yaml}
model=${model:-Conformer}

# all 10 LibriCSS sessions; restrict with SESSIONS="session0 session1 ..."
SESSIONS=${SESSIONS:-session0 session1 session2 session3 session4 session5 session6 session7 session8 session9}

for session in $SESSIONS; do
  python -m css_tpu.cli.separate \
    --config "$config" \
    --checkpoint "$checkpoint" \
    --model "$model" \
    --corpus-dir "$corpus_dir" \
    --out-dir "$outdir" \
    --session "$session" &
done
wait
