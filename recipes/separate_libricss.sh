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

# Official LibriCSS release layout? Build the session manifest (+ WER
# transcript references) with the libricss preparer; otherwise fall back
# to the generic wav-tree walker via --corpus-dir.
input_args=(--corpus-dir "$corpus_dir")
if compgen -G "$corpus_dir/*/*/record/raw_recording.wav" > /dev/null; then
  mkdir -p "$outdir"
  python -m css_tpu.cli.prepare libricss --corpus-dir "$corpus_dir" \
    --output "$outdir/recordings.jsonl" \
    --transcripts-output "$outdir/refs.jsonl"
  input_args=(--manifest "$outdir/recordings.jsonl")
fi

for session in $SESSIONS; do
  python -m css_tpu.cli.separate \
    --config "$config" \
    --checkpoint "$checkpoint" \
    --model "$model" \
    "${input_args[@]}" \
    --out-dir "$outdir" \
    --session "$session" &
done
wait

# WER through your ASR: export ASR_CMD='my_asr --wav {wav}' to score
if [[ -n "${ASR_CMD:-}" && -f "$outdir/refs.jsonl" ]]; then
  python -m css_tpu.cli.wer --estimates "$outdir" \
    --references "$outdir/refs.jsonl" --asr-cmd "$ASR_CMD" \
    --output "$outdir/wer.jsonl"
fi
