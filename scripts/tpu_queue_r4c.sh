#!/usr/bin/env bash
# Round-4 queue C: flagship rebuild on the EXACT round-3 f2 lineage.
#
# The r4b rebuild (h1/h1ft) trained with --align-window-frames 128 and
# scored only +2.21 matched vs round-3 f2ft's +5.54 on the identical
# protocol, despite the same probe peak (+8.46 vs +8.4). Eval-window
# mismatch explains only +0.5 dB of the gap (h1ft at eval_win 2.064:
# +2.72 — exp/ diag). Remaining suspects: the alignment collapsed the
# training window buckets [2,2.5,3,3.5,4]s -> {2.064,4.112}s (3 of 5
# buckets became 2.064 s — massive distribution shift), and h1 dropped
# f2's canonical-order loss. This queue removes BOTH deltas: h2 is the
# f2 recipe verbatim (5 buckets, order loss 0.6), h2ft the f2ft recipe
# (15-epoch MaskSNR lr 2e-5) + --average-probe-top 2. Quality recipes
# keep alignment OFF until this A/B settles it; bench keeps reporting
# the aligned throughput as the speed-mode number.
#
# Then: the VERDICT r3 measurement items against the best flagship
# (fresh-seed reanchor A/B, WER table), the 7ch stratified protocol,
# and the causal latency/quality curve. Steps marker-resumable; run
# under scripts/tpu_watchdog.sh.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
# marker <name> <artifact...>: record done ONLY after every declared
# output artifact exists non-empty (VERDICT r4 weak #5: a bare touch-file
# let never-run steps read as done). The marker records the artifacts;
# done_already re-verifies them, so an empty/hand-touched marker no
# longer skips a step.
marker() {
  local name=$1; shift
  [ "$#" -ge 1 ] || { echo "[queue] marker $name: no artifacts declared" >&2; return 1; }
  local a
  for a in "$@"; do
    [ -s "$a" ] || {
      echo "[queue] marker $name REFUSED: missing/empty artifact $a" >&2
      return 1
    }
  done
  mkdir -p exp/.queue
  printf '%s\n' "$@" > "exp/.queue/$name.done"
}
done_already() {
  local f="exp/.queue/$1.done" line any=0
  [ -s "$f" ] || return 1
  while IFS= read -r line; do
    [ -n "$line" ] || continue
    [ -s "$line" ] || return 1
    any=1
  done < "$f"
  [ "$any" -eq 1 ]
}
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

resume_or_init() { # see tpu_queue_r4b.sh
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

evalboth() { # evalboth <log> <model> <ck...>: matched + ladder, reanchor
  local log=$1 model=$2 n_eval=0; shift 2
  {
    for ck in "$@"; do
      [ -f "$ck" ] || continue
      n_eval=$((n_eval + 1))
      tag=$(echo "$ck" | tr '/.' '__')
      echo "== $ck MATCHED dense-f0 (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model "$model" \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qM_$tag"
      echo "== $ck LADDER (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model "$model" \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --workdir "/tmp/qL_$tag"
    done
    echo "evalboth: evaluated $n_eval checkpoint(s)"
    [ "$n_eval" -ge 1 ]  # zero checkpoints evaluated = step failed
  } 2>&1 | tee "exp/$log"
}

# NOTE: no --align-window-frames here (quality lineage; see header)
common=(--synthetic-data --synthetic-speakers 96 --synthetic-utts 12
        --synthetic-f0-max 400 --synthetic-voice formant
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1)

if step 1 h2; then
  python -m css_tpu.cli.train --expdir exp/h2 "${common[@]}" \
    --model Conformer --objective MSE \
    --num-epochs 60 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 15000 --decay 2e-5 --mse-noise-weight 0.3 \
    --mse-order-weight 0.6 \
    --keep-every 10 --keep-last 3 $(resume_or_init exp/h2) \
    2>&1 | tee -a exp/h2.log && marker h2 exp/h2/best.1.mdl
fi

if step 2 h2ft; then
  init=exp/h2/best.1.mdl; [ -f "$init" ] || init=exp/h2/60.1.mdl
  python -m css_tpu.cli.train --expdir exp/h2ft "${common[@]}" \
    --model Conformer --objective MaskSNR \
    --num-epochs 15 --batches-per-epoch 512 \
    --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
    --average-probe-top 2 --keep-every 3 --keep-last 5 \
    $(resume_or_init exp/h2ft "$init") --seed 11 \
    2>&1 | tee -a exp/h2ft.log && marker h2ft exp/h2ft/best.1.mdl
fi

if step 3 h2ev; then
  evalboth h2ev.log Conformer exp/h2ft/best.1.mdl exp/h2ft/avgtop.1.mdl \
    && marker h2ev exp/h2ev.log
fi

# flagship = best available fine-tune (g2ft consistency branch included)
flagship() {
  for ck in exp/flagship.mdl exp/h2ft/best.1.mdl exp/g2ft/best.1.mdl \
            exp/h1ft/best.1.mdl; do
    [ -f "$ck" ] && { echo "$ck"; return; }
  done
  echo exp/h1/best.1.mdl
}

if step 4 rafresh2; then
  FLAG=$(flagship)
  {
    echo "flagship: $FLAG"
    for seed in 789 1011; do
      echo "== $FLAG MATCHED dense-f0 seed=$seed (reanchor A/B)"
      python scripts/quality_eval.py --checkpoint "$FLAG" \
        --model Conformer --voice formant --f0-max 400 --sessions 8 \
        --seed "$seed" --stratify-f0 --reanchor-ab \
        --workdir "/tmp/qrfM$seed"
      echo "== $FLAG LADDER seed=$seed (reanchor A/B)"
      python scripts/quality_eval.py --checkpoint "$FLAG" \
        --model Conformer --voice formant --sessions 8 \
        --seed "$seed" --stratify-f0 --reanchor-ab \
        --workdir "/tmp/qrfL$seed"
    done
  } 2>&1 | tee exp/reanchor_fresh.log && marker rafresh2 exp/reanchor_fresh.log
fi

if step 5 wer2; then
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor --streaming \
    --workdir /tmp/werq 2>&1 | tee exp/wer_r4.log && marker wer2 exp/wer_r4.log
fi

if step 6 s7b; then
  python -m css_tpu.cli.train --expdir exp/s7 "${common[@]}" \
    --model Conformer --objective MSE --spatialize-channels 7 \
    --num-epochs 30 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 10000 --decay 2e-5 --mse-noise-weight 0.3 \
    --keep-every 10 --keep-last 3 $(resume_or_init exp/s7) \
    2>&1 | tee -a exp/s7.log
  {
    echo "== s7 trained masks, stratified azimuth, 8 sessions"
    python scripts/spatial_quality_eval.py --checkpoint exp/s7/best.1.mdl \
      --stratify-azimuth --sessions 8 --session-sec 30 \
      --voice formant --f0-max 400 --merge
    echo "== same + reanchor"
    python scripts/spatial_quality_eval.py --checkpoint exp/s7/best.1.mdl \
      --stratify-azimuth --sessions 8 --session-sec 30 \
      --voice formant --f0-max 400 --merge --reanchor
  } 2>&1 | tee exp/spatial_strat.log && marker s7b exp/spatial_strat.log exp/s7/best.1.mdl
fi

if step 7 c2b; then
  python -m css_tpu.cli.train --expdir exp/c2 "${common[@]}" \
    --model BLSTM --blstm-causal --objective MSE \
    --num-epochs 20 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 8000 --decay 2e-5 --mse-noise-weight 0.3 \
    --keep-every 10 --keep-last 2 $(resume_or_init exp/c2) \
    2>&1 | tee -a exp/c2.log
  {
    echo "== warm hop-streaming throughput (causal BLSTM)"
    python scripts/hop_bench.py --checkpoint exp/c2/best.1.mdl \
      --model BLSTM --chunk-frames 8 64 --session-sec 30
    echo "== causal BLSTM: offline vs window vs hop"
    python scripts/causal_quality_curve.py --checkpoint exp/c2/best.1.mdl \
      --model BLSTM --voice formant --f0-max 400 --sessions 4 \
      --session-sec 30 --modes offline,window,hop --workdir /tmp/curve_c2
  } 2>&1 | tee exp/curve_c2.log && marker c2b exp/curve_c2.log exp/c2/best.1.mdl
fi

if step 8 c1b; then
  python -m css_tpu.cli.train --expdir exp/c1 "${common[@]}" \
    --model Conformer --conformer-causal --objective MSE \
    --num-epochs 20 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 8000 --decay 2e-5 --mse-noise-weight 0.3 \
    --keep-every 10 --keep-last 2 $(resume_or_init exp/c1) \
    2>&1 | tee -a exp/c1.log
  {
    echo "== causal Conformer: offline vs window vs hop"
    python scripts/causal_quality_curve.py --checkpoint exp/c1/best.1.mdl \
      --model Conformer --voice formant --f0-max 400 --sessions 4 \
      --session-sec 30 --modes offline,window,hop --workdir /tmp/curve_c1
    echo "== warm hop-streaming throughput (causal Conformer)"
    python scripts/hop_bench.py --checkpoint exp/c1/best.1.mdl \
      --model Conformer --chunk-frames 8 64 --session-sec 30
  } 2>&1 | tee exp/curve_c1.log && marker c1b exp/curve_c1.log exp/c1/best.1.mdl
fi

if step 9 benchfinal; then
  {
    echo "== bench.py final (TPU free; drift check run A)"
    python bench.py
    echo "== bench.py final run B"
    python bench.py
  } 2>&1 | tee exp/bench_final.log && marker benchfinal exp/bench_final.log
fi

if step 10 wer7; then
  # VERDICT r4 next #10: WER column for the 7ch MVDR surface (uses the
  # s7 checkpoint trained in step 6; skips cleanly if it failed)
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor \
    --checkpoint-7ch exp/s7/best.1.mdl --model-7ch Conformer \
    --workdir /tmp/werq7 2>&1 | tee exp/wer_7ch.log && marker wer7 exp/wer_7ch.log
fi

if step 11 driftab; then
  # VERDICT r4 next #6: inference-drift A/B (r01 code vs HEAD, interleaved)
  bash scripts/drift_ab.sh 3 && marker driftab exp/drift_ab.log
fi

if step 12 dropbench; then
  # fused Pallas dropout: kernel validation + step A/B on hardware
  # (dropout = ~17% of the step, BASELINE.md round 4)
  python scripts/dropout_kernel_bench.py 2>&1 | tee exp/dropout_bench.log \
    && marker dropbench exp/dropout_bench.log
fi

if step 13 shapes2; then
  # aligned 3-bucket ladder + 257-vs-384 K-tile micro probe
  python scripts/step_shapes.py 2>&1 | tee exp/step_shapes_r5.log \
    && marker shapes2 exp/step_shapes_r5.log
fi

if step 14 ensq; then
  # flagship-scale boundary-offset ensemble A/B (VERDICT r4 next #8):
  # 8-session matched + ladder, reanchor, offsets 1 vs 3
  FLAG=$(flagship)
  {
    echo "flagship: $FLAG"
    for off in 1 3; do
      echo "== MATCHED ensemble_offsets=$off"
      python scripts/quality_eval.py --checkpoint "$FLAG" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
        --ensemble-offsets "$off" --skip-oracle --workdir "/tmp/qEM$off"
      echo "== LADDER ensemble_offsets=$off"
      python scripts/quality_eval.py --checkpoint "$FLAG" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 --reanchor \
        --ensemble-offsets "$off" --skip-oracle --workdir "/tmp/qEL$off"
    done
  } 2>&1 | tee exp/ensemble_ab.log && marker ensq exp/ensemble_ab.log
fi

echo "QUEUE_R4C_DONE"
