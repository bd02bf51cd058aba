#!/usr/bin/env bash
# Round-4 continuation queue. The environment reset wiped exp/ (all
# round-3 checkpoints incl. the avg23 flagship), so this queue rebuilds
# the flagship lineage from scratch and then runs the VERDICT r3
# measurement items against the fresh checkpoints:
#   1 bench    inference-bench drift check (VERDICT #7)
#   2 smoke    2-epoch micro-train exercising the new round-4 flags
#              (--align-window-frames, probe modes, --average-probe-top)
#              before committing to long runs
#   3 h1       flagship MSE pretrain (f1 recipe + aligned windows)
#   4 h1ft     MaskSNR 40-epoch fine-tune + --average-probe-top 2
#              (VERDICT #2 longer-schedule lever, #3 shipped recipe)
#   5 h1ftev   matched + ladder evals (stratified, reanchor) for
#              best + avgtop
#   6 g2       consistency-regularized MSE fine-tune from h1/best,
#              then MaskSNR on top, + evals (VERDICT #2 main lever)
#   7 rafresh  re-anchor A/B on fresh protocol seeds 789/1011 (#6)
#   8 wer      full train->separate->toy-WER table (#10)
#   9 s7       7ch retrain (30 ep) + stratified-azimuth spatial eval
#              masking vs MVDR +/- reanchor (#8, #6-spatial)
#  10 c2       causal BLSTM retrain + hop-streaming warm-rate bench +
#              offline/window/hop quality curve (#4)
#  11 c1       causal Conformer retrain + curve (#4)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

resume_or_init() { # resume_or_init <expdir> [init.mdl]: echo train flags.
  # Auto-resume from the newest epoch checkpoint if the step was killed
  # mid-run (tunnel-wedge watchdog restarts); otherwise warm-start from
  # the optional --init checkpoint. --init must be dropped on resume:
  # cli.train applies --init AFTER --resume and would clobber the
  # resumed params (train.py:472-479 ordering).
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
    [ "$n_eval" -ge 1 ]  # zero checkpoints evaluated = step failed (ADVICE r4)
  } 2>&1 | tee "exp/$log"
}

common=(--synthetic-data --synthetic-speakers 96 --synthetic-utts 12
        --synthetic-f0-max 400 --synthetic-voice formant
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1
        --align-window-frames 128)

if step 1 r4bench; then
  {
    echo "== bench.py run 1 (drift check, VERDICT r3 #7)"
    python bench.py
    echo "== bench.py run 2 (variance)"
    python bench.py
  } 2>&1 | tee exp/bench_r4.log && marker r4bench
fi

if step 2 smoke; then
  python -m css_tpu.cli.train --expdir exp/smoke "${common[@]}" \
    --model Conformer --objective MaskSNR --masksnr-mag-weight 0.05 \
    --num-epochs 2 --batches-per-epoch 32 --lr 2e-5 --warmup 20 \
    --decay 1e-4 --average-probe-top 2 --keep-every 1 --keep-last 2 \
    --seed 7 2>&1 | tee exp/smoke.log && marker smoke
fi

if step 3 h1; then
  python -m css_tpu.cli.train --expdir exp/h1 "${common[@]}" \
    --model Conformer --objective MSE \
    --num-epochs 60 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 15000 --decay 2e-5 --mse-noise-weight 0.3 \
    --keep-every 10 --keep-last 3 $(resume_or_init exp/h1) \
    2>&1 | tee -a exp/h1.log && marker h1
fi

if step 4 h1ft; then
  init=exp/h1/best.1.mdl; [ -f "$init" ] || init=exp/h1/60.1.mdl
  python -m css_tpu.cli.train --expdir exp/h1ft "${common[@]}" \
    --model Conformer --objective MaskSNR \
    --num-epochs 40 --batches-per-epoch 512 \
    --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
    --average-probe-top 2 --keep-every 5 --keep-last 3 \
    $(resume_or_init exp/h1ft "$init") --seed 11 \
    2>&1 | tee -a exp/h1ft.log && marker h1ft
fi

if step 5 h1ftev; then
  evalboth h1ftev.log Conformer exp/h1ft/best.1.mdl exp/h1ft/avgtop.1.mdl \
    && marker h1ftev
fi

if step 6 g2; then
  {
    python -m css_tpu.cli.train --expdir exp/g2 "${common[@]}" \
      --model Conformer --objective MSE \
      --num-epochs 20 --batches-per-epoch 512 \
      --lr 5e-5 --warmup 100 --decay 1e-4 --mse-noise-weight 0.3 \
      --mse-consistency-weight 0.5 --average-probe-top 2 \
      --keep-every 5 --keep-last 3 \
      $(resume_or_init exp/g2 exp/h1/best.1.mdl) --seed 13
    python -m css_tpu.cli.train --expdir exp/g2ft "${common[@]}" \
      --model Conformer --objective MaskSNR \
      --num-epochs 15 --batches-per-epoch 512 \
      --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
      --average-probe-top 2 --keep-every 3 --keep-last 3 \
      $(resume_or_init exp/g2ft exp/g2/best.1.mdl) --seed 17
  } 2>&1 | tee exp/g2.log
  evalboth g2ev.log Conformer exp/g2ft/best.1.mdl exp/g2ft/avgtop.1.mdl \
    && marker g2
fi

# flagship = probe-top average of the best fine-tune if present
flagship() {
  for ck in exp/g2ft/avgtop.1.mdl exp/h1ft/avgtop.1.mdl \
            exp/h1ft/best.1.mdl; do
    [ -f "$ck" ] && { echo "$ck"; return; }
  done
  echo exp/h1/best.1.mdl
}

if step 7 rafresh; then
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
  } 2>&1 | tee exp/reanchor_fresh.log && marker rafresh
fi

if step 8 wer; then
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor \
    --workdir /tmp/werq 2>&1 | tee exp/wer_r4.log && marker wer
fi

if step 9 s7; then
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
  } 2>&1 | tee exp/spatial_strat.log && marker s7
fi

if step 10 c2; then
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
  } 2>&1 | tee exp/curve_c2.log && marker c2
fi

if step 11 c1; then
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
  } 2>&1 | tee exp/curve_c1.log && marker c1
fi

echo "QUEUE_R4B_DONE"
