#!/usr/bin/env bash
# Round-4 queue: the VERDICT r3 measurement + quality items.
#   1 bench     inference-bench drift check (VERDICT #7): bench.py twice
#   2 rafresh   re-anchor validation OFF its tuning seeds (#6): fresh
#               protocol seeds 789/1011, matched + ladder, A/B in-process
#   3 spatial   stratified-azimuth 7ch protocol (#8), trained masks,
#               masking vs MVDR, +reanchor arm (#6 spatial)
#   4 wer       full train->separate->WER loop with the toy ASR (#10)
#   5 curve     latency-vs-quality table completion (#4): offline vs
#               window vs hop for causal Conformer (c1) + causal BLSTM (c2)
#   6 g1        longer MaskSNR fine-tune (40 ep) from f2/best with
#               probe-top averaging (#2, #3) + evals
#   7 g2        consistency-regularized MSE fine-tune from f2/best (#2),
#               then MaskSNR on top + evals
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

FLAG=exp/avg23.mdl   # best surviving flagship 1ch checkpoint

if step 1 r4bench; then
  {
    echo "== bench.py run 1 (drift check, VERDICT r3 #7) =="
    python bench.py
    echo "== bench.py run 2 (variance) =="
    python bench.py
  } 2>&1 | tee exp/bench_r4.log && marker r4bench
fi

if step 2 rafresh; then
  {
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

if step 3 spatial; then
  {
    echo "== s7 trained masks, stratified azimuth [10..180], 8 sessions"
    python scripts/spatial_quality_eval.py --checkpoint exp/s7/best.1.mdl \
      --stratify-azimuth --sessions 8 --session-sec 30 \
      --voice formant --f0-max 400 --merge
    echo "== same + reanchor"
    python scripts/spatial_quality_eval.py --checkpoint exp/s7/best.1.mdl \
      --stratify-azimuth --sessions 8 --session-sec 30 \
      --voice formant --f0-max 400 --merge --reanchor
  } 2>&1 | tee exp/spatial_strat.log && marker spatial
fi

if step 4 wer; then
  {
    echo "== WER loop: $FLAG, matched corpus, reanchor"
    python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
      --session-sec 30 --voice formant --f0-max 400 --reanchor \
      --workdir /tmp/werq
  } 2>&1 | tee exp/wer_r4.log && marker wer
fi

if step 5 curve; then
  {
    echo "== warm hop-streaming throughput (causal BLSTM c2)"
    python scripts/hop_bench.py --checkpoint exp/c2/best.1.mdl \
      --model BLSTM --chunk-frames 8 64 --session-sec 30
    echo "== causal Conformer (c1): offline vs window vs hop"
    python scripts/causal_quality_curve.py --checkpoint exp/c1/best.1.mdl \
      --model Conformer --voice formant --f0-max 400 --sessions 4 \
      --session-sec 30 --modes offline,window,hop --workdir /tmp/curve_c1
    echo "== causal BLSTM (c2): offline vs window vs hop"
    python scripts/causal_quality_curve.py --checkpoint exp/c2/best.1.mdl \
      --model BLSTM --voice formant --f0-max 400 --sessions 4 \
      --session-sec 30 --modes offline,window,hop --workdir /tmp/curve_c2
  } 2>&1 | tee exp/curve_r4.log && marker curve
fi

common=(--model Conformer --synthetic-data --synthetic-speakers 96
        --synthetic-utts 12 --synthetic-f0-max 400 --synthetic-voice formant
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1
        --align-window-frames 128)

if step 6 g1; then
  {
    echo "== g1: MaskSNR 40-epoch fine-tune from f2/best + avgtop 2"
    python -m css_tpu.cli.train --expdir exp/g1 "${common[@]}" \
      --objective MaskSNR --num-epochs 40 --batches-per-epoch 512 \
      --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
      --average-probe-top 2 --keep-every 5 --keep-last 3 \
      --init exp/f2/best.1.mdl --seed 11
    for ck in exp/g1/best.1.mdl exp/g1/avgtop.1.mdl; do
      echo "== $ck MATCHED (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 \
        --reanchor --workdir "/tmp/qg1M$(basename "$ck" .mdl)"
      echo "== $ck LADDER (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 \
        --reanchor --workdir "/tmp/qg1L$(basename "$ck" .mdl)"
    done
  } 2>&1 | tee exp/g1.log && marker g1
fi

if step 7 g2; then
  {
    echo "== g2: consistency-regularized MSE fine-tune from f2/best"
    python -m css_tpu.cli.train --expdir exp/g2 "${common[@]}" \
      --objective MSE --num-epochs 20 --batches-per-epoch 512 \
      --lr 5e-5 --warmup 100 --decay 1e-4 --mse-noise-weight 0.3 \
      --mse-consistency-weight 0.5 --average-probe-top 2 \
      --keep-every 5 --keep-last 3 --init exp/f2/best.1.mdl --seed 13
    echo "== g2ft: MaskSNR 15-epoch fine-tune from g2/best + avgtop 2"
    python -m css_tpu.cli.train --expdir exp/g2ft "${common[@]}" \
      --objective MaskSNR --num-epochs 15 --batches-per-epoch 512 \
      --lr 2e-5 --warmup 100 --decay 1e-4 --masksnr-mag-weight 0.05 \
      --average-probe-top 2 --keep-every 3 --keep-last 3 \
      --init exp/g2/best.1.mdl --seed 17
    for ck in exp/g2/best.1.mdl exp/g2ft/best.1.mdl exp/g2ft/avgtop.1.mdl; do
      echo "== $ck MATCHED (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --f0-max 400 --sessions 8 --stratify-f0 \
        --reanchor --workdir "/tmp/qg2M$(basename "$ck" .mdl)"
      echo "== $ck LADDER (stratified, reanchor)"
      python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
        --voice formant --sessions 8 --stratify-f0 \
        --reanchor --workdir "/tmp/qg2L$(basename "$ck" .mdl)"
    done
  } 2>&1 | tee exp/g2.log && marker g2
fi

echo "QUEUE_R4_DONE"
