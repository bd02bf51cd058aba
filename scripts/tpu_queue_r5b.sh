#!/usr/bin/env bash
# Round-5 session-B queue (post-reset). The environment wipe destroyed
# exp/ again; everything below either closes a VERDICT r4 item whose
# harness existed but never produced a number, or runs the r5 seed
# sweep (which needs the h2 MSE base rebuilt — it was never persisted).
#
# Ordered by value-per-minute so a truncated session still lands
# results: fast hardware benches, then flagship-scale evals that need
# NO training (boundary-offset ensemble A/B, streaming WER), then the
# causal latency/quality table (VERDICT r4 next #2's last open item),
# then the h2 rebuild + MaskSNR seed sweep with evals interleaved per
# seed, then the 7ch rebuild for the WER 7ch column.
#
#   scripts/tpu_watchdog.sh scripts/tpu_queue_r5b.sh
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

# The surviving flagship: h2ft seed-11 best (slim f16, in git).
flagship() {
  for ck in exp/flagship.mdl exp/h2ft/best.1.mdl; do
    [ -f "$ck" ] && { echo "$ck"; return; }
  done
  echo checkpoints/h2ft_masksnr_best.mdl
}

common=(--synthetic-data --synthetic-speakers 96 --synthetic-utts 12
        --synthetic-f0-max 400 --synthetic-voice formant
        --batch-size 32 --optim adam --weight-decay 0.01 --grad-thresh 5.0
        --keep-best --validate-batches 16 --probe-sessions 4
        --device-mix --bf16 --steps-per-dispatch 16 --num-workers 2 --job 1)

# ---- fast hardware benches ------------------------------------------------

if step 1 dropbench; then
  # fused Pallas dropout: kernel validation + step A/B on hardware
  # (dropout = ~17% of the step, BASELINE.md round 4)
  python scripts/dropout_kernel_bench.py 2>&1 | tee exp/dropout_bench.log \
    && marker dropbench exp/dropout_bench.log
fi

if step 2 shapes2; then
  # aligned 3-bucket ladder + 257-vs-384 K-tile micro probe
  python scripts/step_shapes.py 2>&1 | tee exp/step_shapes_r5.log \
    && marker shapes2 exp/step_shapes_r5.log
fi

if step 3 driftab; then
  # VERDICT r4 next #6: inference-drift A/B (r01 code vs HEAD, interleaved)
  bash scripts/drift_ab.sh 3 && marker driftab exp/drift_ab.log
fi

# ---- flagship-scale evals, no training needed -----------------------------

if step 4 ensq; then
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

if step 5 wers; then
  # streaming-executor WER column (VERDICT r4 next #10)
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor --streaming \
    --workdir /tmp/werq_s 2>&1 | tee exp/wer_streaming.log \
    && marker wers exp/wer_streaming.log
fi

# ---- causal latency/quality table (VERDICT r4 next #2, last open item) ----

if step 6 c2b; then
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

if step 7 c1b; then
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

# ---- h2 rebuild + MaskSNR seed sweep (r5 basin-variance test) -------------

if step 8 h2r; then
  # exact round-3 f2 recipe (5 unaligned buckets, order loss 0.6);
  # same config as the r4c h2 whose fine-tune (seed 11) scored
  # +2.49 matched / +2.89 ladder. Persist the base slim this time so a
  # wipe can never force this rebuild again.
  python -m css_tpu.cli.train --expdir exp/h2 "${common[@]}" \
    --model Conformer --objective MSE \
    --num-epochs 60 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 15000 --decay 2e-5 --mse-noise-weight 0.3 \
    --mse-order-weight 0.6 \
    --keep-every 10 --keep-last 3 $(resume_or_init exp/h2) \
    2>&1 | tee -a exp/h2.log \
    && python scripts/persist_checkpoint.py --in exp/h2/best.1.mdl \
         --out checkpoints/h2_mse_best.mdl 2>&1 | tee -a exp/h2.log \
    && marker h2r exp/h2/best.1.mdl checkpoints/h2_mse_best.mdl
fi

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

evboth() { # evboth <log> <ck>: matched + ladder, stratified, reanchor
  local log=$1 ck=$2 tag
  tag=$(echo "$ck" | tr '/.' '__')
  {
    echo "== $ck MATCHED dense-f0 (stratified, reanchor)"
    python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
      --voice formant --f0-max 400 --sessions 8 --stratify-f0 --reanchor \
      --skip-oracle --workdir "/tmp/qM_$tag"
    echo "== $ck LADDER (stratified, reanchor)"
    python scripts/quality_eval.py --checkpoint "$ck" --model Conformer \
      --voice formant --sessions 8 --stratify-f0 --reanchor \
      --skip-oracle --workdir "/tmp/qL_$tag"
  } 2>&1 | tee "exp/$log"
}

# per-run selection by the legacy within-run probe (its only validated
# role); cross-seed promotion strictly on the full protocol evals below
if step 9 ft22; then
  ft exp/ft22 22 && marker ft22 exp/ft22/avgtop.1.mdl
fi
if step 10 ev22; then
  evboth ev22.log exp/ft22/avgtop.1.mdl && marker ev22 exp/ev22.log
fi
if step 11 ft33; then
  ft exp/ft33 33 && marker ft33 exp/ft33/avgtop.1.mdl
fi
if step 12 ev33; then
  evboth ev33.log exp/ft33/avgtop.1.mdl && marker ev33 exp/ev33.log
fi
if step 13 ft44; then
  ft exp/ft44 44 && marker ft44 exp/ft44/avgtop.1.mdl
fi
if step 14 ev44; then
  evboth ev44.log exp/ft44/avgtop.1.mdl && marker ev44 exp/ev44.log
fi

# ---- 7ch rebuild for the WER 7ch column (VERDICT r4 next #10) -------------

if step 15 s7r; then
  python -m css_tpu.cli.train --expdir exp/s7 "${common[@]}" \
    --model Conformer --objective MSE --spatialize-channels 7 \
    --num-epochs 30 --batches-per-epoch 512 \
    --lr 1e-4 --warmup 10000 --decay 2e-5 --mse-noise-weight 0.3 \
    --keep-every 10 --keep-last 3 $(resume_or_init exp/s7) \
    2>&1 | tee -a exp/s7.log \
    && python scripts/persist_checkpoint.py --in exp/s7/best.1.mdl \
         --out checkpoints/s7_mse_best.mdl 2>&1 | tee -a exp/s7.log \
    && marker s7r exp/s7/best.1.mdl checkpoints/s7_mse_best.mdl
fi

if step 16 wer7; then
  FLAG=$(flagship)
  python scripts/wer_demo.py --checkpoint "$FLAG" --sessions 4 \
    --session-sec 30 --voice formant --f0-max 400 --reanchor \
    --checkpoint-7ch exp/s7/best.1.mdl --model-7ch Conformer \
    --workdir /tmp/werq7 2>&1 | tee exp/wer_7ch.log && marker wer7 exp/wer_7ch.log
fi

if step 17 benchfinal; then
  {
    echo "== bench.py final (drift check run A)"
    python bench.py
    echo "== bench.py final run B"
    python bench.py
  } 2>&1 | tee exp/bench_final.log && marker benchfinal exp/bench_final.log
fi

echo "QUEUE_R5B_DONE"
