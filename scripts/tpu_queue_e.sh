#!/usr/bin/env bash
# Round-3 queue E: corrected dispatch/transfer probe (the earlier run
# died on a clobbered PYTHONPATH: /root/.axon_site/sitecustomize.py is
# how the accelerator plugin registers), f2ft+f3 weight averaging (same
# basin: f3 warm-started from f2ft best), and a window-length A/B.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

start=${1:-1}
marker() { mkdir -p exp/.queue && touch "exp/.queue/$1.done"; }
done_already() { [ -f "exp/.queue/$1.done" ]; }
step() { [ "$start" -le "$1" ] && ! done_already "$2"; }

if step 1 dprobe2; then
  python scripts/dispatch_probe.py --groups 16 64 --iters 8 \
    --loop --loop-steps 256 \
    2>&1 | tee exp/dispatch_probe2.log && marker dprobe2
fi

if step 2 avg23; then
  {
    python -m css_tpu.cli.combine exp/avg23.mdl \
      --models exp/f2ft/best.1.mdl exp/f3/best.1.mdl
    echo "== exp/avg23.mdl (LADDER, stratified, reanchor)"
    python scripts/quality_eval.py --checkpoint exp/avg23.mdl \
      --model Conformer --voice formant --sessions 8 --stratify-f0 \
      --reanchor --workdir /tmp/qeavgL
    echo "== exp/avg23.mdl (MATCHED dense-f0, stratified, reanchor)"
    python scripts/quality_eval.py --checkpoint exp/avg23.mdl \
      --model Conformer --voice formant --f0-max 400 --sessions 8 \
      --stratify-f0 --reanchor --workdir /tmp/qeavgM
  } 2>&1 | tee exp/avg23.log && marker avg23
fi

if step 3 winlen; then
  {
    for ew in 3.2 4.0; do
      echo "== f3 best MATCHED eval_win=$ew (reanchor)"
      python scripts/quality_eval.py --checkpoint exp/f3/best.1.mdl \
        --model Conformer --voice formant --f0-max 400 --sessions 8 \
        --stratify-f0 --reanchor --eval-win "$ew" \
        --workdir "/tmp/qewin$ew"
    done
  } 2>&1 | tee exp/winlen.log && marker winlen
fi

echo "queue E complete"
