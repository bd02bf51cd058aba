#!/usr/bin/env bash
# Inference-throughput drift A/B (VERDICT r4 next #6).
#
# BENCH history: r01 6,654 -> r03 5,946 -> r04 6,172 audio-sec/s/chip.
# Is the ~7-10% swing a code regression (the round-3 feature-path /
# conformer refactor) or tunnel-session variance? Decide it the only
# way that controls for tunnel health: run the EXACT r01 bench (old
# code, git worktree @ round-1 tag) interleaved with the current bench
# in one session, several rounds, and compare minima.
#
#   scripts/drift_ab.sh [rounds]   # writes exp/drift_ab.log
set -uo pipefail
cd "$(dirname "$0")/.."

ROUNDS=${1:-3}
R01=0c98741
WT=/tmp/css_tpu_r01
mkdir -p exp

if [ ! -f "$WT/bench.py" ]; then
  # a wiped /tmp can leave the worktree registered but missing —
  # prune the registration before re-adding, and fail loudly if the
  # add itself fails (an empty A arm would make the whole A/B moot)
  git worktree prune
  rm -rf "$WT"
  git worktree add --detach "$WT" "$R01" || {
    echo "drift_ab: could not create r01 worktree" >&2; exit 1; }
fi

{
  echo "drift A/B: $ROUNDS interleaved rounds, r01=$R01 vs HEAD=$(git rev-parse --short HEAD)"
  for i in $(seq 1 "$ROUNDS"); do
    echo "== round $i: r01 bench"
    (cd "$WT" && timeout 1200 python bench.py) || echo "r01 bench failed"
    echo "== round $i: current bench (inference line only)"
    CSS_TPU_BENCH_SKIP_TRAIN=1 timeout 1800 python bench.py \
      || echo "current bench failed"
  done
} 2>&1 | tee exp/drift_ab.log

# the A/B answered the question only if BOTH arms produced measurements
a_lines=$(grep -c '^{"metric"' exp/drift_ab.log || true)
if [ "$a_lines" -lt 2 ]; then
  echo "drift_ab: fewer than 2 measurement lines ($a_lines) — A/B failed" >&2
  exit 1
fi

echo "DRIFT_AB_DONE"
