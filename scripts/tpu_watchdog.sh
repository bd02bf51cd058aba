#!/usr/bin/env bash
# Stall watchdog for TPU queue scripts on the tunneled dev backend.
#
# Failure mode observed (round 4): the axon tunnel wedges a CLIENT at
# random — the process blocks forever on one RPC (zero CPU accrual for
# 20+ min) while the backend stays healthy for fresh clients (a
# trivial matmul in a new process compiles and runs in ~1 s at the same
# moment). Legit remote compiles also show zero CPU, but finish in
# <5 min. So: restart the queue when its process GROUP accrues zero CPU
# for STALL_MIN consecutive minutes. Queue steps are marker-resumable,
# so completed work is never redone.
#
#   scripts/tpu_watchdog.sh scripts/tpu_queue_r4b.sh [start_step]
set -uo pipefail
cd "$(dirname "$0")/.."

QUEUE=${1:?queue script}
START=${2:-1}
STALL_MIN=${STALL_MIN:-10}
MAX_RESTARTS=${MAX_RESTARTS:-30}
DONE_TAG=${DONE_TAG:-QUEUE}
DRIVER_LOG=${DRIVER_LOG:-exp/queue_driver.log}

group_cpu() { # total cumulative CPU (centiseconds) of process group $1
  local total=0 pid
  for pid in $(ps -o pid= -g "$1" 2>/dev/null); do
    if [ -r "/proc/$pid/stat" ]; then
      # fields 14/15 = utime/stime in clock ticks; comm can contain
      # spaces so cut everything before the last ')' first
      local stat
      stat=$(cat "/proc/$pid/stat" 2>/dev/null) || continue
      stat=${stat##*) }
      set -- $stat
      total=$((total + ${12:-0} + ${13:-0}))
    fi
  done
  echo "$total"
}

mkdir -p exp
for attempt in $(seq 1 "$MAX_RESTARTS"); do
  echo "[watchdog] attempt $attempt: starting $QUEUE $START" \
    | tee -a exp/watchdog.log
  setsid bash "$QUEUE" "$START" >> "$DRIVER_LOG" 2>&1 &
  QPID=$!
  PGID=$(ps -o pgid= -p "$QPID" | tr -d ' ')
  stalled=0 last=-1
  while kill -0 "$QPID" 2>/dev/null; do
    sleep 60
    cur=$(group_cpu "$PGID")
    if [ "$cur" = "$last" ]; then
      stalled=$((stalled + 1))
    else
      stalled=0
    fi
    last=$cur
    if [ "$stalled" -ge "$STALL_MIN" ]; then
      echo "[watchdog] $(date -u +%H:%M:%S) pgid $PGID stalled" \
           "($STALL_MIN min zero CPU) — killing group" \
        | tee -a exp/watchdog.log
      kill -TERM -- "-$PGID" 2>/dev/null
      sleep 10
      kill -KILL -- "-$PGID" 2>/dev/null
      break
    fi
  done
  wait "$QPID" 2>/dev/null
  if grep -q "${DONE_TAG}.*DONE" "$DRIVER_LOG" 2>/dev/null; then
    echo "[watchdog] queue finished" | tee -a exp/watchdog.log
    exit 0
  fi
  sleep 15
done
echo "[watchdog] gave up after $MAX_RESTARTS attempts" \
  | tee -a exp/watchdog.log
exit 1
