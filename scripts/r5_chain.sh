#!/usr/bin/env bash
# Round-5 follow-on chain: finish the extended r4c steps (wer7, drift
# A/B, dropout kernel bench, step-shapes, ensemble A/B — added after the
# running instance read the file), then the r5 seed sweep. Each queue
# runs under the stall watchdog; markers make everything resumable.
set -uo pipefail
cd "$(dirname "$0")/.."

DONE_TAG=QUEUE_R4C DRIVER_LOG=exp/queue_r4c_driver.log \
  bash scripts/tpu_watchdog.sh scripts/tpu_queue_r4c.sh 1

DONE_TAG=QUEUE_R5 DRIVER_LOG=exp/queue_r5_driver.log \
  bash scripts/tpu_watchdog.sh scripts/tpu_queue_r5.sh 1

echo "R5_CHAIN_DONE"
