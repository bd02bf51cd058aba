# Shared helpers for marker-resumable TPU queue scripts.
#
# Source from a queue script (after cd to the repo root):
#   . scripts/queue_lib.sh
#
# marker <name> <artifact...>: record a step done ONLY after every
# declared output artifact exists non-empty (VERDICT r4 weak #5: a bare
# touch-file let never-run steps read as done, silently skipping a whole
# measurement round on watchdog restart). The marker file records the
# artifact list; done_already re-verifies each one, so an empty or
# hand-touched marker no longer skips a step, and a marker whose
# artifacts were later deleted re-runs the step.
#
# Canonical copy of the helpers embedded in scripts/tpu_queue_r4c.sh
# (kept inline there because editing a running bash script corrupts the
# running instance); tested by tests/test_queue_lib.py.

QUEUE_MARKER_DIR=${QUEUE_MARKER_DIR:-exp/.queue}

marker() {
  local name=$1; shift
  [ "$#" -ge 1 ] || {
    echo "[queue] marker $name: no artifacts declared" >&2
    return 1
  }
  local a
  for a in "$@"; do
    [ -s "$a" ] || {
      echo "[queue] marker $name REFUSED: missing/empty artifact $a" >&2
      return 1
    }
  done
  mkdir -p "$QUEUE_MARKER_DIR"
  printf '%s\n' "$@" > "$QUEUE_MARKER_DIR/$name.done"
}

done_already() {
  local f="$QUEUE_MARKER_DIR/$1.done" line any=0
  [ -s "$f" ] || return 1
  while IFS= read -r line; do
    [ -n "$line" ] || continue
    [ -s "$line" ] || return 1
    any=1
  done < "$f"
  [ "$any" -eq 1 ]
}

# step <index> <name>: run the step when start <= index and the step's
# marker does not verify. Queue scripts set `start` (default 1).
step() { [ "${start:-1}" -le "$1" ] && ! done_already "$2"; }
