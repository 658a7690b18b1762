#!/bin/bash
# Wave 2: seeds that predate the ReduceLROnPlateau rel-threshold parity
# fix, rerun under the fixed scheduler so every protocol's seeds share
# one semantics.  Run AFTER queue_r5.sh completes.
set -u
cd "$(dirname "$0")/.."
DONE=(); FAILED=()
run_task () {
  while [ -f .queue_pause ]; do sleep 15; done
  echo "[queue2 $(date +%H:%M:%S)] start: $*"
  "$@" & echo $! > .queue_task_pid; wait $!; rc=$?
  if [ $rc -ne 0 ]; then
    echo "[queue2 $(date +%H:%M:%S)] rc=$rc, retrying once: $*"
    "$@" & echo $! > .queue_task_pid; wait $!; rc=$?
  fi
  if [ $rc -eq 0 ]; then echo "[queue2 $(date +%H:%M:%S)] done: $*"; DONE+=("$*");
  else echo "[queue2 $(date +%H:%M:%S)] FAILED rc=$rc: $*"; FAILED+=("$*"); fi
}
run_task python exp_runs/csl.py 0
run_task python exp_runs/cinpp_zinc.py 200 0 1 2 3
echo "[queue2] summary: ${#DONE[@]} done, ${#FAILED[@]} failed"
for t in ${FAILED[@]+"${FAILED[@]}"}; do echo "[queue2] FAILED: $t"; done
echo "QUEUE2 COMPLETE"
