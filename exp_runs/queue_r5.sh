#!/bin/bash
# Round-5 TPU chip queue: the remaining protocol evidence, serialized on
# the one tunneled chip.  Round-4 failure modes are closed:
#   - every runner self-bootstraps sys.path (no PYTHONPATH dependence),
#   - every (seed,fold) run executes in its own subprocess via
#     cwn_tpu.exp.isolate.run_isolated (the ~20 GB/run RSS leak dies with
#     the child; a crash raises instead of silently vanishing),
#   - run_task checks the exit code, retries the task once (cached runs
#     are skipped on the retry), and the queue ends with an explicit
#     done/failed summary.
#
# Preemption: touch .queue_pause in the repo root and the queue idles
# BETWEEN tasks until the flag is removed.  The running task's PID is in
# .queue_task_pid so a specific task can be stopped without patterns.
set -u
cd "$(dirname "$0")/.."
DONE=()
FAILED=()

run_task () {
  while [ -f .queue_pause ]; do sleep 15; done
  echo "[queue $(date +%H:%M:%S)] start: $*"
  "$@" &
  echo $! > .queue_task_pid
  wait $!
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "[queue $(date +%H:%M:%S)] rc=$rc, retrying once: $*"
    while [ -f .queue_pause ]; do sleep 15; done
    "$@" &
    echo $! > .queue_task_pid
    wait $!
    rc=$?
  fi
  if [ $rc -eq 0 ]; then
    echo "[queue $(date +%H:%M:%S)] done:  $*"
    DONE+=("$*")
  else
    echo "[queue $(date +%H:%M:%S)] FAILED rc=$rc: $*"
    FAILED+=("$*")
  fi
}

# Order: fast protocol completions first (bank results early), then the
# two long multi-seed blocks; OCEAN last (largest uniform-path block, so
# it picks up any kernel improvements landed mid-round).
run_task python exp_runs/flow.py id 0 1 2 3 4
run_task python exp_runs/flow_inv.py 0 1 2 3 4
run_task python exp_runs/csl.py 1 2 3 4
run_task python exp_runs/cinpp_zinc.py 200 4 5 6 7 8 9
run_task python exp_runs/ocean_synth.py 250 0 1 2 3 4

echo "[queue] summary: ${#DONE[@]} done, ${#FAILED[@]} failed"
for t in ${FAILED[@]+"${FAILED[@]}"}; do echo "[queue] FAILED: $t"; done
echo "QUEUE COMPLETE"
