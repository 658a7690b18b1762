#!/bin/bash
# Round-4 chip queue: runs the remaining protocols sequentially on the TPU.
# Each runner is resumable (cached runs are skipped), so re-running this
# script after an interruption continues where it left off.
#
# Preemption: touch .queue_pause in the repo root and the queue idles
# BETWEEN tasks until the flag is removed (the chip frees up for perf
# work once the current task exits).  The running task's PID is kept in
# .queue_task_pid so a specific task can be stopped without patterns.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
R=exp_results

run_task () {
  while [ -f .queue_pause ]; do sleep 15; done
  echo "[queue $(date +%H:%M:%S)] start: $*"
  "$@" &
  echo $! > .queue_task_pid
  wait $!
  echo "[queue $(date +%H:%M:%S)] done:  $*"
}

run_task python exp_runs/cinpp_zinc.py 200 3 4 5 6 7 8 9
run_task python exp_runs/flow_inv.py 0 1 2 3 4
run_task python exp_runs/csl.py 0
run_task python exp_runs/flow.py id 0 1 2 3 4
run_task python exp_runs/ocean_synth.py 250 0 1 2 3 4
run_task python exp_runs/ring_sweep.py RING-TRANSFER
run_task python exp_runs/ring_sweep.py RING-LOOKUP
run_task python exp_runs/csl.py 1 2
echo "QUEUE COMPLETE"
