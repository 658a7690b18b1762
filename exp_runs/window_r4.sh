#!/bin/bash
# Round-4 mid-queue window, take 2.  Waits for the already-running CSL
# fold process (WAIT_PID) to release the chip, then runs the remaining
# fast protocols ONE SEED PER PROCESS (flow_inv leaked ~20 GB/seed within
# one process and was OOM-killed at seed 3 — separate processes bound the
# leak), the clean benchmark, and the remaining ZINC seeds, then hands
# the chip back to the paused main queue.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
R=exp_results

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi

echo "[window2 $(date +%H:%M:%S)] chip acquired"
for s in 0 1 2 3 4; do
  python exp_runs/flow.py id $s       >> $R/queue_r4.log 2>&1
done
echo "[window2 $(date +%H:%M:%S)] bench"
python bench.py                       >  $R/bench_r4_preview.json 2> $R/bench_r4_preview.log
for s in 4 5 6 7 8 9; do
  python exp_runs/cinpp_zinc.py 200 $s >> $R/queue_r4.log 2>&1
done
for s in 3 4; do
  python exp_runs/flow_inv.py $s      >> $R/queue_r4.log 2>&1
done
rm -f .queue_pause
echo "[window2 $(date +%H:%M:%S)] released queue"
