"""HBM placement autotuning for donated train states.

Measured on the single tunneled TPU chip (PERF.md "placement lottery"):
the SAME compiled train step on the SAME data varies up to ~1.9x in step
time purely with where the donated params/opt-state buffers landed in
HBM — re-initialising the state re-rolls the step time while standalone
kernel timings stay stable.  Because `donate_argnums` makes every
subsequent step reuse the same buffers, the allocation chosen at t=0 is
the allocation for the whole run.

`tune_state_placement` turns that lottery into a one-time probe: allocate
the state `allocs` times, time a few donated steps on each candidate, and
keep the fastest.  The probe costs `allocs * iters * windows` steps once
per process and pins the *typical* step at the best observed placement.

Note: probing runs real donated steps, so the returned state has advanced
`iters * windows + 1` optimizer steps on the probe batch (from identical
init values each time).  The benchmark and throughput paths use this
freely; training protocols that must start from exact step 0 should keep
it disabled (exp/parser.py `--tune_placement`).
"""
from __future__ import annotations

import time
from typing import Callable, List, Sequence, Tuple

import jax

__all__ = ["tune_state_placement"]


def _time_candidate(step: Callable, state: Sequence, batch,
                    iters: int, windows: int) -> Tuple[tuple, float]:
    out = step(*state, batch)                     # warmup (compile cached)
    state = out[:-1]
    jax.block_until_ready(out[-1])
    dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*state, batch)
            state = out[:-1]
        jax.block_until_ready(out[-1])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return tuple(state), dt


def tune_state_placement(make_state: Callable[[], Sequence],
                         step: Callable, batch, *, allocs: int = 4,
                         iters: int = 20, windows: int = 2
                         ) -> Tuple[tuple, float, List[float]]:
    """Pick the fastest of `allocs` independent state allocations.

    make_state() -> state tuple (fresh device allocation, identical values
    each call); step(*state, batch) -> (*state', aux) with the state
    donated.  Returns (best_state, best_step_time_s, all_probe_times_s).
    """
    assert allocs >= 1
    best_state, best_dt = None, float("inf")
    times: List[float] = []
    for _ in range(allocs):
        state, dt = _time_candidate(step, make_state(), batch, iters, windows)
        times.append(dt)
        if dt < best_dt:
            best_state, best_dt = state, dt
        else:
            del state   # free the slower candidate's buffers immediately
    return best_state, best_dt, times
