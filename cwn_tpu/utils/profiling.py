"""Step timing and jax.profiler trace hooks."""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

import jax

logger = logging.getLogger("cwn_tpu")


class StepTimer:
    """Wall-clock step statistics with warmup exclusion (compile steps)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": float("nan"), "steps": 0}
        ts = sorted(self.times)
        return {
            "mean_s": self.mean,
            "p50_s": ts[len(ts) // 2],
            "max_s": ts[-1],
            "steps": len(ts),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)
