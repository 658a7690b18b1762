"""Crash-proof single-run isolation for the protocol wrappers.

Round-4 post-mortem (VERDICT r4, weak #1/#2): multi-run protocol processes
(a) died at import time when a launch context lacked PYTHONPATH, and
(b) leaked ~20 GB of host RSS per completed run (jit executable caches,
device-bank stagings and placement-probe states accumulate per model
instance), OOM-killing seeds 3+ of every multi-seed task.  Neither failure
was detected: the queue treated a crashed task like a finished one.

`run_isolated` fixes all three at once: each run executes in a fresh
``python -m cwn_tpu.exp.run_exp`` subprocess whose environment is built
here (repo root + the axon PJRT plugin dir on PYTHONPATH — never clobbered),
its memory dies with it, a nonzero exit raises ``RunFailed`` with the log
tail after one automatic retry, and the curves come back through a JSON
side-channel (``--curves_json``).  The on-disk XLA compilation cache keeps
repeat compiles warm across processes, so isolation costs only interpreter
startup (~10 s), not recompilation.

The reference has no analogue (its wrappers run everything in one process,
/root/reference/exp/run_mol_exp.py:12-99); this is the operational half of
SURVEY section 5.3 (failure detection) that checkpointing cannot provide.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from typing import Dict, List, Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# The axon PJRT plugin rides PYTHONPATH in this environment; dropping it
# breaks jax init ("Unable to initialize backend 'axon'").  Keep every
# existing entry and make sure the repo root leads.
_AXON_SITE = "/root/.axon_site"


class RunFailed(RuntimeError):
    """A subprocess run exited nonzero even after the retry."""

    def __init__(self, argv: List[str], rc: int, tail: str):
        self.argv, self.rc, self.tail = argv, rc, tail
        super().__init__(
            f"run_exp failed rc={rc} after retry: {' '.join(argv)}\n"
            f"--- log tail ---\n{tail}")


def _child_env() -> dict:
    env = dict(os.environ)
    parts = [REPO_ROOT]
    existing = env.get("PYTHONPATH", "")
    if existing:
        parts.append(existing)
    if _AXON_SITE not in ":".join(parts) and os.path.isdir(_AXON_SITE):
        parts.append(_AXON_SITE)
    env["PYTHONPATH"] = ":".join(parts)
    return env


def run_isolated(argv: List[str], retries: int = 1,
                 timeout: Optional[float] = None,
                 tag: str = "") -> Dict:
    """Run ``cwn_tpu.exp.run_exp`` with ``argv`` in a fresh subprocess.

    Returns the curves dict ``main()`` would have returned.  Output streams
    to our stdout (prefixed lines land in the queue log as before).  On
    nonzero exit the run is retried once (transient tunnel/compile-cache
    races are real), then ``RunFailed`` is raised with the log tail so the
    queue records an explicit failure instead of silence.
    """
    if os.environ.get("CWN_INPROC") == "1":
        # Escape hatch for tests/debugging: run in-process, then drop the
        # jit/device caches the leak analysis implicated.
        from cwn_tpu.exp.parser import get_parser, validate_args
        from cwn_tpu.exp.run_exp import main
        args = get_parser().parse_args(list(argv))
        validate_args(args)
        try:
            return main(args)
        finally:
            release_run_memory()

    last_tail = ""
    for attempt in range(retries + 1):
        fd, curves_path = tempfile.mkstemp(suffix=".json", prefix="curves_")
        os.close(fd)
        cmd = [sys.executable, "-m", "cwn_tpu.exp.run_exp",
               *argv, "--curves_json", curves_path]
        tail: List[str] = []
        try:
            proc = subprocess.Popen(
                cmd, env=_child_env(), cwd=REPO_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            assert proc.stdout is not None
            for line in proc.stdout:
                print(line, end="", flush=True)
                tail.append(line)
                if len(tail) > 40:
                    del tail[0]
            rc = proc.wait(timeout=timeout)
            if rc == 0:
                with open(curves_path) as f:
                    return json.load(f)
            last_tail = "".join(tail)
            note = " (retrying)" if attempt < retries else ""
            print(f"[isolate] FAILED rc={rc}{note}: "
                  f"{tag or ' '.join(argv[:6])}", flush=True)
        finally:
            if os.path.exists(curves_path):
                os.unlink(curves_path)
    raise RunFailed(list(argv), rc, last_tail)


def release_run_memory() -> None:
    """Best-effort in-process cleanup between runs (CWN_INPROC mode).

    Drops the global jit executable cache, the loader's fused-transfer
    unpack cache, and live device buffers that a finished run can strand.
    """
    import gc

    import jax

    from cwn_tpu.train.loader import fused_device_put
    fused_device_put._cache.clear()
    jax.clear_caches()
    gc.collect()
