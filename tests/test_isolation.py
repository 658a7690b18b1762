"""Run isolation (cwn_tpu.exp.isolate): the round-4 post-mortem guards.

Round 4 lost six protocol tasks to two operational failures the framework
did not detect: runners crashing at import time in launch contexts without
PYTHONPATH, and ~20 GB/run host-RSS growth OOM-killing multi-seed
processes.  These tests pin the fixes: subprocess isolation returns
curves and raises on failure (after a retry), and the in-process
fallback's memory stays bounded across repeated runs.
"""
import json
import os
import resource
import subprocess
import sys

import pytest

from cwn_tpu.exp.isolate import REPO_ROOT, RunFailed, run_isolated

TINY = ["--dataset", "DUMMY", "--model", "sparse_cin", "--device", "-1",
        "--epochs", "2", "--batch_size", "4", "--emb_dim", "8",
        "--num_layers", "1", "--lr_scheduler", "None",
        "--exp_name", "isolation-test", "--seed", "0"]


def test_run_isolated_subprocess_returns_curves():
    curves = run_isolated(TINY, retries=0)
    assert curves["best_epoch"] in (0, 1)
    assert len(curves["val"]) == 2
    assert "test_at_best" in curves


def test_run_isolated_failure_raises_with_tail():
    bad = TINY[:]
    bad[bad.index("sparse_cin")] = "no_such_model"
    with pytest.raises(RunFailed) as e:
        run_isolated(bad, retries=0)
    assert e.value.rc != 0
    assert "no_such_model" in e.value.tail or "Unknown model" in e.value.tail


def test_runner_self_bootstrap_no_pythonpath():
    """Every exp_runs runner must import cleanly WITHOUT PYTHONPATH —
    the round-4 queue lost six tasks to ModuleNotFoundError in launch
    contexts missing the export."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    for runner in ("cinpp_zinc", "csl", "flow", "flow_inv", "ocean_synth",
                   "ring_sweep", "ref_zinc_train"):
        path = os.path.join(REPO_ROOT, "exp_runs", f"{runner}.py")
        # Import the module only (no __main__): compile+exec the imports.
        proc = subprocess.run(
            [sys.executable, "-c",
             "import importlib.util, sys\n"
             f"spec = importlib.util.spec_from_file_location('r', {path!r})\n"
             "m = importlib.util.module_from_spec(spec)\n"
             "spec.loader.exec_module(m)\n"
             f"assert {REPO_ROOT!r} in sys.path, "
             "'runner did not self-insert the repo root'"],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, (runner, proc.stderr[-2000:])


def test_inproc_runs_release_memory(monkeypatch):
    """CWN_INPROC=1 path: three tiny runs in one process must not grow
    RSS unboundedly (the leak class that OOM-killed round-4 multi-seed
    tasks leaked ~hundreds of MB per run even at toy scale)."""
    monkeypatch.setenv("CWN_INPROC", "1")

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    run_isolated(TINY)                     # warm: compile caches, imports
    base = rss_mb()
    for seed in (1, 2, 3):
        argv = TINY[:]
        argv[argv.index("--seed") + 1] = str(seed)
        run_isolated(argv)
    growth = rss_mb() - base
    assert growth < 300.0, f"RSS grew {growth:.0f} MB over 3 tiny runs"
