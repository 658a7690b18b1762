"""OCEAN-SYNTH protocol: the mpsn-ocean.sh config end-to-end
(/root/reference/exp/scripts/mpsn-ocean.sh: edge_orient, 4 layers, emb 64,
bs 64, 250 epochs, test_orient random, StepLR decay 50, 5 seeds) on the
synthetic drifter stand-in, for both paper nonlinearities (id, tanh).

Usage: python exp_runs/ocean_synth.py [epochs] [seed ...]
Resumable: completed (nonlinearity, seed) runs are cached in the JSON.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exp_results", "ocean_synth.json")


def run_one(nonlinearity: str, seed: int, epochs: int):
    argv = [
        "--dataset", "OCEAN-SYNTH", "--model", "edge_orient",
        "--epochs", str(epochs), "--batch_size", "64",
        "--num_layers", "4", "--emb_dim", "64", "--lr", "0.001",
        "--nonlinearity", nonlinearity, "--drop_rate", "0.0",
        "--task_type", "classification", "--eval_metric", "accuracy",
        "--test_orient", "random",
        "--lr_scheduler", "StepLR", "--lr_scheduler_decay_steps", "50",
        "--exp_name", f"ocean-synth-{nonlinearity}", "--seed", str(seed)]
    curves = run_isolated(argv, tag=f"ocean-{nonlinearity}/s{seed}")
    return {"best_epoch": curves["best_epoch"],
            "best_val": curves["best_val"],
            "test_at_best": curves["test_at_best"],
            "last_val": curves["last_val"]}


def run(epochs: int, seeds, nls=("tanh", "id")):
    results = {}
    failed = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("runs", {})
    for seed in seeds:
        for nl in nls:
            k = f"{nl}/s{seed}"
            if k in results:
                print(f"{k}: cached")
                continue
            try:
                results[k] = run_one(nl, seed, epochs)
            except RunFailed as e:
                print(f"[ocean-synth] {k} FAILED rc={e.rc} — continuing",
                      flush=True)
                failed.append(k)
                continue
            print(f"[ocean-synth] {k}: {results[k]}", flush=True)
            _dump(results, epochs)
    _dump(results, epochs)
    print(f"[ocean-synth] COMPLETE ({len(results)} runs, "
          f"{len(failed)} failed: {failed})")
    return failed


def _dump(results, epochs):
    by_nl = {}
    for k, v in results.items():
        by_nl.setdefault(k.split("/")[0], []).append(v["test_at_best"])
    with open(OUT, "w") as f:
        json.dump({
            "note": "OCEAN-SYNTH (synthetic drifters around an island, "
                    "ocean pipeline semantics), mpsn-ocean.sh config: "
                    f"edge_orient 4x64, bs 64, {epochs} epochs, StepLR(50), "
                    "test_orient random; test accuracy at best val",
            "mean_test_acc": {m: float(np.mean(v)) for m, v in by_nl.items()},
            "std_test_acc": {m: float(np.std(v)) for m, v in by_nl.items()},
            "runs": results}, f, indent=1)


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    rest = sys.argv[2:]
    # Optional nonlinearity filter ("tanh"/"id") so each (nl, seed) run can
    # live in its own process — a long-lived axon process accumulates host
    # RSS with dispatch count (flow_inv was OOM-killed at ~81 GB).
    nls = tuple(a for a in rest if a in ("tanh", "id")) or ("tanh", "id")
    seeds = [int(s) for s in rest if s not in ("tanh", "id")]
    sys.exit(1 if run(epochs, seeds or [0, 1, 2, 3, 4], nls=nls) else 0)
