"""Long-range ring sweeps: RING-TRANSFER and RING-LOOKUP, sizes 10..30,
ring_sparse_cin (3 layers) vs the gin_ring baseline (size/2 layers) — the
CWN long-range advantage experiment (/root/reference/exp/run_ring_exp.py
protocol; the ring 2-cell gives CIN a 2-hop shortcut across the ring, so
it solves every size with 3 layers while GIN needs depth ~size/2).

Usage: python exp_runs/ring_sweep.py [RING-TRANSFER|RING-LOOKUP ...]
Resumable: each (model, size) mean is flushed as soon as its seeds finish.
"""
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated
from cwn_tpu.exp.parser import get_parser
from cwn_tpu.exp.wrappers import RING_SIZES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = [
    "--start_seed", "0", "--stop_seed", "1",
    "--epochs", "30", "--batch_size", "32", "--lr", "0.001",
    "--emb_dim", "16", "--task_type", "classification",
    "--eval_metric", "accuracy", "--lr_scheduler", "None",
    "--drop_rate", "0.0", "--readout", "sum", "--final_readout", "sum",
    "--train_eval_period", "10",
    # The CIN up message MUST carry coboundary features: edge->vertex
    # information only flows through up_attr (the shared edge) in
    # SparseCIN, so without coboundaries the transfer task is
    # information-theoretically unsolvable at 3 layers (measured:
    # chance accuracy at every size).
    "--use_coboundaries", "True",
    # CPU backend: these models are tiny (emb 16) and per-step tunnel
    # dispatch would dominate on the remote chip; running on CPU also
    # lets the sweep proceed alongside the TPU protocol queue.
    "--device", "-1",
]


def sweep(dataset: str, models):
    out = os.path.join(HERE, "exp_results",
                       f"{dataset.lower().replace('-', '_')}_sweep.json")
    results = {}
    failed = []
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("models", {})

    def flush():
        note = (f"{dataset} sizes 10-30, 2 seeds, last-epoch test "
                "acc (run_ring_exp protocol; CIN 3 layers, GIN "
                "size/2 layers)")
        if dataset == "RING-LOOKUP":
            note += (".  NOTE: the reference marks this generator 'no "
                     "longer being used for now' "
                     "(/root/reference/data/datasets/ring_utils.py:10) "
                     "and publishes no number; recorded for completeness "
                     "— the paper's ring experiment is RING-TRANSFER.")
        with open(out, "w") as f:
            json.dump({"note": note, "models": results}, f, indent=1)

    parser = get_parser()
    for model in models:
        per_model = results.setdefault(model, {})
        norm = "id" if model == "ring_sparse_cin" else "bn"
        base = BASE + ["--dataset", dataset, "--model", model,
                       "--graph_norm", norm,
                       "--exp_name", f"{dataset.lower()}-sweep"]
        args0 = parser.parse_args(copy.copy(base))
        for size in RING_SIZES:
            if str(size) in per_model:
                print(f"{dataset}/{model}/{size}: cached")
                continue
            num_layers = 3 if model == "ring_sparse_cin" else size // 2
            accs = []
            for seed in range(args0.start_seed, args0.stop_seed + 1):
                argv = (copy.copy(base)
                        + ["--max_ring_size", str(size),
                           "--num_layers", str(num_layers),
                           "--seed", str(seed)])
                try:
                    curves = run_isolated(
                        argv, tag=f"{dataset}/{model}/{size}/s{seed}")
                except RunFailed as e:
                    print(f"[{dataset}] {model} size {size} seed {seed} "
                          f"FAILED rc={e.rc} — continuing", flush=True)
                    failed.append(f"{model}/{size}/s{seed}")
                    continue
                accs.append(curves["last_val"])
            if not accs:
                continue
            per_model[str(size)] = {"mean": float(np.mean(accs)),
                                    "std": float(np.std(accs))}
            print(f"[{dataset}] {model} size {size}: "
                  f"{per_model[str(size)]['mean']:.4f} "
                  f"+/- {per_model[str(size)]['std']:.4f}", flush=True)
            flush()
    flush()
    print(f"[{dataset}] COMPLETE ({len(failed)} failed: {failed})")
    return failed


if __name__ == "__main__":
    datasets = sys.argv[1:] or ["RING-TRANSFER", "RING-LOOKUP"]
    any_failed = []
    for ds in datasets:
        any_failed += sweep(ds, ["ring_sparse_cin", "ring_gin"]) or []
    sys.exit(1 if any_failed else 0)
