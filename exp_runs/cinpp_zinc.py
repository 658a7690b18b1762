"""CIN++ evidence run: embed_cin++ (lower-adjacency + boundary channels,
scripts/cin++-zinc-small.sh config) vs embed_sparse_cin (cwn-zinc-small)
on ZINC-SYNTH, same protocol, same seeds.  Records test MAE at best val
so the down-adjacency channel has recorded evidence beyond smoke tests.

Usage: python exp_runs/cinpp_zinc.py [epochs] [seed ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exp_results", "cinpp_zinc_synth.json")


def run_one(model: str, seed: int, epochs: int, include_down: bool):
    argv = [
        "--dataset", "ZINC-SYNTH", "--model", model,
        "--epochs", str(epochs), "--batch_size", "128",
        "--drop_rate", "0.0", "--drop_position", "lin2",
        "--emb_dim", "48", "--max_dim", "2", "--final_readout", "sum",
        "--init_method", "sum", "--lr", "0.001", "--graph_norm", "bn",
        "--nonlinearity", "relu", "--num_layers", "2", "--readout", "sum",
        "--max_ring_size", "18", "--task_type", "regression",
        "--eval_metric", "mae", "--minimize", "--use_coboundaries", "True",
        "--use_edge_features", "--early_stop",
        "--lr_scheduler", "ReduceLROnPlateau", "--lr_scheduler_patience", "20",
        "--train_eval_period", "20", "--preproc_jobs", "4",
        # XLA path: the shuffled heterogeneous batches would re-ship fresh
        # Pallas tile plans over the chip tunnel every step, which costs
        # more than the kernels save at this batch scale.
        "--use_pallas", "false",
        "--exp_name", f"cinpp-zinc-synth-{model}", "--seed", str(seed)]
    if include_down:
        argv.append("--include_down_adj")
    curves = run_isolated(argv, tag=f"{model}/s{seed}")
    return {"best_epoch": curves["best_epoch"],
            "best_val": curves["best_val"],
            "test_at_best": curves["test_at_best"]}


def run(epochs: int, seeds):
    results = {}
    failed = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("runs", {})
    # Seed-major order: a round-time cut leaves BALANCED per-model seed
    # counts instead of 10 of one model and none of the other.
    for seed in seeds:
        for model, down in [("embed_cin++", True),
                            ("embed_sparse_cin", False)]:
            k = f"{model}/s{seed}"
            if k in results:
                print(f"{k}: cached")
                continue
            try:
                results[k] = run_one(model, seed, epochs, down)
            except RunFailed as e:
                print(f"[cinpp-zinc] {k} FAILED rc={e.rc} — continuing",
                      flush=True)
                failed.append(k)
                continue
            print(f"[cinpp-zinc] {k}: {results[k]}", flush=True)
            _dump(results, epochs)
    _dump(results, epochs)
    print(f"[cinpp-zinc] COMPLETE ({len(results)} runs, "
          f"{len(failed)} failed: {failed})")
    return failed


def _dump(results, epochs):
    by_model = {}
    for k, v in results.items():
        by_model.setdefault(k.split("/")[0], []).append(v["test_at_best"])
    with open(OUT, "w") as f:
        json.dump({
            "note": "ZINC-SYNTH, cin++-zinc-small vs cwn-zinc-small configs "
                    f"(emb 48, 2 layers, ring 18, bs 128, {epochs} epochs, "
                    "ReduceLROnPlateau + early stop), test MAE at best val",
            "mean_test_mae": {m: float(np.mean(v))
                              for m, v in by_model.items()},
            "runs": results}, f, indent=1)


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1]
    sys.exit(1 if run(epochs, seeds) else 0)
