"""RING-TRANSFER sweep: sizes 10..30, ring_sparse_cin (3 layers) vs the
gin_ring baseline (size/2 layers) — the CWN long-range advantage
experiment (/root/reference/exp/run_ring_exp.py protocol; the ring 2-cell
gives CIN a 2-hop shortcut across the ring, so it solves every size with
3 layers while GIN needs depth ~size/2).

Usage: python exp_runs/ring_sweep.py [model ...] (default both models)
"""
import json
import os
import sys

from cwn_tpu.exp.wrappers import run_ring_exp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exp_results", "ring_transfer_sweep.json")

BASE = [
    "--dataset", "RING-TRANSFER", "--start_seed", "0", "--stop_seed", "1",
    "--epochs", "30", "--batch_size", "32", "--lr", "0.001",
    "--emb_dim", "16", "--task_type", "classification",
    "--eval_metric", "accuracy", "--lr_scheduler", "None",
    "--drop_rate", "0.0", "--readout", "sum", "--final_readout", "sum",
    "--train_eval_period", "10", "--exp_name", "ring-transfer-sweep",
]

if __name__ == "__main__":
    models = sys.argv[1:] or ["ring_sparse_cin", "gin_ring"]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("models", {})
    for model in models:
        if model in results:
            print(f"{model}: cached")
            continue
        norm = "id" if model == "ring_sparse_cin" else "bn"
        res = run_ring_exp(BASE + ["--model", model, "--graph_norm", norm])
        results[model] = {str(k): v for k, v in res.items()}
        with open(OUT, "w") as f:
            json.dump({
                "note": "RING-TRANSFER sizes 10-30, 2 seeds, last-epoch "
                        "test acc (run_ring_exp protocol; CIN 3 layers, "
                        "GIN size/2 layers)",
                "models": results}, f, indent=1)
        print(f"[ring-sweep] {model} done")
    print("[ring-sweep] COMPLETE")
