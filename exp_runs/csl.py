"""CSL protocol run: folds x seeds at the cwn-csl.sh config.

Reference protocol is 5 folds x 20 seeds (cwn-csl.sh); round-time budget
runs 5 folds x >=3 seeds — pass folds/seeds on the CLI.  Early stop via
ReduceLROnPlateau to min-lr, as the script does.
Usage: python exp_runs/csl.py [seed ...]   (all 5 folds per seed)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exp_results", "csl.json")


def run(seeds, folds=(0, 1, 2, 3, 4), epochs=300):
    results = {}
    failed = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
            results = prev.get("runs", {})
    for seed in seeds:
        for fold in folds:
            k = f"s{seed}/f{fold}"
            if k in results:
                print(f"{k}: cached")
                continue
            argv = [
                "--dataset", "CSL", "--model", "embed_sparse_cin",
                "--train_eval_period", "25", "--epochs", str(epochs),
                "--batch_size", "12", "--drop_rate", "0.0",
                "--graph_norm", "ln", "--drop_position", "lin2",
                "--emb_dim", "160", "--max_dim", "2",
                "--final_readout", "sum", "--init_method", "sum",
                "--lr", "5e-4", "--nonlinearity", "relu",
                "--num_layers", "3", "--readout", "mean",
                "--max_ring_size", "8",
                "--lr_scheduler", "ReduceLROnPlateau",
                "--lr_scheduler_min", "1e-6",
                "--lr_scheduler_patience", "20", "--early_stop",
                "--use_edge_features", "--use_coboundaries", "True",
                "--task_type", "classification",
                "--eval_metric", "accuracy", "--preproc_jobs", "4",
                "--use_pallas", "false",   # avoid per-batch plan shipping
                "--fold", str(fold), "--exp_name", "cwn-csl",
                "--seed", str(seed)]
            try:
                curves = run_isolated(argv, tag=k)
            except RunFailed as e:
                print(f"[csl] {k} FAILED rc={e.rc} — continuing", flush=True)
                failed.append(k)
                continue
            results[k] = {"best_epoch": curves["best_epoch"],
                          "best_val": curves["best_val"],
                          "test_at_best": curves["test_at_best"]}
            accs = [r["test_at_best"] for r in results.values()]
            with open(OUT, "w") as f:
                json.dump({
                    "note": "CSL embed_sparse_cin, cwn-csl.sh config, "
                            "ring k=8, 5-fold splits, test acc at best val "
                            "(reference headline: 100%)",
                    "mean_test_at_best": float(np.mean(accs)),
                    "std_test_at_best": float(np.std(accs)),
                    "n_runs": len(results),
                    "runs": results}, f, indent=1)
            print(f"[csl] {k}: {results[k]}", flush=True)
    print(f"[csl] COMPLETE ({len(results)} runs, "
          f"{len(failed)} failed: {failed})")
    return failed


if __name__ == "__main__":
    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    sys.exit(1 if run(seeds) else 0)
