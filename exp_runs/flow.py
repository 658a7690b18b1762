"""FLOW trajectory classification, canonical protocol (mpsn-flow.sh):
edge_orient, 4 layers, emb 64, batch 64, 100 epochs, test_orient random,
seeds 0..4, nonlinearity tanh|id."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated


def run(nonlinearity: str, seeds, epochs=100):
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results",
        f"flow_{nonlinearity}.json")
    results = {}
    failed = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("seeds", {})
    for seed in seeds:
        if str(seed) in results:
            print(f"seed {seed}: cached")
            continue
        argv = [
            "--dataset", "FLOW", "--model", "edge_orient",
            "--num_layers", "4", "--emb_dim", "64", "--lr", "0.001",
            "--batch_size", "64", "--flow_points", "1000",
            "--preproc_jobs", "2", "--test_orient", "random",
            "--nonlinearity", nonlinearity, "--drop_rate", "0.0",
            "--lr_scheduler_decay_steps", "20", "--epochs", str(epochs),
            "--train_eval_period", "20", "--exp_name", "flow_mpsn",
            "--seed", str(seed)]
        try:
            curves = run_isolated(argv, tag=f"flow-{nonlinearity}/s{seed}")
        except RunFailed as e:
            print(f"[flow-{nonlinearity}] seed {seed} FAILED rc={e.rc} "
                  "— continuing", flush=True)
            failed.append(seed)
            continue
        results[str(seed)] = {
            "best_epoch": curves["best_epoch"],
            "best_val": curves["best_val"],
            "test_at_best": curves["test_at_best"],
            "last_val": curves["last_val"]}
        accs = [r["test_at_best"] for r in results.values()]
        with open(out_path, "w") as f:
            json.dump({
                "note": f"FLOW edge_orient {nonlinearity}, {epochs} epochs, "
                        "test_orient=random (mpsn-flow.sh protocol)",
                "mean_test_at_best": float(np.mean(accs)),
                "std_test_at_best": float(np.std(accs)),
                "seeds": results}, f, indent=1)
        print(f"[flow-{nonlinearity}] seed {seed}: {results[str(seed)]}")
    print(f"[flow-{nonlinearity}] COMPLETE ({len(results)} runs, "
          f"{len(failed)} failed: {failed})")
    return failed


if __name__ == "__main__":
    nl = sys.argv[1]
    seeds = [int(s) for s in sys.argv[2:]] or list(range(5))
    sys.exit(1 if run(nl, seeds) else 0)
