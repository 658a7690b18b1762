"""MOLHIV-SYNTH end-to-end run at the cwn-molhiv.sh config (the real
ogbg-molhiv download is gated offline; MOLHIV-SYNTH is the synthetic
stand-in wired through the same OGB loader/encoders/evaluator path).

Records ROC-AUC at best val per seed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys

import numpy as np

from cwn_tpu.exp.parser import get_parser, validate_args
from cwn_tpu.exp.run_exp import main

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exp_results", "molhiv_synth.json")


def run(seeds, epochs=40):
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("seeds", {})
    p = get_parser()
    for seed in seeds:
        if str(seed) in results:
            print(f"seed {seed}: cached")
            continue
        args = p.parse_args([
            "--dataset", "MOLHIV-SYNTH", "--model", "ogb_embed_sparse_cin",
            "--use_coboundaries", "True", "--indrop_rate", "0.0",
            "--drop_rate", "0.5", "--graph_norm", "bn",
            "--drop_position", "lin2", "--nonlinearity", "relu",
            "--readout", "mean", "--final_readout", "sum",
            "--lr", "0.0001", "--lr_scheduler", "None",
            "--num_layers", "2", "--emb_dim", "64", "--batch_size", "128",
            "--epochs", str(epochs), "--task_type", "bin_classification",
            "--eval_metric", "ogbg-molhiv", "--max_dim", "2",
            "--max_ring_size", "6", "--init_method", "sum",
            "--train_eval_period", "10", "--use_edge_features",
            "--preproc_jobs", "4",
            "--use_pallas", "false",   # avoid per-batch plan shipping
            "--exp_name", "molhiv-synth", "--seed", str(seed)])
        validate_args(args)
        curves = main(args)
        results[str(seed)] = {
            "best_epoch": curves["best_epoch"],
            "best_val": curves["best_val"],
            "test_at_best": curves["test_at_best"]}
        aucs = [r["test_at_best"] for r in results.values()]
        with open(OUT, "w") as f:
            json.dump({
                "note": "MOLHIV-SYNTH (synthetic stand-in; real download "
                        f"gated), cwn-molhiv.sh config, {epochs} epochs, "
                        "ROC-AUC at best val",
                "mean_test_at_best": float(np.mean(aucs)),
                "std_test_at_best": float(np.std(aucs)),
                "seeds": results}, f, indent=1)
        print(f"[molhiv-synth] seed {seed}: {results[str(seed)]}", flush=True)
    print("[molhiv-synth] COMPLETE")


if __name__ == "__main__":
    seeds = [int(s) for s in sys.argv[1:]] or [0]
    run(seeds)
