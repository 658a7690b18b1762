"""SR clique-lift (MPSN) table: families x 5 seeds (mpsn-sr.sh protocol).

Per-family clique dims from /root/reference/exp/run_sr_exp.py:28-38; model
config from /root/reference/exp/scripts/mpsn-sr.sh (5 layers, emb 16, elu,
id norm, untrained fp64, isomorphism eval).  fp64 path -> CPU device.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys

from cwn_tpu.exp.wrappers import run_sr_exp, SR_FAMILIES

ARGS = [
    "--start_seed", "0", "--stop_seed", "4", "--exp_name", "mpsn-sr",
    "--model", "sparse_cin", "--use_coboundaries", "True",
    "--drop_rate", "0.0", "--graph_norm", "id", "--nonlinearity", "elu",
    "--readout", "sum", "--final_readout", "sum", "--lr_scheduler", "None",
    "--num_layers", "5", "--emb_dim", "16", "--batch_size", "8",
    "--task_type", "isomorphism", "--eval_metric", "isomorphism",
    "--init_method", "sum", "--preproc_jobs", "2",
    "--untrained", "--device", "-1",
]

if __name__ == "__main__":
    families = sys.argv[1:] or SR_FAMILIES
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results", "sr_clique.json")
    table = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            table = json.load(f).get("families", {})
    for fam in families:
        if fam in table:
            print(f"{fam}: cached, skipping")
            continue
        res = run_sr_exp(ARGS, families=[fam])
        table.update(res)
        with open(out_path, "w") as f:
            json.dump({"note": "clique lift (MPSN), per-family max_dim "
                               "(run_sr_exp.py:28-38), untrained fp64 "
                               "sparse_cin, 5 seeds (mpsn-sr.sh)",
                       "families": table}, f, indent=1)
        print(f"[sr_clique] {fam} done -> {table[fam]}")
    print("[sr_clique] COMPLETE")
