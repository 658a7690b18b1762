"""SR ring-5 full table: all 9 families x 5 seeds (cwn-sr.sh sweeps
max_ring_size k in {4,5,6}; this completes the k=5 column next to
sr_ring4.json / sr_ring6.json).  CPU (fp64), untrained isomorphism test."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys

from cwn_tpu.exp.wrappers import run_sr_exp, SR_FAMILIES

ARGS = [
    "--start_seed", "0", "--stop_seed", "4", "--exp_name", "cwn-sr-ring5",
    "--model", "sparse_cin", "--use_coboundaries", "True",
    "--drop_rate", "0.0", "--graph_norm", "id", "--nonlinearity", "elu",
    "--readout", "sum", "--final_readout", "sum", "--lr_scheduler", "None",
    "--num_layers", "3", "--emb_dim", "16", "--batch_size", "8",
    "--task_type", "isomorphism", "--eval_metric", "isomorphism",
    "--max_ring_size", "5", "--init_method", "sum", "--preproc_jobs", "2",
    "--untrained", "--device", "-1",
]

if __name__ == "__main__":
    families = sys.argv[1:] or SR_FAMILIES
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results", "sr_ring5.json")
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
            json.dump({"note": "ring k=5, untrained fp64 sparse_cin, "
                               "5 seeds, all 9 families (cwn-sr.sh)",
                       "families": table}, f, indent=1)
        print(f"[sr_ring5] {fam} done -> {table[fam]}", flush=True)
    print("[sr_ring5] COMPLETE")
