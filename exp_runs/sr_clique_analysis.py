"""Why the clique-lift SR sweep has residual failures (sr_clique.json):
for each family, group the graphs by the per-dim (cells, up, down,
boundary) count signature of their protocol clique complexes and compare
the colliding-pair fraction with the measured failure rate.  The claim
under test (BASELINE.md): every failing pair is a colliding pair, i.e.
measured failure rate <= colliding_pair_fraction, and the families with
zero collisions are exactly the ones the sweep solves.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os

from cwn_tpu.exp.analysis import sr_clique_collisions
from cwn_tpu.exp.wrappers import SR_CLIQUE_DIMS, SR_FAMILIES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "exp_results", "sr_clique_analysis.json")
MEASURED = os.path.join(HERE, "exp_results", "sr_clique.json")

if __name__ == "__main__":
    measured = {}
    if os.path.exists(MEASURED):
        with open(MEASURED) as f:
            measured = json.load(f).get("families", {})
    table = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            table = json.load(f).get("families", {})
    for fam in SR_FAMILIES:
        if fam in table:
            print(f"{fam}: cached")
            continue
        res = sr_clique_collisions(fam, SR_CLIQUE_DIMS[fam])
        m = measured.get(fam)
        if m is not None:
            res["measured_failure_mean"] = m["mean"]
            res["claim_backed"] = (
                m["mean"] <= res["colliding_pair_fraction"] + 1e-12)
        table[fam] = res
        with open(OUT, "w") as f:
            json.dump({
                "note": "clique-lift structural collision analysis vs "
                        "sr_clique.json failures: failure rate must be "
                        "bounded by the colliding-pair fraction "
                        "(identical per-dim cell/adjacency counts)",
                "families": table}, f, indent=1)
        print(f"[sr-clique-analysis] {fam}: "
              f"collide={res['colliding_pair_fraction']:.4f} "
              f"measured={res.get('measured_failure_mean')}", flush=True)
    print("[sr-clique-analysis] COMPLETE")
