"""Dataset/model analysis tools.

Parity targets:
  exp/count_rings.py                 -> count_rings()
  exp/evaluate_sr_cwn_emb_mag.py     -> sr_embedding_magnitude()
  exp/prepare_sr_tests.py            -> prepare_permuted_sr()
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

import numpy as np

from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import find_induced_cycles


def count_rings(graphs: List[Graph], max_k: int = 18) -> Dict[int, int]:
    """Histogram of induced-ring sizes over a graph dataset
    (parity: /root/reference/exp/count_rings.py)."""
    hist: Counter = Counter()
    for g in graphs:
        for ring in find_induced_cycles(g.edge_index, g.num_nodes, max_k=max_k):
            hist[len(ring)] += 1
    return dict(sorted(hist.items()))


def prepare_permuted_sr(family: str, seed: int = 0, root: Optional[str] = None):
    """The SR self-isomorphism harness inputs: each family graph plus a
    randomly permuted copy (parity: exp/prepare_sr_tests.py).  An exact
    model must embed each pair identically."""
    from cwn_tpu.data.datasets.sr import load_sr_graphs
    rng = np.random.default_rng(seed)
    graphs = load_sr_graphs(family, root)
    out = []
    for g in graphs:
        out.append(g)
        perm = rng.permutation(g.num_nodes)
        x_p = np.empty_like(g.x)
        x_p[perm] = g.x
        out.append(Graph(x=x_p, edge_index=perm[g.edge_index]))
    return out


def sr_embedding_magnitude(y_pred: np.ndarray) -> float:
    """Max |embedding| — the fp64 magnitude guard justifying the isomorphism
    eps (parity: exp/evaluate_sr_cwn_emb_mag.py + exp/test_sr.py:90-113).
    Must stay well below ~5e8 for eps=0.01 to be meaningful in fp64."""
    return float(np.abs(np.asarray(y_pred)).max())


def clique_structure_signature(complex) -> tuple:
    """Per-dim structural invariant of a lifted complex: for each dimension
    the (cell count, upper-adjacency count, lower-adjacency count,
    boundary-link count) tuple.  Two complexes with different signatures are
    always separated by a sum-readout WL-style model; identical signatures
    are the *necessary* condition for an isomorphism-test failure of a
    count-level model."""
    sig = []
    for dim in sorted(complex.cochains):
        c = complex.cochains[dim]
        sig.append((dim, int(c.num_cells), c.num_upper_edges,
                    c.num_lower_edges, c.num_boundary_links))
    return tuple(sig)


def sr_clique_collisions(family: str, expansion_dim: int,
                         root: Optional[str] = None) -> Dict:
    """Structural-collision analysis for one SR family under its protocol
    clique lift (the mpsn-sr.sh setting; per-family dims in
    cwn_tpu.exp.wrappers.SR_CLIQUE_DIMS, mirroring
    /root/reference/exp/run_sr_exp.py:28-38).

    Groups the family's graphs by `clique_structure_signature` of their
    clique complexes and reports the fraction of graph pairs whose
    signatures coincide.  Backs the BASELINE.md claim that the clique
    sweep's residual failures (sr_clique.json) occur exactly on pairs the
    clique complex cannot separate at the cell/adjacency-count level: the
    measured failure rate is bounded above by `colliding_pair_fraction`.
    """
    from cwn_tpu.data.datasets.sr import load_sr_graphs
    from cwn_tpu.lift.simplicial import convert_graph_dataset_with_cliques

    graphs = load_sr_graphs(family, root)
    complexes, _, _ = convert_graph_dataset_with_cliques(
        graphs, expansion_dim=expansion_dim, include_down_adj=True)
    sigs = [clique_structure_signature(c) for c in complexes]
    groups: Counter = Counter(sigs)
    n = len(sigs)
    total_pairs = n * (n - 1) // 2
    colliding_pairs = sum(k * (k - 1) // 2 for k in groups.values())
    return {
        "family": family,
        "expansion_dim": expansion_dim,
        "graphs": n,
        "distinct_signatures": len(groups),
        "largest_group": max(groups.values()),
        "group_sizes": sorted(groups.values(), reverse=True),
        "colliding_pairs": colliding_pairs,
        "total_pairs": total_pairs,
        "colliding_pair_fraction": colliding_pairs / max(total_pairs, 1),
    }


SR_FAMILY_NAMES = {                 # display names, plot_sr_cwn_results.py:17-26
    "sr16622": "SR(16,6,2,2)", "sr251256": "SR(25,12,5,6)",
    "sr261034": "SR(26,10,3,4)", "sr281264": "SR(28,12,6,4)",
    "sr291467": "SR(29,14,6,7)", "sr351668": "SR(35,16,6,8)",
    "sr351899": "SR(35,18,9,9)", "sr361446": "SR(36,14,4,6)",
    "sr401224": "SR(40,12,2,4)"}


def plot_sr_results(result_files: Dict[str, str], out_png: str,
                    log_floor: float = 1e-6):
    """Grouped log-scale bar chart of SR failure rates per family, one group
    per experiment — the TPU port of /root/reference/exp/plot_sr_cwn_results.py
    (which reads per-family npy files; ours reads the exp_runs/sr json dumps).

    result_files: {legend label -> path to sr_ring*.json}; zero failure
    rates are floored at `log_floor` so they render on the log axis, as the
    reference does.  Returns the table {label -> {family -> (mean, std)}}.
    """
    import json

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    table = {}
    for label, path in result_files.items():
        with open(path) as f:
            data = json.load(f)
        fams = data.get("families", {k: v for k, v in data.items()
                                     if k in SR_FAMILY_NAMES})
        table[label] = {
            fam: (float(v["mean"]),
                  float(v.get("std", (v["max"] - v["min"]) / 2)))
            for fam, v in fams.items()}

    fams = [f for f in SR_FAMILY_NAMES if any(f in t for t in table.values())]
    xs = np.arange(len(fams))
    width = 0.8 / max(len(table), 1)
    fig, ax = plt.subplots(figsize=(10, 4))
    for i, (label, res) in enumerate(table.items()):
        # Families absent from this experiment get a visible zero-height
        # gap and a printed note (NaN would silently drop the bar: Python
        # max() returns its FIRST arg when NaN comparisons are false).
        missing = [f for f in fams if f not in res]
        if missing:
            print(f"plot_sr_results: '{label}' missing families: "
                  + ", ".join(missing))
        means = np.array([max(res[f][0], log_floor) if f in res else 0.0
                          for f in fams])
        errs = np.array([res.get(f, (0, 0))[1] for f in fams])
        ax.bar(xs + i * width, means, width, yerr=errs, label=label)
    ax.set_yscale("log")
    ax.set_ylim(log_floor / 2, 1.5)
    ax.set_xticks(xs + 0.4 - width / 2)
    ax.set_xticklabels([SR_FAMILY_NAMES[f] for f in fams],
                       rotation=30, ha="right")
    ax.set_ylabel("failure rate")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return table
