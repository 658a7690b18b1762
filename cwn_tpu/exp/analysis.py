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
