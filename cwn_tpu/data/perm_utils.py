"""Graph permutation utilities for invariance testing.

Parity: /root/reference/data/perm_utils.py:7-59 (random permutation
matrices, permuting features/labels/adjacency as P A P^T).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cwn_tpu.data.graph import Graph


def random_permutation_matrix(n: int, rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    perm = rng.permutation(n)
    p = np.zeros((n, n))
    p[np.arange(n), perm] = 1.0
    return p


def permute_graph(graph: Graph, perm: Optional[np.ndarray] = None,
                  rng=None) -> Tuple[Graph, np.ndarray]:
    """Relabel vertices by `perm` (new_id = perm[old_id]); features, labels
    and edges follow."""
    rng = rng or np.random.default_rng()
    n = graph.num_nodes
    if perm is None:
        perm = rng.permutation(n)
    x_p = np.empty_like(graph.x)
    x_p[perm] = graph.x
    y = graph.y
    if y is not None and np.asarray(y).reshape(-1).shape[0] == n:
        y_p = np.empty_like(y)
        y_p[perm] = y
        y = y_p
    ea = graph.edge_attr
    return Graph(x=x_p, edge_index=perm[graph.edge_index], y=y,
                 edge_attr=ea, num_nodes=n), perm
