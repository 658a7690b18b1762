"""Synthetic molecule-like graph generator.

Produces ZINC-shaped data (scalar integer vertex/edge features, ring-rich
graphs, scalar regression targets) without network access — used for smoke
tests, benchmarks, and as an offline stand-in wherever the real download is
gated by the environment.
"""
from __future__ import annotations

from typing import List

import numpy as np

from cwn_tpu.data.graph import Graph


def random_molecule(rng: np.random.Generator, num_nodes: int,
                    atom_types: int = 28, bond_types: int = 4) -> Graph:
    """A connected graph: random spanning tree + extra ring-closing edges."""
    n = num_nodes
    edges = set()
    order = rng.permutation(n)
    for i in range(1, n):
        u = int(order[i])
        v = int(order[rng.integers(0, i)])
        edges.add((min(u, v), max(u, v)))
    # Ring-closing edges (~25% of n).
    for _ in range(max(1, n // 4)):
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((min(int(u), int(v)), max(int(u), int(v))))
    edges = sorted(edges)
    src = [u for u, v in edges] + [v for u, v in edges]
    dst = [v for u, v in edges] + [u for u, v in edges]
    edge_index = np.array([src, dst])

    x = rng.integers(0, atom_types, (n, 1)).astype(np.int64)
    # Undirected edge features: same value for both directions.
    ea = rng.integers(0, bond_types, (len(edges), 1)).astype(np.int64)
    edge_attr = np.concatenate([ea, ea], axis=0)

    # Regression target correlated with structure (so models can learn it):
    # weighted count of atoms and rings.
    cyclomatic = len(edges) - n + 1
    y = np.array([0.1 * x.sum() + 0.5 * cyclomatic
                  + 0.05 * float(edge_attr.sum())], dtype=np.float64)
    return Graph(x=x, edge_index=edge_index, y=y, edge_attr=edge_attr)


def synthetic_molecules(num_graphs: int, seed: int = 0,
                        min_nodes: int = 10, max_nodes: int = 30,
                        atom_types: int = 28, bond_types: int = 4) -> List[Graph]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        out.append(random_molecule(rng, n, atom_types, bond_types))
    return out
