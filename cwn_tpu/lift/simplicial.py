"""Clique-complex lift (simplicial complexes, MPSN-style).

Replaces the reference's gudhi SimplexTree + expansion pipeline
(/root/reference/data/utils.py:224-295) with a direct clique enumeration:
the k-simplices of the clique complex are exactly the (k+1)-cliques of the
graph.  Simplices are id'd in lexicographic order of their sorted vertex
tuples per dimension — the same order a simplex-tree depth-first traversal
produces — so cell ids line up with the reference lift.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from cwn_tpu.complex import Complex
from cwn_tpu.lift.core import (
    build_complex_from_cells,
    construct_cell_features,
    edges_from_edge_index,
    split_labels,
)


def enumerate_cliques(num_vertices: int, edges: List[Tuple[int, int]],
                      max_size: int) -> List[List[Tuple[int, ...]]]:
    """All cliques of size 1..max_size, per size, in lexicographic order.

    Uses ascending-extension: a clique (v_0 < ... < v_k) is extended only by
    vertices > v_k adjacent to all members, so every clique is produced
    exactly once and the per-size lists come out lexicographically sorted.
    """
    adj = [set() for _ in range(num_vertices)]
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    tables: List[List[Tuple[int, ...]]] = [[(v,) for v in range(num_vertices)]]
    if max_size >= 2 and edges:
        tables.append([tuple(e) for e in edges])
    for _size in range(3, max_size + 1):
        prev = tables[-1]
        cur: List[Tuple[int, ...]] = []
        for c in prev:
            cand = adj[c[0]].intersection(*(adj[u] for u in c[1:]))
            for v in sorted(cand):
                if v > c[-1]:
                    cur.append(c + (v,))
        if not cur:
            break
        tables.append(cur)
    return tables


def simplex_boundary_tables(cell_tables: List[List[Tuple[int, ...]]]
                            ) -> List[List[List[int]]]:
    """boundaries[k][cell_id] -> ids of the (k-1)-faces, in face order.

    Faces of a simplex are its size-(k) subsets; we enumerate them in the
    order itertools.combinations yields (drop-last-first is NOT used — the
    reference uses combinations(simplex, len-1) which drops vertices from the
    right, and we match that order).
    """
    id_maps = [{cell: i for i, cell in enumerate(table)} for table in cell_tables]
    boundaries: List[List[List[int]]] = [[] for _ in range(len(cell_tables))]
    for k in range(1, len(cell_tables)):
        for cell in cell_tables[k]:
            import itertools
            faces = [tuple(f) for f in itertools.combinations(cell, len(cell) - 1)]
            boundaries[k].append([id_maps[k - 1][f] for f in faces])
    return boundaries


def clique_complex(x, edge_index, size: int, expansion_dim: int = 2,
                   y=None, include_down_adj: bool = True,
                   init_method: str = "sum", v_mask=None) -> Complex:
    """Lift a graph to its clique complex up to `expansion_dim`.

    Behavioural parity with
    /root/reference/data/utils.py:224-272 (compute_clique_complex_with_gudhi).
    """
    assert x is not None
    x = np.asarray(x)
    edge_index = np.asarray(edge_index)
    edges = edges_from_edge_index(edge_index)

    cell_tables = enumerate_cliques(size, edges, expansion_dim + 1)
    boundaries_tables = simplex_boundary_tables(cell_tables)

    xs = construct_cell_features(x, cell_tables, init_method)
    v_y, complex_y = split_labels(y, size)

    return build_complex_from_cells(
        cell_tables, boundaries_tables, xs, y=complex_y, v_y=v_y,
        include_down_adj=include_down_adj, v_mask=v_mask)


def convert_graph_dataset_with_cliques(graphs, expansion_dim: int = 2,
                                       include_down_adj: bool = True,
                                       init_method: str = "sum"):
    """Lift a list of graphs; returns (complexes, max_dimension, num_features).

    `graphs` is an iterable of records with .x, .edge_index, .num_nodes, .y
    (see cwn_tpu.data.graph.Graph).  Parity with
    /root/reference/data/utils.py:275-295.
    """
    dimension = -1
    complexes = []
    num_features = [None] * (expansion_dim + 1)
    for g in graphs:
        c = clique_complex(g.x, g.edge_index, g.num_nodes,
                           expansion_dim=expansion_dim, y=g.y,
                           include_down_adj=include_down_adj,
                           init_method=init_method)
        dimension = max(dimension, c.dimension)
        for dim in range(c.dimension + 1):
            nf = c.cochains[dim].num_features
            if num_features[dim] is None:
                num_features[dim] = nf
            else:
                assert num_features[dim] == nf
        complexes.append(c)
    return complexes, dimension, num_features[:dimension + 1]
