"""Ring 2-complex lift (CW networks).

Replaces the reference's graph-tool subgraph-isomorphism ring search
(/root/reference/data/utils.py:300-498) with a direct chordless-cycle
enumeration: the induced cycles of length 3..max_k become the 2-cells of
the complex; the 1-skeleton stays the graph itself.

Canonicalisation: every ring is emitted as a vertex tuple starting at its
minimum vertex and traversing towards the smaller of that vertex's two ring
neighbours, so each geometric ring appears exactly once; rings are id'd in
(length, sorted-vertex-tuple) order.  The boundary *set* of a ring (its
edges, as sorted pairs) is traversal-invariant, which is what downstream
message passing consumes.
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


def find_induced_cycles(edge_index, num_vertices: int, max_k: int = 7,
                        use_native: bool = True) -> List[Tuple[int, ...]]:
    """All chordless (induced) cycles with 3..max_k vertices.

    DFS over induced paths: a path [r, v1, ..., vt] (r minimal, all others
    > r) is grown only with vertices adjacent to the tip and to no other
    path vertex; a cycle closes when the new vertex is also adjacent to r.
    Direction duplicates are removed by requiring v1 < closing vertex.

    Uses the native C++ kernel (cwn_tpu/native/lift.cpp) when available;
    this pure-Python body doubles as the fallback and the cross-check
    oracle.
    """
    if use_native:
        from cwn_tpu.native import native_find_induced_cycles
        rings = native_find_induced_cycles(edge_index, num_vertices, max_k)
        if rings is not None:
            return rings
    edges = edges_from_edge_index(np.asarray(edge_index))
    adj = [set() for _ in range(num_vertices)]
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    rings: List[Tuple[int, ...]] = []
    if max_k < 3:
        return rings

    for r in range(num_vertices):
        nbrs_r = sorted(n for n in adj[r] if n > r)
        if len(nbrs_r) < 2:
            continue
        # stack entries: (path, set(path), blocked) where blocked is the set of
        # vertices adjacent to a non-tip path vertex (would create a chord).
        for v1 in nbrs_r:
            stack = [((r, v1), {r, v1})]
            while stack:
                path, in_path = stack.pop()
                tip = path[-1]
                t = len(path) - 1  # number of non-root vertices
                for w in adj[tip]:
                    if w <= r or w in in_path:
                        continue
                    # Chordless: w must not touch any interior path vertex.
                    # (path[0] is r: adjacency to r means closure, checked below.)
                    if any(w in adj[p] for p in path[1:-1]):
                        continue
                    closes = w in adj[r]
                    if closes:
                        if t >= 1 and path[1] < w and len(path) + 1 >= 3:
                            rings.append(path + (w,))
                        # w adjacent to r: extending the path through w can
                        # never yield an induced cycle rooted at r going
                        # further (the chord (w, r) would remain), EXCEPT w->r
                        # is the closing edge itself. So do not extend.
                        continue
                    if len(path) + 1 < max_k:
                        stack.append((path + (w,), in_path | {w}))
    # Deterministic id order: by length then sorted vertex set.
    rings.sort(key=lambda ring: (len(ring), tuple(sorted(ring))))
    return rings


def ring_boundary_edges(ring: Tuple[int, ...]) -> List[Tuple[int, int]]:
    """The edges of a ring as sorted vertex pairs, lexicographically sorted.

    Parity with /root/reference/data/utils.py:355-367 (get_ring_boundaries).
    """
    out = []
    for i in range(len(ring)):
        a, b = ring[i], ring[(i + 1) % len(ring)]
        out.append((min(a, b), max(a, b)))
    return sorted(out)


def ring_2complex(x, edge_index, edge_attr, size: int, y=None,
                  max_k: int = 7, include_down_adj: bool = True,
                  init_method: str = "sum", init_edges: bool = True,
                  init_rings: bool = False, v_mask=None) -> Complex:
    """Lift a graph to a 2-dimensional regular cell complex with ring 2-cells.

    Behavioural parity with
    /root/reference/data/utils.py:400-498 (compute_ring_2complex):
    - 1-cells are the undirected edges (lexicographic ids);
    - 2-cells are induced cycles of length <= max_k;
    - edge features come from edge_attr when given (must agree across the two
      directions), else from reducing vertex features;
    - ring features (optional) reduce member-vertex features.
    """
    assert x is not None
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    edge_index = np.asarray(edge_index)
    edges = edges_from_edge_index(edge_index)
    edge_ids = {e: i for i, e in enumerate(edges)}

    cell_tables: List[List[Tuple[int, ...]]] = [[(v,) for v in range(size)]]
    boundaries_tables: List[List[List[int]]] = [[]]
    if edges:
        cell_tables.append([tuple(e) for e in edges])
        boundaries_tables.append([[u, v] for (u, v) in edges])

        rings = find_induced_cycles(edge_index, size, max_k=max_k)
        if rings:
            cell_tables.append([tuple(ring) for ring in rings])
            boundaries_tables.append(
                [[edge_ids[e] for e in ring_boundary_edges(ring)] for ring in rings])

    complex_dim = len(cell_tables) - 1

    # Features.
    constructed = construct_cell_features(x, cell_tables, init_method)
    xs: List[Optional[np.ndarray]] = [x, None, None][: complex_dim + 1]
    if init_rings and complex_dim >= 2:
        xs[2] = constructed[2]
    if init_edges and complex_dim >= 1:
        if edge_attr is None:
            xs[1] = constructed[1]
        else:
            edge_attr = np.asarray(edge_attr)
            if edge_attr.ndim == 1:
                edge_attr = edge_attr[:, None]
            ex = np.zeros((len(edges), edge_attr.shape[1]), dtype=edge_attr.dtype)
            seen = np.zeros(len(edges), dtype=bool)
            for e in range(edge_index.shape[1]):
                u, v = int(edge_index[0, e]), int(edge_index[1, e])
                if u == v:
                    continue
                eid = edge_ids[(min(u, v), max(u, v))]
                if seen[eid]:
                    assert np.array_equal(ex[eid], edge_attr[e]), \
                        "edge features must be undirected"
                else:
                    ex[eid] = edge_attr[e]
                    seen[eid] = True
            assert seen.all()
            xs[1] = ex

    v_y, complex_y = split_labels(y, size)

    return build_complex_from_cells(
        cell_tables, boundaries_tables, xs, y=complex_y, v_y=v_y,
        include_down_adj=include_down_adj, v_mask=v_mask)


def convert_graph_dataset_with_rings(graphs, max_ring_size: int = 7,
                                     include_down_adj: bool = False,
                                     init_method: str = "sum",
                                     init_edges: bool = True,
                                     init_rings: bool = False,
                                     n_jobs: int = 1):
    """Lift a list of graphs; returns (complexes, max_dimension, num_features).

    Parity with /root/reference/data/utils.py:501-545. `n_jobs > 1` uses a
    process pool for the (CPU-bound) enumeration.
    """
    def _convert(g):
        return ring_2complex(
            g.x, g.edge_index, g.edge_attr, g.num_nodes, y=g.y,
            max_k=max_ring_size, include_down_adj=include_down_adj,
            init_method=init_method, init_edges=init_edges,
            init_rings=init_rings, v_mask=getattr(g, "mask", None))

    graphs = list(graphs)
    if n_jobs > 1:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=n_jobs) as pool:
            complexes = list(pool.map(_convert_worker,
                                      [(g, max_ring_size, include_down_adj,
                                        init_method, init_edges, init_rings)
                                       for g in graphs],
                                      chunksize=64))
    else:
        complexes = [_convert(g) for g in graphs]

    dimension = -1
    num_features = [None, None, None]
    for c, complex_ in enumerate(complexes):
        dimension = max(dimension, complex_.dimension)
        for dim in range(complex_.dimension + 1):
            nf = complex_.cochains[dim].num_features
            if num_features[dim] is None:
                num_features[dim] = nf
            else:
                assert num_features[dim] == nf
        # Order/equality validation against the input graphs.
        g = graphs[c]
        if complex_.y is not None:
            assert np.array_equal(complex_.y, np.asarray(g.y).reshape(-1))
        assert np.array_equal(complex_.cochains[0].x, np.asarray(g.x).reshape(len(np.asarray(g.x)), -1))
    return complexes, dimension, num_features[:dimension + 1]


def _convert_worker(args):
    g, max_ring_size, include_down_adj, init_method, init_edges, init_rings = args
    return ring_2complex(
        g.x, g.edge_index, g.edge_attr, g.num_nodes, y=g.y,
        max_k=max_ring_size, include_down_adj=include_down_adj,
        init_method=init_method, init_edges=init_edges, init_rings=init_rings,
        v_mask=getattr(g, "mask", None))
