"""Shared builders turning cell tables into a `Complex`.

Given, per dimension, the list of cells (as vertex tuples) and the list of
boundary-cell ids of every cell, these helpers derive the four adjacency
structures of the reference framework (boundary index, upper adjacency with
shared coboundaries, lower adjacency with shared boundaries) and assemble
`Cochain`/`Complex` records.  Semantics mirror
/root/reference/data/utils.py:45-221 (build_tables / build_adj /
construct_features / generate_cochain) without any gudhi/graph-tool
dependency.
"""
from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cwn_tpu.complex import Cochain, Complex

VertexTuple = Tuple[int, ...]


def boundaries_to_coboundaries(boundaries_tables: List[List[List[int]]],
                               num_cells_per_dim: List[int]) -> List[List[List[int]]]:
    """coboundaries[k][cell_id] = ids of (k+1)-cells having cell_id as boundary.

    Coboundary lists are recorded in the id order of the (k+1)-cells, matching
    the insertion order the reference obtains while scanning cells.
    """
    num_dims = len(boundaries_tables)
    coboundaries: List[List[List[int]]] = [
        [[] for _ in range(num_cells_per_dim[k])] for k in range(num_dims)]
    for k in range(1, num_dims):
        for cell_id, bnds in enumerate(boundaries_tables[k]):
            for b in bnds:
                coboundaries[k - 1][b].append(cell_id)
    return coboundaries


def build_adjacencies(boundaries_tables: List[List[List[int]]],
                      coboundaries: List[List[List[int]]],
                      complex_dim: int,
                      include_down_adj: bool):
    """Upper/lower adjacency edge lists per dimension.

    Two k-cells are upper adjacent iff they are both boundaries of a common
    (k+1)-cell (the shared coboundary); lower adjacent iff they share a common
    (k-1)-boundary.  Every unordered pair contributes both directed edges.
    Mirrors /root/reference/data/utils.py:103-138 (build_adj).
    """
    upper: List[List[List[int]]] = [[] for _ in range(complex_dim + 1)]
    lower: List[List[List[int]]] = [[] for _ in range(complex_dim + 1)]
    shared_cob: List[List[int]] = [[] for _ in range(complex_dim + 1)]
    shared_bnd: List[List[int]] = [[] for _ in range(complex_dim + 1)]

    for dim in range(1, complex_dim + 1):
        # Upper adjacency between the boundaries of each dim-cell.
        for cell_id, bnds in enumerate(boundaries_tables[dim]):
            for id1, id2 in itertools.combinations(bnds, 2):
                upper[dim - 1].extend([[id1, id2], [id2, id1]])
                shared_cob[dim - 1].extend([cell_id, cell_id])

    if include_down_adj:
        for dim in range(complex_dim):
            # Lower adjacency between the coboundaries of each dim-cell.
            for cell_id, cobs in enumerate(coboundaries[dim]):
                for id1, id2 in itertools.combinations(cobs, 2):
                    lower[dim + 1].extend([[id1, id2], [id2, id1]])
                    shared_bnd[dim + 1].extend([cell_id, cell_id])

    return upper, lower, shared_cob, shared_bnd


def construct_cell_features(vx: np.ndarray, cell_tables: Sequence[List[VertexTuple]],
                            init_method: str = "sum") -> List[Optional[np.ndarray]]:
    """Initialise higher-cell features by reducing member-vertex features.

    Mirrors /root/reference/data/utils.py:141-155 (construct_features).
    """
    vx = np.asarray(vx)
    if vx.ndim == 1:
        vx = vx[:, None]
    features: List[Optional[np.ndarray]] = [vx]
    for dim in range(1, len(cell_tables)):
        cells = cell_tables[dim]
        out = np.zeros((len(cells), vx.shape[1]), dtype=vx.dtype)
        for c, cell in enumerate(cells):
            members = vx[list(cell)]
            if init_method == "sum":
                out[c] = members.sum(axis=0)
            elif init_method == "mean":
                out[c] = members.mean(axis=0)
            elif init_method == "max":
                out[c] = members.max(axis=0)
            else:
                raise ValueError(f"Unknown init_method {init_method}")
        features.append(out)
    return features


def split_labels(y, size: int):
    """Split y into per-vertex labels vs a whole-complex label.

    Mirrors /root/reference/data/utils.py:158-174 (extract_labels).
    """
    if y is None:
        return None, None
    y = np.asarray(y)
    if y.reshape(-1).shape[0] == 1 or (y.ndim > 0 and y.shape[0] == 1):
        return None, y
    assert y.shape[0] == size
    return y, None


def build_complex_from_cells(cell_tables: List[List[VertexTuple]],
                             boundaries_tables: List[List[List[int]]],
                             xs: List[Optional[np.ndarray]],
                             y=None,
                             v_y=None,
                             include_down_adj: bool = True,
                             v_mask=None) -> Complex:
    """Assemble a Complex from cell tables + per-cell boundary ids + features."""
    complex_dim = len(cell_tables) - 1
    num_cells_per_dim = [len(t) for t in cell_tables]
    coboundaries = boundaries_to_coboundaries(boundaries_tables, num_cells_per_dim)
    upper, lower, shared_cob, shared_bnd = build_adjacencies(
        boundaries_tables, coboundaries, complex_dim, include_down_adj)

    cochains = []
    for dim in range(complex_dim + 1):
        n = num_cells_per_dim[dim]
        up_index = (np.array(upper[dim], dtype=np.int64).T
                    if len(upper[dim]) else None)
        down_index = (np.array(lower[dim], dtype=np.int64).T
                      if len(lower[dim]) else None)
        sc = np.array(shared_cob[dim], dtype=np.int64) if len(shared_cob[dim]) else None
        sb = np.array(shared_bnd[dim], dtype=np.int64) if len(shared_bnd[dim]) else None

        boundary_index = None
        if dim > 0 and len(boundaries_tables[dim]) > 0:
            rows0, rows1 = [], []
            for cell_id, bnds in enumerate(boundaries_tables[dim]):
                for b in bnds:
                    rows0.append(b)
                    rows1.append(cell_id)
            if rows0:
                boundary_index = np.array([rows0, rows1], dtype=np.int64)

        cochains.append(Cochain(
            dim=dim,
            x=xs[dim] if dim < len(xs) else None,
            upper_index=up_index,
            lower_index=down_index,
            shared_coboundaries=sc,
            shared_boundaries=sb,
            boundary_index=boundary_index,
            y=v_y if dim == 0 else None,
            mask=v_mask if dim == 0 else None,
            num_cells=n,
            num_cells_up=(num_cells_per_dim[dim + 1] if dim < complex_dim else 0),
            num_cells_down=(num_cells_per_dim[dim - 1] if dim > 0 else 0),
        ))

    return Complex(*cochains, y=y, dimension=complex_dim)


def edges_from_edge_index(edge_index: np.ndarray) -> List[VertexTuple]:
    """Canonical undirected edge list, lexicographically sorted.

    Matches the id order gudhi's simplex tree yields for 1-simplices
    (lexicographic in sorted vertex pairs), so edge ids line up with the
    reference lift.
    """
    edge_index = np.asarray(edge_index)
    seen = set()
    for e in range(edge_index.shape[1]):
        u, v = int(edge_index[0, e]), int(edge_index[1, e])
        if u == v:
            continue
        seen.add((min(u, v), max(u, v)))
    return sorted(seen)
