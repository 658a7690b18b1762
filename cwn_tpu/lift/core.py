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

from typing import List, Optional, Sequence, Tuple

import numpy as np

from cwn_tpu.complex import Cochain, Complex

VertexTuple = Tuple[int, ...]


def _flatten_table(table: List[List[int]]):
    """(flat member ids, per-row counts) for a list of int lists."""
    counts = np.fromiter((len(r) for r in table), np.int64, len(table))
    total = int(counts.sum())
    flat = np.fromiter((m for r in table for m in r), np.int64, total)
    return flat, counts


def _pairs_cellmajor(member_lists, ids: np.ndarray):
    """Both directed pairs between the members of every group, in the
    reference's exact emission order: group-major, `itertools.combinations`
    pair order within a group, the two directions interleaved
    (/root/reference/data/utils.py:103-138 `build_adj`).

    Vectorised by bucketing groups by size and scattering each bucket's
    block into its precomputed output offsets — O(total pairs) numpy work
    instead of a Python loop per pair (the old loop dominated dense-SR
    ring-6 lifts).

    Returns (pairs [E, 2], group_tag [E]) int64 arrays.
    """
    n = len(member_lists)
    lengths = np.fromiter((len(m) for m in member_lists), np.int64, n)
    out_counts = lengths * (lengths - 1)          # 2 * C(L, 2)
    offsets = np.concatenate([[0], np.cumsum(out_counts)])
    total = int(offsets[-1])
    pairs = np.empty((total, 2), np.int64)
    tags = np.empty(total, np.int64)
    for length in np.unique(lengths):
        length = int(length)
        if length < 2:
            continue
        sel = np.nonzero(lengths == length)[0]
        arr = np.asarray([member_lists[i] for i in sel], np.int64)
        iu, ju = np.triu_indices(length, k=1)     # == combinations order
        fwd = np.stack([arr[:, iu], arr[:, ju]], axis=-1)      # [R, P, 2]
        bwd = fwd[:, :, ::-1]
        block = np.stack([fwd, bwd], axis=2).reshape(len(sel), -1, 2)
        dst = (offsets[sel][:, None]
               + np.arange(2 * len(iu))[None, :]).ravel()
        pairs[dst] = block.reshape(-1, 2)
        tags[dst] = np.repeat(ids[sel], 2 * len(iu))
    return pairs, tags


def build_adjacencies(boundaries_tables: List[List[List[int]]],
                      complex_dim: int,
                      include_down_adj: bool):
    """Upper/lower adjacency per dimension, as numpy arrays.

    Two k-cells are upper adjacent iff they are both boundaries of a common
    (k+1)-cell (the shared coboundary); lower adjacent iff they share a common
    (k-1)-boundary.  Every unordered pair contributes both directed edges.
    Mirrors /root/reference/data/utils.py:103-138 (build_adj), including the
    emission order (see _pairs_cellmajor).

    Returns (upper, lower, shared_cob, shared_bnd) where upper[k]/lower[k]
    are [E, 2] int64 arrays and shared_cob[k]/shared_bnd[k] are [E].
    """
    empty = lambda: (np.zeros((0, 2), np.int64), np.zeros(0, np.int64))
    upper = [empty()[0] for _ in range(complex_dim + 1)]
    lower = [empty()[0] for _ in range(complex_dim + 1)]
    shared_cob = [empty()[1] for _ in range(complex_dim + 1)]
    shared_bnd = [empty()[1] for _ in range(complex_dim + 1)]

    for dim in range(1, complex_dim + 1):
        # Upper adjacency between the boundaries of each dim-cell.
        table = boundaries_tables[dim]
        ids = np.arange(len(table), dtype=np.int64)
        upper[dim - 1], shared_cob[dim - 1] = _pairs_cellmajor(table, ids)

    if include_down_adj:
        for dim in range(complex_dim):
            # Lower adjacency between the coboundaries of each dim-cell;
            # the reference iterates (k-1)-cells in id order, each with its
            # coboundaries in ascending (k+1 insertion) order — i.e. the
            # (boundary, cell) pairs sorted by (boundary, cell).
            table = boundaries_tables[dim + 1]
            if not table:
                continue
            flat, counts = _flatten_table(table)
            cells = np.repeat(np.arange(len(table), dtype=np.int64), counts)
            order = np.lexsort((cells, flat))
            flat, cells = flat[order], cells[order]
            bnd_ids, starts = np.unique(flat, return_index=True)
            groups = np.split(cells, starts[1:])
            lower[dim + 1], shared_bnd[dim + 1] = _pairs_cellmajor(
                groups, bnd_ids)

    return upper, lower, shared_cob, shared_bnd


def construct_cell_features(vx: np.ndarray, cell_tables: Sequence[List[VertexTuple]],
                            init_method: str = "sum") -> List[Optional[np.ndarray]]:
    """Initialise higher-cell features by reducing member-vertex features.

    Mirrors /root/reference/data/utils.py:141-155 (construct_features);
    vectorised by bucketing cells by member count.
    """
    if init_method not in ("sum", "mean", "max"):
        raise ValueError(f"Unknown init_method {init_method}")
    vx = np.asarray(vx)
    if vx.ndim == 1:
        vx = vx[:, None]
    features: List[Optional[np.ndarray]] = [vx]
    for dim in range(1, len(cell_tables)):
        cells = cell_tables[dim]
        out = np.zeros((len(cells), vx.shape[1]), dtype=vx.dtype)
        lengths = np.fromiter((len(c) for c in cells), np.int64, len(cells))
        for length in np.unique(lengths):
            sel = np.nonzero(lengths == int(length))[0]
            arr = np.asarray([cells[i] for i in sel], np.int64)
            members = vx[arr]                     # [R, L, F]
            if init_method == "sum":
                out[sel] = members.sum(axis=1)
            elif init_method == "mean":
                out[sel] = members.mean(axis=1)
            else:
                out[sel] = members.max(axis=1)
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
    upper, lower, shared_cob, shared_bnd = build_adjacencies(
        boundaries_tables, complex_dim, include_down_adj)

    cochains = []
    for dim in range(complex_dim + 1):
        n = num_cells_per_dim[dim]
        up_index = upper[dim].T if len(upper[dim]) else None
        down_index = lower[dim].T if len(lower[dim]) else None
        sc = shared_cob[dim] if len(shared_cob[dim]) else None
        sb = shared_bnd[dim] if len(shared_bnd[dim]) else None

        boundary_index = None
        if dim > 0 and len(boundaries_tables[dim]) > 0:
            flat, counts = _flatten_table(boundaries_tables[dim])
            if len(flat):
                rows1 = np.repeat(
                    np.arange(len(boundaries_tables[dim]), dtype=np.int64),
                    counts)
                boundary_index = np.stack([flat, rows1])

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
