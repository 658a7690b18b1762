"""Bandwidth-minimizing cell relabeling for shared-structure datasets.

A complex's cell numbering is an internal gauge: every model output is
invariant to it (message passing is permutation-equivariant per dim and
readout pools over cells).  The banded SpMM kernel (cwn_tpu.ops.banded),
however, is only fast when an adjacency's (src, dst) pairs cluster near
the diagonal — and lift orderings (lexicographic edge enumeration over a
Delaunay mesh, ring tables) are far from banded: FLOW's dim-1 upper
adjacency needed 178 dense tiles raw vs ~40 after reverse Cuthill-McKee.

`rcm_relabel` permutes each dimension's cells by RCM over its
(upper ∪ lower ∪ boundary-coupled) adjacency and rewrites every
cross-reference consistently.  For a uniform dataset the same permutation
applies to every complex (same structure), so templates, banks and plans
all inherit the banded order.

No reference analogue — the reference's torch-scatter aggregation is
order-agnostic (/root/reference/mp/cell_mp.py:423-479); this exists
because the MXU is not.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from cwn_tpu.complex import Complex


def _dim_perm(co, n: int) -> np.ndarray:
    """RCM permutation (new -> old) for one dimension's cells."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rows, cols = [], []
    for idx in (co.upper_index, co.lower_index):
        if idx is not None and idx.size:
            rows.append(idx[0])
            cols.append(idx[1])
    if co.boundary_index is not None and co.boundary_index.size:
        # Couple cells that share a boundary cell (keeps the boundary
        # channel's B matrix banded too): link consecutive coboundaries
        # of each boundary cell.
        b, c = co.boundary_index
        order = np.argsort(b, kind="stable")
        b, c = b[order], c[order]
        same = b[1:] == b[:-1]
        rows.append(c[1:][same])
        cols.append(c[:-1][same])
    if not rows:
        return np.arange(n)
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    a = sp.coo_matrix((np.ones(len(r), np.int8), (r, c)),
                      shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=False))
    assert len(perm) == n
    return perm


def rcm_perms(template: Complex, max_dim: int) -> Dict[int, np.ndarray]:
    """new->old permutation per dimension, from one representative."""
    perms = {}
    for k in range(max_dim + 1):
        co = template.cochains.get(k)
        if co is None or not (co.num_cells or 0):
            continue
        perms[k] = _dim_perm(co, int(co.num_cells))
    return perms


def relabel_complex(c: Complex, perms: Dict[int, np.ndarray],
                    max_dim: int) -> None:
    """Apply the per-dim permutations to one complex IN PLACE."""
    inv = {}
    for k, p in perms.items():
        inv_k = np.empty(len(p), np.int32)
        inv_k[p] = np.arange(len(p), dtype=np.int32)
        inv[k] = inv_k

    for k in range(max_dim + 1):
        co = c.cochains.get(k)
        if co is None:
            continue
        p = perms.get(k)
        if p is not None:
            if co.x is not None:
                co.x = co.x[p]
            if co.y is not None:
                co.y = co.y[p]
            if co.mask is not None:
                co.mask = co.mask[p]
        ik = inv.get(k)
        if ik is not None:
            if co.upper_index is not None and co.upper_index.size:
                co.upper_index = ik[co.upper_index]
            if co.lower_index is not None and co.lower_index.size:
                co.lower_index = ik[co.lower_index]
        if co.shared_coboundaries is not None and (k + 1) in inv \
                and co.shared_coboundaries.size:
            co.shared_coboundaries = inv[k + 1][co.shared_coboundaries]
        if co.shared_boundaries is not None and (k - 1) in inv \
                and co.shared_boundaries.size:
            co.shared_boundaries = inv[k - 1][co.shared_boundaries]
        if co.boundary_index is not None and co.boundary_index.size:
            b, t = co.boundary_index[0], co.boundary_index[1]
            if (k - 1) in inv:
                b = inv[k - 1][b]
            if ik is not None:
                t = ik[t]
            co.boundary_index = np.stack([b, t])


def rcm_relabel(complexes: Sequence[Complex], max_dim: int) -> None:
    """Relabel every complex of a uniform dataset with the shared RCM
    permutations (idempotent; marks complexes to survive repeat calls
    from sibling loaders over the same split)."""
    todo = [c for c in complexes
            if not getattr(c, "_rcm_relabeled", False)]
    if not todo:
        return
    perms = rcm_perms(todo[0], max_dim)
    if not perms:
        return
    for c in todo:
        relabel_complex(c, perms, max_dim)
        c._rcm_relabeled = True
