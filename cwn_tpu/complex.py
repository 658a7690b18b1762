"""Host-side cell-complex IR.

Numpy-only containers produced by the lifting stage (`cwn_tpu.lift`) and
consumed by the batching stage (`cwn_tpu.batch`), which turns them into
static-shape padded device buffers.  Unlike the reference's torch-based
`Cochain`/`Complex` (see /root/reference/data/complex.py:36,490), these are
plain frozen records: all batching offset logic lives in `cwn_tpu.batch`
and all device compute is functional JAX.

Index conventions (identical semantics to the reference):
  upper_index    [2, E_up]  row0 = source cell j, row1 = target cell i (both dim k).
                 Messages flow j -> i; every adjacency is stored in both
                 directions (symmetric pairs).
  lower_index    [2, E_dn]  same layout for lower adjacency.
  shared_coboundaries [E_up]  id of the (k+1)-cell mediating each upper edge.
  shared_boundaries   [E_dn]  id of the (k-1)-cell mediating each lower edge.
  boundary_index [2, E_b]   row0 = boundary cell id (dim k-1), row1 = cell id (dim k).
  upper_orient / lower_orient [E]  optional +-1 relative orientations
                 (trajectory models only).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


def _as_index(a, name: str) -> Optional[np.ndarray]:
    if a is None:
        return None
    # int32 halves the resident size of big lifted datasets (dense SR
    # families at ring k=6 carry ~3e5 adjacency edges per graph); cell ids
    # are always far below 2^31 and the packer emits int32 device buffers.
    a = np.asarray(a, dtype=np.int32)
    if a.ndim != 2 or a.shape[0] != 2:
        raise ValueError(f"{name} must have shape [2, E], got {a.shape}")
    return a


def _as_vec(a, dtype=np.int32) -> Optional[np.ndarray]:
    if a is None:
        return None
    return np.asarray(a, dtype=dtype).reshape(-1)


@dataclasses.dataclass
class Cochain:
    """All data attached to the k-cells of one complex (a k-cochain)."""

    dim: int
    x: Optional[np.ndarray] = None                 # [N_k, F] float
    upper_index: Optional[np.ndarray] = None       # [2, E_up]
    lower_index: Optional[np.ndarray] = None       # [2, E_dn]
    shared_coboundaries: Optional[np.ndarray] = None  # [E_up]
    shared_boundaries: Optional[np.ndarray] = None    # [E_dn]
    boundary_index: Optional[np.ndarray] = None    # [2, E_b]
    upper_orient: Optional[np.ndarray] = None      # [E_up] float (+-1)
    lower_orient: Optional[np.ndarray] = None      # [E_dn] float (+-1)
    y: Optional[np.ndarray] = None                 # per-cell labels
    mask: Optional[np.ndarray] = None              # per-cell bool (readout sel)
    num_cells: Optional[int] = None
    num_cells_up: Optional[int] = None             # number of (k+1)-cells
    num_cells_down: Optional[int] = None           # number of (k-1)-cells

    def __post_init__(self):
        self.upper_index = _as_index(self.upper_index, "upper_index")
        self.lower_index = _as_index(self.lower_index, "lower_index")
        self.boundary_index = _as_index(self.boundary_index, "boundary_index")
        self.shared_coboundaries = _as_vec(self.shared_coboundaries)
        self.shared_boundaries = _as_vec(self.shared_boundaries)
        if self.upper_orient is not None:
            self.upper_orient = _as_vec(self.upper_orient, np.float64)
        if self.lower_orient is not None:
            self.lower_orient = _as_vec(self.lower_orient, np.float64)
        if self.mask is not None:
            self.mask = np.asarray(self.mask, dtype=bool).reshape(-1)
        if self.x is not None:
            self.x = np.asarray(self.x)
            if self.x.ndim == 1:
                self.x = self.x[:, None]
        if self.num_cells is None and self.x is not None:
            self.num_cells = int(self.x.shape[0])
        self._validate()

    # -- invariants -------------------------------------------------------
    def _validate(self):
        n = self.num_cells
        if self.upper_index is not None:
            assert self.shared_coboundaries is not None
            assert self.upper_index.shape[1] == self.shared_coboundaries.shape[0]
            if n is not None and self.upper_index.size:
                assert self.upper_index.max() < n
        if self.lower_index is not None:
            assert self.shared_boundaries is not None
            assert self.lower_index.shape[1] == self.shared_boundaries.shape[0]
            if n is not None and self.lower_index.size:
                assert self.lower_index.max() < n
        if self.boundary_index is not None and n is not None and self.boundary_index.size:
            assert self.boundary_index[1].max() < n

    # -- counts -----------------------------------------------------------
    @property
    def num_features(self) -> int:
        return 0 if self.x is None else int(self.x.shape[1])

    @property
    def num_upper_edges(self) -> int:
        return 0 if self.upper_index is None else int(self.upper_index.shape[1])

    @property
    def num_lower_edges(self) -> int:
        return 0 if self.lower_index is None else int(self.lower_index.shape[1])

    @property
    def num_boundary_links(self) -> int:
        return 0 if self.boundary_index is None else int(self.boundary_index.shape[1])


class Complex:
    """A cell complex: one Cochain per dimension 0..dimension, plus a label."""

    def __init__(self, *cochains: Cochain, y: Optional[np.ndarray] = None,
                 dimension: Optional[int] = None):
        if len(cochains) == 0:
            raise ValueError("At least one cochain is required")
        if dimension is None:
            dimension = len(cochains) - 1
        for i, c in enumerate(cochains):
            assert c.dim == i, f"cochain {i} has dim {c.dim}"
        self.cochains: Dict[int, Cochain] = {c.dim: c for c in cochains}
        self.dimension = dimension
        self.y = None if y is None else np.asarray(y).reshape(-1)
        self._consolidate()

    def _consolidate(self):
        """Cross-fill num_cells_up / num_cells_down from neighbouring dims."""
        for dim, c in self.cochains.items():
            if dim + 1 in self.cochains:
                c.num_cells_up = self.cochains[dim + 1].num_cells
            elif c.num_cells_up is None:
                c.num_cells_up = 0
            if dim - 1 in self.cochains:
                c.num_cells_down = self.cochains[dim - 1].num_cells
            elif dim == 0:
                c.num_cells_down = 0

    @property
    def nodes(self) -> Cochain:
        return self.cochains[0]

    @property
    def edges(self) -> Optional[Cochain]:
        return self.cochains.get(1)

    @property
    def two_cells(self) -> Optional[Cochain]:
        return self.cochains.get(2)

    def set_xs(self, xs: List[np.ndarray]):
        for dim, x in enumerate(xs):
            if x is not None and dim in self.cochains:
                self.cochains[dim].x = np.asarray(x)

    def __repr__(self):
        parts = ", ".join(
            f"{d}: {c.num_cells} cells" for d, c in sorted(self.cochains.items()))
        return f"Complex(dim={self.dimension}, {{{parts}}}, y={self.y})"
