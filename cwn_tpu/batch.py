"""Packing complexes into padded, static-shape device buffers.

This is the TPU-first replacement for the reference's dynamic
`CochainBatch.from_cochain_list` / `ComplexBatch.from_complex_list`
(/root/reference/data/complex.py:323-458,690-728).  Instead of per-batch
dynamic shapes, a batch of complexes is packed host-side into ONE pytree of
fixed-size arrays per cochain dimension:

- cells of each dim are concatenated across complexes (same offset rules as
  the reference's `__inc__`) and padded to a planned size;
- all adjacency edge lists are offset, **sorted by destination cell** (so the
  on-device aggregation is a sorted segment reduction, not a random scatter),
  and padded;
- padded edges point at the last (padding) cell with mask 0, preserving
  sortedness; padded cells carry batch id `batch_size` (a trash segment
  sliced off after pooling).

Static shapes mean XLA compiles once per pad plan; the loader buckets
batches so only a handful of plans ever exist.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
from flax import struct

from cwn_tpu.complex import Complex


def _round_up(n: int, multiple: int) -> int:
    if n <= 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


@struct.dataclass
class CochainBuffers:
    """Padded device buffers for one cochain dimension of a batch."""

    x: Optional[np.ndarray]            # [N, F] float
    cell_mask: np.ndarray              # [N] float32, 1 = valid cell
    batch: np.ndarray                  # [N] int32, complex id (pad -> batch_size)
    # Upper adjacency (messages j -> i along shared (k+1)-coboundaries).
    up_src: np.ndarray                 # [E_up] int32
    up_dst: np.ndarray                 # [E_up] int32 (sorted ascending)
    up_cob: np.ndarray                 # [E_up] int32, pointer into dim k+1 cells
    up_mask: np.ndarray                # [E_up] float32
    # Lower adjacency (messages along shared (k-1)-boundaries).
    down_src: np.ndarray               # [E_dn] int32
    down_dst: np.ndarray               # [E_dn] int32 (sorted ascending)
    down_shared: np.ndarray            # [E_dn] int32, pointer into dim k-1 cells
    down_mask: np.ndarray              # [E_dn] float32
    # Boundary links (messages from (k-1)-boundary cells into k-cells).
    b_src: np.ndarray                  # [E_b] int32, cell id in dim k-1
    b_dst: np.ndarray                  # [E_b] int32, cell id in dim k (sorted)
    b_mask: np.ndarray                 # [E_b] float32
    # Optional +-1 orientations (trajectory models).
    up_orient: Optional[np.ndarray]    # [E_up] float
    down_orient: Optional[np.ndarray]  # [E_dn] float
    y: Optional[np.ndarray]            # [N] per-cell labels
    sel_mask: Optional[np.ndarray]     # [N] float, 1 = readout-selected cell
    # Optional Pallas tile plans (cwn_tpu.ops.tiles.TilePlan) for the fused
    # one-hot SpMM kernels; populated by add_tile_plans().  *_t are the
    # transpose plans used by the custom VJP.
    # Factorized upper channel (the ring O(r^2) -> O(r) trick): the upper
    # adjacency of dim k is "all ordered pairs of distinct cells sharing a
    # (k+1)-coboundary", so the per-pair message act(W1 x_src + W2 x_cob + b)
    # depends only on (source, coboundary) — summing it over a coboundary's
    # members ONCE and subtracting each destination's own term reproduces
    # the pairwise sum exactly with O(memberships) work instead of
    # O(pairs):  out[i] = sum_{c ni i} (S_c - t(i, c)),
    #            S_c = sum_{j in c} t(j, c),  t(j, c) = act(xs_j + xu_c + b).
    # The membership list IS dim k+1's boundary structure; these arrays are
    # that list re-sorted by member cell (the coboundary-sorted order lives
    # in dims[k+1].b_*).  An 18-ring contributes 18 memberships in place of
    # 306 pairs — the dominant term of the molecular benchmarks' step.
    fac_src: Optional[np.ndarray] = None   # [M] int32 member cell (dim k), ascending
    fac_cob: Optional[np.ndarray] = None   # [M] int32 coboundary cell (dim k+1)
    fac_mask: Optional[np.ndarray] = None  # [M] float32
    # Pallas plans for the factorized channel's three reductions (XLA
    # lowers them to slow scatter fusions otherwise; PERF.md round 4):
    #   fac_s: membership rows (coboundary-sorted t1) -> coboundary cells
    #   fac_o: membership rows (member-sorted t1)     -> member cells
    #   fac_g: coboundary cells (S_c)                 -> member cells
    fac_s_plan: Optional[object] = None
    fac_s_plan_t: Optional[object] = None
    fac_o_plan: Optional[object] = None
    fac_o_plan_t: Optional[object] = None
    fac_g_plan: Optional[object] = None
    fac_g_plan_t: Optional[object] = None
    # Launch-consolidated factorized reductions: fac_g and fac_o write the
    # SAME destination cell space, so one windowed kernel over the
    # concatenated source arena [S_c ; own] produces both sums in adjacent
    # output sections (out_up = sec0 - sec1) — half the custom-call
    # launches of the pair.  fac_go_split = (src boundary, dst boundary)
    # between the fac_g and fac_o sections (static).
    fac_go_plan: Optional[object] = None
    fac_go_plan_t: Optional[object] = None
    fac_go_split: Optional[Tuple[int, int]] = struct.field(
        pytree_node=False, default=None)
    up_plan: Optional[object] = None
    up_plan_t: Optional[object] = None
    down_plan: Optional[object] = None
    down_plan_t: Optional[object] = None
    b_plan: Optional[object] = None
    b_plan_t: Optional[object] = None
    # Fused-message plans (non-identity channels: act(W1 x_src + W2 x_shared
    # + b) -> segment sum).  The fwd plan is up_plan/down_plan itself (it
    # carries the shared-cell pointer as its extra stream); these are the
    # two backward plans, sorted by src / by the shared pointer.
    up_plan_bs: Optional[object] = None
    up_plan_bc: Optional[object] = None
    down_plan_bs: Optional[object] = None
    down_plan_bc: Optional[object] = None
    # Readout pooling plans (cells -> complex segments) + transpose.
    pool_plan: Optional[object] = None
    pool_plan_t: Optional[object] = None
    # Uniform-structure batched mode: when every complex in the batch has
    # IDENTICAL structure (adjacency, orientations, cell counts — FLOW,
    # OCEAN, ring benchmarks), the identity-message channels run as ONE
    # shared-structure SpMM over features flattened to [n_struct, B*F]
    # (cells of complex c live at arena rows c*n_struct + i).  The MXU
    # then sees a handful of tiles with a B*F-wide value operand instead
    # of B block-diagonal copies of the structure (64x fewer tiles on
    # FLOW).  Plans are built by add_uniform_tile_plans; orientation
    # weights are folded in (identical across complexes by definition).
    uni_up_plan: Optional[object] = None
    uni_up_plan_t: Optional[object] = None
    uni_down_plan: Optional[object] = None
    uni_down_plan_t: Optional[object] = None
    uni_b_plan: Optional[object] = None
    uni_b_plan_t: Optional[object] = None
    uni_cells: Optional[int] = struct.field(pytree_node=False, default=None)
    uni_count: Optional[int] = struct.field(pytree_node=False, default=None)
    # Structure cell count of dim k-1 (the boundary channel's source dim).
    uni_b_src_cells: Optional[int] = struct.field(pytree_node=False,
                                                  default=None)
    # Edge-partitioned (EP) mode: when `ep_axis` names a mesh axis the
    # batch is cell-sharded over it and the engine halo-exchanges source
    # rows with one all_to_all per channel (cwn_tpu.parallel.edge_partition).
    # In this mode *_src / up_cob / down_shared hold HALO positions
    # (owner_shard * P + rank) instead of cell ids, and the *_send arrays
    # give, per destination shard, the local row ids this device ships.
    ep_axis: Optional[str] = struct.field(pytree_node=False, default=None)
    up_send: Optional[np.ndarray] = None       # [D, P_up] int32 (this device as sender)
    cob_send: Optional[np.ndarray] = None      # [D, P_cob] rows of dim k+1
    down_send: Optional[np.ndarray] = None     # [D, P_dn]
    dsh_send: Optional[np.ndarray] = None      # [D, P_dsh] rows of dim k-1
    b_send: Optional[np.ndarray] = None        # [D, P_b]  rows of dim k-1

    @property
    def num_cells_padded(self) -> int:
        return int(self.cell_mask.shape[0])

    @property
    def num_features(self) -> int:
        return 0 if self.x is None else int(self.x.shape[-1])


@struct.dataclass
class ComplexBatch:
    """A batch of complexes as one static-shape pytree."""

    dims: Tuple[CochainBuffers, ...]
    y: Optional[np.ndarray]            # [batch_size] complex labels
    y_mask: np.ndarray                 # [batch_size] float32, 1 = real complex
    batch_size: int = struct.field(pytree_node=False)
    max_dim: int = struct.field(pytree_node=False)
    # Launch-consolidated readout pooling: every dim's cells -> complex
    # segment sum as ONE windowed kernel over the concatenated cell arenas
    # (per-dim pool_plans concatenated; cwn_tpu.ops.tiles
    # .concat_window_plans).  *_off are the static section offsets
    # (len dims + 1): sources at [src_off[k], src_off[k+1]), outputs at
    # [dst_off[k], dst_off[k] + batch_size).
    pool_all_plan: Optional[object] = None
    pool_all_plan_t: Optional[object] = None
    pool_all_src_off: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)
    pool_all_dst_off: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)
    # Launch-consolidated boundary channels: every dim's identity boundary
    # segment-sum (dim k reads the PRE-layER features of dim k-1, so there
    # is no cross-dim dependency within a conv layer) as ONE windowed
    # kernel.  b_all_dims lists the covered dims (those with boundary
    # structure, k >= 1); source section i holds x_{b_all_dims[i]-1},
    # output section i the dim-b_all_dims[i] boundary sum.
    b_all_plan: Optional[object] = None
    b_all_plan_t: Optional[object] = None
    b_all_dims: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)
    b_all_src_off: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)
    b_all_dst_off: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)

    @property
    def num_complexes(self) -> int:
        return self.batch_size


@dataclasses.dataclass(frozen=True)
class PadPlan:
    """Static pad sizes for a batch; determines the compiled program shape."""

    batch_size: int
    num_cells: Tuple[int, ...]         # per dim
    num_up: Tuple[int, ...]
    num_down: Tuple[int, ...]
    num_boundary: Tuple[int, ...]

    @staticmethod
    def for_complexes(complexes: Sequence[Complex], max_dim: int,
                      batch_size: Optional[int] = None,
                      pad_multiple: int = 128) -> "PadPlan":
        nc = [0] * (max_dim + 1)
        nu = [0] * (max_dim + 1)
        nd = [0] * (max_dim + 1)
        nb = [0] * (max_dim + 1)
        for c in complexes:
            for k in range(max_dim + 1):
                co = c.cochains.get(k)
                if co is None:
                    continue
                nc[k] += co.num_cells or 0
                nu[k] += co.num_upper_edges
                nd[k] += co.num_lower_edges
                nb[k] += co.num_boundary_links
        return PadPlan(
            batch_size=batch_size or len(complexes),
            num_cells=tuple(_round_up(n, pad_multiple) for n in nc),
            num_up=tuple(_round_up(n, pad_multiple) for n in nu),
            num_down=tuple(_round_up(n, pad_multiple) for n in nd),
            num_boundary=tuple(_round_up(n, pad_multiple) for n in nb),
        )

    def covers(self, other: "PadPlan") -> bool:
        return (self.batch_size >= other.batch_size
                and all(a >= b for a, b in zip(self.num_cells, other.num_cells))
                and all(a >= b for a, b in zip(self.num_up, other.num_up))
                and all(a >= b for a, b in zip(self.num_down, other.num_down))
                and all(a >= b for a, b in zip(self.num_boundary, other.num_boundary)))

    @staticmethod
    def union(plans: Sequence["PadPlan"]) -> "PadPlan":
        return PadPlan(
            batch_size=max(p.batch_size for p in plans),
            num_cells=tuple(np.max([p.num_cells for p in plans], axis=0)),
            num_up=tuple(np.max([p.num_up for p in plans], axis=0)),
            num_down=tuple(np.max([p.num_down for p in plans], axis=0)),
            num_boundary=tuple(np.max([p.num_boundary for p in plans], axis=0)),
        )


def _pad_edges(src, dst, extra, orient, pad_to: int, dst_trash: int,
               src_trash: int):
    """Sort (src, dst, extra, orient) by dst and pad to `pad_to` with masked
    edges.  Padded dst point at the last cell of the destination dim (keeps
    dst ascending); padded src point at the last cell of the *source* dim,
    which may be a different dimension (boundary links)."""
    e = len(dst)
    order = np.argsort(dst, kind="stable") if e else np.arange(0)
    src = np.asarray(src, dtype=np.int32)[order]
    dst = np.asarray(dst, dtype=np.int32)[order]
    extra = None if extra is None else np.asarray(extra, dtype=np.int32)[order]
    orient = None if orient is None else np.asarray(orient, dtype=np.float32)[order]

    pad = pad_to - e
    assert pad >= 0, f"pad plan too small: {e} > {pad_to}"
    mask = np.concatenate([np.ones(e, np.float32), np.zeros(pad, np.float32)])
    src = np.concatenate([src, np.full(pad, src_trash, np.int32)])
    dst = np.concatenate([dst, np.full(pad, dst_trash, np.int32)])
    if extra is not None:
        extra = np.concatenate([extra, np.zeros(pad, np.int32)])
    if orient is not None:
        orient = np.concatenate([orient, np.zeros(pad, np.float32)])
    return src, dst, extra, orient, mask


def pack_complexes(complexes: Sequence[Complex], max_dim: int,
                   plan: Optional[PadPlan] = None,
                   pad_multiple: int = 128,
                   x_dtype=np.float32,
                   keep_top_upper: bool = False) -> ComplexBatch:
    """Concatenate + offset + sort + pad a list of complexes into a ComplexBatch."""
    b = len(complexes)
    if plan is None:
        plan = PadPlan.for_complexes(complexes, max_dim, pad_multiple=pad_multiple)
    assert plan.batch_size >= b

    # Per-dim accumulators.
    xs: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    ys: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    batch_vec: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    ups: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]       # [src,dst]
    up_cobs: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    up_orients: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    downs: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    down_shareds: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    down_orients: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    bnds: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]      # [src(k-1),dst(k)]
    offsets = [0] * (max_dim + 1)

    feat_dims = [None] * (max_dim + 1)
    any_up_orient = [False] * (max_dim + 1)
    any_down_orient = [False] * (max_dim + 1)
    any_cell_y = [False] * (max_dim + 1)
    any_sel = [False] * (max_dim + 1)
    sels: List[List[np.ndarray]] = [[] for _ in range(max_dim + 1)]
    for c in complexes:
        for k in range(max_dim + 1):
            co = c.cochains.get(k)
            if co is None:
                continue
            if co.x is not None:
                feat_dims[k] = int(co.x.shape[1]) if feat_dims[k] is None \
                    else feat_dims[k]
            if co.upper_orient is not None:
                any_up_orient[k] = True
            if co.lower_orient is not None:
                any_down_orient[k] = True
            if co.y is not None:
                any_cell_y[k] = True
            if co.mask is not None:
                any_sel[k] = True

    complex_ys = []
    for ci, c in enumerate(complexes):
        if c.y is not None:
            complex_ys.append(np.asarray(c.y).reshape(-1))
        # Snapshot the offsets at complex entry: every dim of this complex is
        # offset by the cell counts of *previous* complexes only.
        base = list(offsets)
        for k in range(max_dim + 1):
            co = c.cochains.get(k)
            if co is None:
                continue
            n = co.num_cells or 0
            off = base[k]
            off_dn = base[k - 1] if k > 0 else 0
            off_up = base[k + 1] if k < max_dim else 0
            if co.x is not None:
                xs[k].append(np.asarray(co.x, dtype=x_dtype))
            elif feat_dims[k] is not None and n > 0:
                xs[k].append(np.zeros((n, feat_dims[k]), dtype=x_dtype))
            if any_cell_y[k] and co.y is not None:
                ys[k].append(np.asarray(co.y).reshape(-1))
            if any_sel[k]:
                sels[k].append(
                    co.mask.astype(np.float32) if co.mask is not None
                    else np.zeros(n, np.float32))
            batch_vec[k].append(np.full(n, ci, dtype=np.int32))

            # Upper adjacency at the top dim is dropped by default: its shared
            # coboundaries live in dim max_dim+1, which is not packed.  This
            # mirrors the reference batching, where cochains above max_dim are
            # discarded and `(dim+1) in cochains` fails in get_cochain_params
            # (/root/reference/data/complex.py:575, 690-728).  `keep_top_upper`
            # retains them with zeroed coboundary pointers — the oriented
            # trajectory models need top-dim upper edges but only consume
            # per-edge orientations, never coboundary features.
            if co.upper_index is not None and (k < max_dim or keep_top_upper):
                ups[k].append(co.upper_index + off)
                if k < max_dim:
                    up_cobs[k].append(co.shared_coboundaries + off_up)
                else:
                    up_cobs[k].append(np.zeros(co.num_upper_edges, np.int64))
                if co.upper_orient is not None:
                    up_orients[k].append(co.upper_orient)
            if co.lower_index is not None:
                downs[k].append(co.lower_index + off)
                down_shareds[k].append(co.shared_boundaries + off_dn)
                if co.lower_orient is not None:
                    down_orients[k].append(co.lower_orient)
            if co.boundary_index is not None:
                bi = co.boundary_index.copy()
                bi[0] += off_dn
                bi[1] += off
                bnds[k].append(bi)
            offsets[k] += n

    dims = []
    for k in range(max_dim + 1):
        n_pad = plan.num_cells[k]
        n = offsets[k]
        assert n <= n_pad, f"dim {k}: {n} cells > plan {n_pad}"
        trash = n_pad - 1

        f = feat_dims[k]
        if f is not None:
            x_cat = (np.concatenate(xs[k], axis=0) if xs[k]
                     else np.zeros((0, f), dtype=x_dtype))
            x = np.zeros((n_pad, f), dtype=x_dtype)
            x[:n] = x_cat
        else:
            x = None

        cell_mask = np.zeros(n_pad, np.float32)
        cell_mask[:n] = 1.0
        bvec = np.full(n_pad, plan.batch_size, np.int32)
        if n:
            bvec[:n] = np.concatenate(batch_vec[k])

        up = (np.concatenate(ups[k], axis=1) if ups[k]
              else np.zeros((2, 0), np.int64))
        cob = (np.concatenate(up_cobs[k]) if up_cobs[k] else np.zeros(0, np.int64))
        uo = (np.concatenate(up_orients[k]) if up_orients[k] else None) \
            if any_up_orient[k] else None
        up_src, up_dst, up_cob, up_orient, up_mask = _pad_edges(
            up[0], up[1], cob, uo, plan.num_up[k], trash, trash)

        dn = (np.concatenate(downs[k], axis=1) if downs[k]
              else np.zeros((2, 0), np.int64))
        shd = (np.concatenate(down_shareds[k]) if down_shareds[k]
               else np.zeros(0, np.int64))
        do = (np.concatenate(down_orients[k]) if down_orients[k] else None) \
            if any_down_orient[k] else None
        down_src, down_dst, down_shared, down_orient, down_mask = _pad_edges(
            dn[0], dn[1], shd, do, plan.num_down[k], trash, trash)

        bd = (np.concatenate(bnds[k], axis=1) if bnds[k]
              else np.zeros((2, 0), np.int64))
        src_trash = (plan.num_cells[k - 1] - 1) if k > 0 else 0
        b_src, b_dst, _, _, b_mask = _pad_edges(
            bd[0], bd[1], None, None, plan.num_boundary[k], trash, src_trash)

        ycells = None
        if any_cell_y[k] and ys[k]:
            y_cat = np.concatenate(ys[k])
            ycells = np.zeros(n_pad, dtype=y_cat.dtype)
            ycells[:len(y_cat)] = y_cat

        sel = None
        if any_sel[k] and sels[k]:
            s_cat = np.concatenate(sels[k])
            sel = np.zeros(n_pad, np.float32)
            sel[:len(s_cat)] = s_cat

        dims.append(CochainBuffers(
            x=x, cell_mask=cell_mask, batch=bvec,
            up_src=up_src, up_dst=up_dst, up_cob=up_cob, up_mask=up_mask,
            down_src=down_src, down_dst=down_dst, down_shared=down_shared,
            down_mask=down_mask,
            b_src=b_src, b_dst=b_dst, b_mask=b_mask,
            up_orient=up_orient, down_orient=down_orient, y=ycells,
            sel_mask=sel))

    # Factorized-up membership arrays: dim k+1's boundary list re-sorted by
    # member cell (see CochainBuffers.fac_* docstring).  Stable sort keeps
    # the all-masked padding slots (src = trash) at the tail.
    for k in range(max_dim):
        nxt = dims[k + 1]
        if nxt.b_src.shape[0] == 0:
            continue
        order = np.argsort(nxt.b_src, kind="stable")
        dims[k] = dataclasses.replace(
            dims[k], fac_src=nxt.b_src[order], fac_cob=nxt.b_dst[order],
            fac_mask=nxt.b_mask[order])

    # Complex-level labels.
    y = None
    y_mask = np.zeros(plan.batch_size, np.float32)
    y_mask[:b] = 1.0
    if complex_ys:
        assert len(complex_ys) == b, "all or no complexes must have labels"
        y_cat = np.stack([np.asarray(v) for v in complex_ys])
        if y_cat.shape[1] == 1:
            y_cat = y_cat[:, 0]
        pad_shape = (plan.batch_size,) + y_cat.shape[1:]
        y = np.zeros(pad_shape, dtype=y_cat.dtype)
        y[:b] = y_cat

    return ComplexBatch(dims=tuple(dims), y=y, y_mask=y_mask,
                        batch_size=plan.batch_size, max_dim=max_dim)


def add_tile_plans(batch: ComplexBatch, tile: int = 256, window: int = 256,
                   block: int = 256,
                   precision: str = "high",
                   feat_hint: int = 128,
                   auto_geometry: bool = True,
                   banded: bool = True,
                   combine: bool = False) -> ComplexBatch:
    """Attach Pallas SpMM tile plans (forward + transpose) to every
    adjacency of the batch.  Orientation weights, when present, are folded
    into the plan weights (message = orient * x_src).

    precision: bf16 MXU passes for the kernels' value operand —
    "default" (1 pass, XLA's f32-matmul default on TPU), "high"
    (2 passes, ~2^-17 relative error; the framework default), or
    "exact"/"highest" (3 passes, full f32 accuracy for parity tests).

    feat_hint: expected feature width; adjacencies whose source + output
    arrays fit VMEM at this width get the faster windowed-scatter kernel
    (output fully VMEM-resident), larger ones the block-grid kernel.

    auto_geometry=False pins the block-grid kernel geometry to the given
    tile/window/block instead of the data-driven occupancy search — plan
    STATIC shapes then depend only on the PadPlan + argument geometry
    (tile counts still vary with data; see add_tile_plans_sharded).

    combine=True additionally builds launch-consolidated plans (one
    windowed kernel for fac_g+fac_o, one for all dims' readout pooling,
    one for all dims' boundary channels, via concat_window_plans) — the
    models use them automatically when present.  Off by default: measured
    on the ZINC bench step the wall-time effect is inside the HBM
    placement lottery (PERF.md round 5), so the extra plans buy nothing
    reliable there; the machinery is kept for launch-latency-bound
    environments."""
    from cwn_tpu.ops.tiles import (PRECISION_PASSES, build_tile_plan_auto,
                                   build_window_plan, concat_window_plans)
    from cwn_tpu.ops import tiles as _tiles

    passes = PRECISION_PASSES[precision]
    # VMEM budget for windowed mode: sources + extras + output resident.
    vmem_rows = (10 * 1024 * 1024) // (4 * max(feat_hint, 1))

    def build_tile_plan(src, dst, w, n_src, n_dst, extra=None,
                        num_extra=0, **kw):
        if n_src + num_extra + n_dst <= vmem_rows:
            return build_window_plan(src, dst, w, n_src, n_dst, extra=extra,
                                     num_extra=num_extra, **kw)
        if auto_geometry:
            return build_tile_plan_auto(src, dst, w, n_src, n_dst,
                                        extra=extra, num_extra=num_extra,
                                        **kw)
        return _tiles.build_tile_plan(src, dst, w, n_src, n_dst, extra=extra,
                                      num_extra=num_extra, **kw)

    new_dims = []
    for k, d in enumerate(batch.dims):
        n_k = d.cell_mask.shape[0]
        n_dn = batch.dims[k - 1].cell_mask.shape[0] if k > 0 else 0
        n_up = (batch.dims[k + 1].cell_mask.shape[0]
                if k + 1 < len(batch.dims) else 0)
        # Shared-cell (attr) streams and the fused-message backward plans
        # only matter when the neighbour dim has actual cells with
        # features; a padded-but-empty neighbour (e.g. FLOW's vertex dim)
        # can never feed a fused channel, and skipping its extra stream
        # removes the planner's range-table work on the big channels.
        dn_valid = (n_dn > 0
                    and float(batch.dims[k - 1].cell_mask.sum()) > 0)
        up_valid = (n_up > 0
                    and float(batch.dims[k + 1].cell_mask.sum()) > 0)

        def plans(src, dst, mask, orient, n_src, n_dst,
                  shared=None, n_shared=0):
            """Identity fwd/transpose plans + (when `shared` is given) the
            two fused-message backward plans (sorted by src / by shared)."""
            w = mask if orient is None else mask * orient
            kw = dict(tile=tile, window=window, block=block, passes=passes)
            if shared is None and banded and feat_hint >= 256:
                # Identity channels over arena-ordered structures (each
                # complex's cells contiguous) are near-banded: prefer the
                # dense-tile kernel (cwn_tpu.ops.banded), fall back to the
                # one-hot tiles when scattered or weights inexact.
                # feat_hint gate: dense A-tiles only beat the one-hot
                # formulation when the value operand is wide (measured: a
                # regression at F=48 — DMA-latency-bound 49 KB windows and
                # a half-empty MXU; a ~10x win at F=4096 flattened
                # uniform widths, which add_uniform_tile_plans handles).
                from cwn_tpu.ops.banded import build_banded_plan
                bkw = dict(block=128, window=min(window, 256),
                           passes=passes)
                bf = build_banded_plan(src, dst, w, n_src, n_dst, **bkw)
                bb = build_banded_plan(dst, src, w, n_dst, n_src, **bkw)
                if bf is not None and bb is not None:
                    return bf, bb, None, None
            fwd = build_tile_plan(src, dst, w, n_src, n_dst,
                                  extra=shared, num_extra=n_shared, **kw)
            bwd = build_tile_plan(dst, src, w, n_dst, n_src, **kw)
            if shared is None:
                return fwd, bwd, None, None
            bs = build_tile_plan(dst, src, w, n_dst, n_src,
                                 extra=shared, num_extra=n_shared, **kw)
            bc = build_tile_plan(dst, shared, w, n_dst, n_shared,
                                 extra=src, num_extra=n_src, **kw)
            return fwd, bwd, bs, bc

        up_p = up_pt = up_bs = up_bc = None
        down_p = down_pt = down_bs = down_bc = None
        b_p = b_pt = pool_p = pool_pt = None
        if d.up_src.shape[0] > 0:
            up_p, up_pt, up_bs, up_bc = plans(
                d.up_src, d.up_dst, d.up_mask, d.up_orient, n_k, n_k,
                shared=(d.up_cob if up_valid else None), n_shared=n_up)
        if d.down_src.shape[0] > 0:
            down_p, down_pt, down_bs, down_bc = plans(
                d.down_src, d.down_dst, d.down_mask, d.down_orient, n_k, n_k,
                shared=(d.down_shared if dn_valid else None), n_shared=n_dn)
        if k > 0 and d.b_src.shape[0] > 0:
            b_p, b_pt, _, _ = plans(d.b_src, d.b_dst, d.b_mask, None,
                                    n_dn, n_k)
        if batch.batch_size > 1:
            cells = np.arange(n_k, dtype=np.int64)
            pool_p, pool_pt, _, _ = plans(cells, d.batch, d.cell_mask, None,
                                          n_k, batch.batch_size)

        # Factorized-channel reduction plans: one scatter per direction
        # over the membership list (dim k+1's boundary structure), so the
        # O(memberships) channel rides the MXU kernels instead of XLA
        # scatter fusions.  The membership-row "gathers" use positions as
        # the src stream — ascending, so the windowed plans tile at full
        # occupancy.
        fs = fst = fo = fot = fg = fgt = None
        if d.fac_src is not None and up_valid:
            nxt = batch.dims[k + 1]
            m = d.fac_src.shape[0]
            pos = np.arange(m, dtype=np.int64)
            fs, fst, _, _ = plans(pos, nxt.b_dst, nxt.b_mask, None, m, n_up)
            fo, fot, _, _ = plans(pos, d.fac_src, d.fac_mask, None, m, n_k)
            fg, fgt, _, _ = plans(d.fac_cob, d.fac_src, d.fac_mask, None,
                                  n_up, n_k)

        # Launch consolidation: fac_g + fac_o share the dst cell space —
        # one kernel over the concatenated source arena [S_c ; own]
        # produces both reductions in adjacent output sections
        # (out_up = sec0 - sec1; see mp.factorized_up_channel_kernel).
        fgo = fgo_t = fgo_split = None
        if combine and fg is not None and fo is not None:
            fgo = concat_window_plans([fg, fo], [0, fg.num_src],
                                      [0, fg.num_dst])
            if fgo is not None and fgo.num_src + fgo.num_dst <= vmem_rows:
                # Transpose arena = the forward's, with roles swapped.
                fgo_t = concat_window_plans([fgt, fot], [0, fg.num_dst],
                                            [0, fg.num_src])
            if fgo is None or fgo_t is None:
                fgo = fgo_t = None
            else:
                fgo_split = (fg.num_src, fg.num_dst)

        new_dims.append(d.replace(
            up_plan=up_p, up_plan_t=up_pt,
            up_plan_bs=up_bs, up_plan_bc=up_bc,
            down_plan=down_p, down_plan_t=down_pt,
            down_plan_bs=down_bs, down_plan_bc=down_bc,
            b_plan=b_p, b_plan_t=b_pt,
            pool_plan=pool_p, pool_plan_t=pool_pt,
            fac_s_plan=fs, fac_s_plan_t=fst,
            fac_o_plan=fo, fac_o_plan_t=fot,
            fac_g_plan=fg, fac_g_plan_t=fgt,
            fac_go_plan=fgo, fac_go_plan_t=fgo_t, fac_go_split=fgo_split))

    # Launch consolidation: every dim's readout pooling as ONE kernel over
    # the concatenated cell arenas (used by nn.pool_cells_all; per-dim
    # plans remain as the fallback and for sharded harmonization).
    def combine_plans(ps, pts):
        """One plan over concatenated arenas, or (None,)*4 when ungateable."""
        so = [0]
        do = [0]
        for p in ps:
            so.append(so[-1] + p.num_src)
            do.append(do[-1] + p.num_dst)
        pa = concat_window_plans(ps, so[:-1], do[:-1])
        if pa is None or pa.num_src + pa.num_dst > vmem_rows:
            return None, None, None, None
        pat = concat_window_plans(pts, do[:-1], so[:-1])
        if pat is None:
            return None, None, None, None
        return pa, pat, tuple(so), tuple(do)

    pool_all = pool_all_t = None
    src_off = dst_off = None
    pool_ps = [d.pool_plan for d in new_dims]
    if combine and pool_ps and all(p is not None for p in pool_ps):
        pool_all, pool_all_t, src_off, dst_off = combine_plans(
            pool_ps, [d.pool_plan_t for d in new_dims])

    b_all = b_all_t = None
    b_dims = b_so = b_do = None
    bd = [k for k in range(1, len(new_dims))
          if new_dims[k].b_plan is not None]
    if combine and bd:
        b_all, b_all_t, b_so, b_do = combine_plans(
            [new_dims[k].b_plan for k in bd],
            [new_dims[k].b_plan_t for k in bd])
        b_dims = tuple(bd) if b_all is not None else None

    return batch.replace(dims=tuple(new_dims),
                         pool_all_plan=pool_all, pool_all_plan_t=pool_all_t,
                         pool_all_src_off=src_off, pool_all_dst_off=dst_off,
                         b_all_plan=b_all, b_all_plan_t=b_all_t,
                         b_all_dims=b_dims, b_all_src_off=b_so,
                         b_all_dst_off=b_do)


def add_uniform_tile_plans(batch: ComplexBatch, template: Complex,
                           count: int, precision: str = "high",
                           feat_hint: int = 64,
                           vmem_budget: int = 2 * 1024 * 1024) -> ComplexBatch:
    """Attach shared-structure tile plans for a batch of `count` complexes
    that ALL share `template`'s structure (see CochainBuffers.uni_*).

    The kernels run on features reshaped to [n_struct, count * F], so the
    plan geometry (window/block) is sized for that width: each DMA'd x
    window / output block must fit the VMEM budget at count*feat_hint
    lanes.  One plan per channel + its transpose (for the custom VJP).

    Channels whose structure is banded in cell order and whose weights are
    exact in bf16 (+-1 orientations, 0/1 masks — all of them in practice)
    get a BandedPlan (cwn_tpu.ops.banded): one dense A_tile @ x_window
    matmul per tile instead of per-edge one-hot mediation — measured
    ~10x less device time on the FLOW uniform step, where one-hot
    structural FLOPs at 4096 lanes were 67% of the step.  Scattered or
    inexact-weight channels keep the one-hot TilePlan."""
    from cwn_tpu.ops.banded import build_banded_plan
    from cwn_tpu.ops.tiles import PRECISION_PASSES, build_tile_plan

    passes = PRECISION_PASSES[precision]
    width = max(count * feat_hint, 128)
    width_pad = ((width + 127) // 128) * 128
    # Scoped-VMEM sizing (16 MB limit): the x window scratch is single
    # (window * lanes * 4B) and the output block double-buffers
    # (2 * block * lanes * 4B) — keep each under ~4 MB.  Swept on a v5e at
    # 4096 lanes: (tile 256, window 256, block 128) runs the FLOW up/down
    # structure channels at ~20 us; tile 512 fails to compile.
    win_rows = max(8, (4 * 1024 * 1024 // (4 * width_pad)) // 8 * 8)
    blk_rows = max(8, (vmem_budget // (4 * width_pad)) // 8 * 8)
    geom = dict(tile=256,
                window=max(min(256, win_rows), 128),
                block=max(min(128, blk_rows), 128),
                passes=passes)

    new_dims = []
    for k, d in enumerate(batch.dims):
        co = template.cochains.get(k)
        if co is None or not (co.num_cells or 0):
            new_dims.append(d)
            continue
        n_struct = int(co.num_cells)
        n_dn = None
        if k > 0 and template.cochains.get(k - 1) is not None:
            n_dn = int(template.cochains[k - 1].num_cells or 0)

        def uplan(index, orient, n_src, n_dst):
            if index is None or index.shape[1] == 0:
                return None, None
            src = np.asarray(index[0], np.int64)
            dst = np.asarray(index[1], np.int64)
            w = np.ones(len(src), np.float32) if orient is None \
                else np.asarray(orient, np.float32)
            bgeom = dict(block=128, window=min(geom["window"], 256),
                         passes=passes)
            fwd = build_banded_plan(src, dst, w, n_src, n_dst, **bgeom)
            bwd = build_banded_plan(dst, src, w, n_dst, n_src, **bgeom)
            if fwd is None or bwd is None:
                fwd = build_tile_plan(src, dst, w, n_src, n_dst, **geom)
                bwd = build_tile_plan(dst, src, w, n_dst, n_src, **geom)
            return fwd, bwd

        up_p, up_pt = uplan(co.upper_index, co.upper_orient,
                            n_struct, n_struct)
        dn_p, dn_pt = uplan(co.lower_index, co.lower_orient,
                            n_struct, n_struct)
        b_p = b_pt = None
        if co.boundary_index is not None and n_dn:
            b_p, b_pt = uplan(co.boundary_index, None, n_dn, n_struct)
        if up_p is None and dn_p is None and b_p is None:
            new_dims.append(d)
            continue
        new_dims.append(d.replace(
            uni_up_plan=up_p, uni_up_plan_t=up_pt,
            uni_down_plan=dn_p, uni_down_plan_t=dn_pt,
            uni_b_plan=b_p, uni_b_plan_t=b_pt,
            uni_cells=n_struct, uni_count=count,
            uni_b_src_cells=n_dn if b_p is not None else None))
    return batch.replace(dims=tuple(new_dims))


PLAN_FIELDS = ("up_plan", "up_plan_t", "up_plan_bs", "up_plan_bc",
               "down_plan", "down_plan_t", "down_plan_bs", "down_plan_bc",
               "b_plan", "b_plan_t", "pool_plan", "pool_plan_t",
               "fac_s_plan", "fac_s_plan_t", "fac_o_plan", "fac_o_plan_t",
               "fac_g_plan", "fac_g_plan_t")


def _pad_plan_tiles(plan, target: int):
    """Append all-masked tiles so plan.num_tiles == target.

    Padding tiles carry mask 0 (zero contribution), window/dst starts 0
    (always in range: num_src/num_dst pad to >= window/block) and, in grid
    mode, repeat the last out block (keeps the non-decreasing invariant —
    the same trick the builders use for their own bucketing padding)."""
    t = plan.num_tiles
    if t >= target:
        assert t == target or target == 0, (t, target)
        return plan

    pad = target - t

    def tail(a, fill=0):
        if a is None:
            return None
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    out_block = tail(plan.out_block,
                     int(plan.out_block[-1]) if t else 0)
    return plan.replace(
        src_rel=tail(plan.src_rel), dst_rel=tail(plan.dst_rel),
        mask=tail(plan.mask), extra_rel=tail(plan.extra_rel),
        win_start=tail(plan.win_start), extra_start=tail(plan.extra_start),
        out_block=out_block,
        dst_start=tail(plan.dst_start))


def add_tile_plans_sharded(shards: Sequence[ComplexBatch], tile: int = 256,
                           window: int = 256, block: int = 256,
                           precision: str = "high",
                           feat_hint: int = 128) -> List[ComplexBatch]:
    """add_tile_plans over data-parallel shards with IDENTICAL plan shapes.

    Same-PadPlan shards can still plan different tile counts (tiles are a
    function of the edge distribution) and, with the occupancy autotuner,
    different geometries — either breaks stacking on a device axis.  Here
    every shard plans with pinned geometry, tile counts are padded up to
    the per-(dim, channel) maximum, and the static `empty` flag is forced
    uniform (False) so pytree structures agree; all-masked padding tiles
    contribute zeros, so per-shard results are unchanged."""
    # banded=False: _pad_plan_tiles harmonization is TilePlan-specific and
    # per-shard banded tile counts would differ anyway.
    # combine=False: combined plans are per-shard tile-count-dependent and
    # would break the cross-shard pytree harmonization below.
    planned = [add_tile_plans(s, tile=tile, window=window, block=block,
                              precision=precision, feat_hint=feat_hint,
                              auto_geometry=False, banded=False,
                              combine=False)
               for s in shards]
    if len(planned) <= 1:
        return planned

    n_dims = len(planned[0].dims)
    targets = {}
    for k in range(n_dims):
        for f in PLAN_FIELDS:
            plans = [getattr(p.dims[k], f) for p in planned]
            have = [pl for pl in plans if pl is not None]
            # Plan presence is shape-determined, so all-or-none per slot.
            assert len(have) in (0, len(plans)), (k, f)
            if have:
                targets[(k, f)] = max(pl.num_tiles for pl in have)

    out = []
    for p in planned:
        dims = []
        for k, d in enumerate(p.dims):
            repl = {}
            for f in PLAN_FIELDS:
                pl = getattr(d, f)
                if pl is not None:
                    repl[f] = _pad_plan_tiles(
                        pl, targets[(k, f)]).replace(empty=False)
            dims.append(d.replace(**repl) if repl else d)
        out.append(p.replace(dims=tuple(dims)))
    return out
