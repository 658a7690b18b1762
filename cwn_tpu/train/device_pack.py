"""Device-side batch assembly from a staged per-complex bank.

The TPU answer to the reference's per-batch host collation
(/root/reference/data/data_loading.py:44-110): instead of packing every
shuffled batch on the host and shipping ~1.5 MB of indices per batch
through a slow host->device link, the WHOLE dataset's per-complex
buffers (cells, features, local adjacency lists, labels) are staged on
device once, and each training batch is assembled ON DEVICE by gathering
the permuted complexes' rows and offsetting their local cell ids — all
inside the jitted train step, so the per-epoch host->device traffic is
one small index matrix.

The assembled batch is BIT-IDENTICAL to `pack_complexes` run host-side
with the same plan (tests/test_epoch_scan.py): per-complex edge lists
are stored stably dst-sorted, so concatenation with ascending cell
offsets reproduces the packer's global stable dst-sort; padding follows
the packer's trash conventions (padded dst/src -> last cell of the
dest/source dim, shared pointers -> 0, pad cells -> batch id B).

Performance notes (TPU): each edge channel's streams (src, dst, shared
pointer, orientation) are fused into ONE [E, 4] int32 arena so a channel
costs a single wide row-gather instead of four narrow ones, and the
slot->complex placement uses a dense compare-and-sum instead of
jnp.searchsorted (whose binary-search lowering is a sequential scan of
tiny ops — 5x slower end to end, measured on the ZINC batch).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from flax import struct

from cwn_tpu.batch import ComplexBatch, CochainBuffers, PadPlan
from cwn_tpu.complex import Complex


@struct.dataclass
class DimBank:
    """Concatenated per-complex buffers for one cochain dimension.

    Edge arenas hold LOCAL (per-complex) ids, stably dst-sorted, with
    columns (src, dst, extra, orient-as-int32-bits):
      up:   extra = shared coboundary (dim k+1 local id; 0 at top dim)
      down: extra = shared boundary   (dim k-1 local id)
      b:    columns (src, dst) only — src is a dim k-1 local id
    """

    cell_len: np.ndarray               # [C] int32
    cell_off: np.ndarray               # [C] int32 (prefix into cell arena)
    x: Optional[np.ndarray]            # [sum_n, F] or None
    y: Optional[np.ndarray]            # [sum_n] per-cell labels
    sel: Optional[np.ndarray]          # [sum_n] float32
    up_len: np.ndarray                 # [C] int32
    up_off: np.ndarray
    up_cols: np.ndarray                # [sum_e, 4] int32
    down_len: np.ndarray
    down_off: np.ndarray
    down_cols: np.ndarray              # [sum_e, 4] int32
    b_len: np.ndarray
    b_off: np.ndarray
    b_cols: np.ndarray                 # [sum_e, 2] int32
    # Factorized-up memberships: dim k+1's boundary list stably re-sorted
    # by member (src) — columns (member cell in dim k, coboundary in dim
    # k+1), local ids (see CochainBuffers.fac_*).
    fac_len: Optional[np.ndarray] = None
    fac_off: Optional[np.ndarray] = None
    fac_cols: Optional[np.ndarray] = None   # [sum_e, 2] int32
    has_up_orient: bool = struct.field(pytree_node=False, default=False)
    has_down_orient: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class ComplexBank:
    dims: Tuple[DimBank, ...]
    y: Optional[np.ndarray]            # [C, L] complex labels
    y_squeeze: bool = struct.field(pytree_node=False, default=False)
    num_complexes: int = struct.field(pytree_node=False, default=0)
    max_dim: int = struct.field(pytree_node=False, default=0)


def _lens_offs(lens: List[int]):
    lens = np.asarray(lens, np.int32)
    offs = np.concatenate([[0], np.cumsum(lens[:-1], dtype=np.int64)]) \
        .astype(np.int32) if len(lens) else np.zeros(0, np.int32)
    return lens, offs


def _sorted_cols(src, dst, extra, orient, ncols: int):
    """Stable dst-sort of a local edge list into an [e, ncols] int32 block
    (the packer's _pad_edges order); orient is stored as f32 bit pattern."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    order = np.argsort(dst, kind="stable") if len(dst) else np.arange(0)
    out = np.zeros((len(dst), ncols), np.int32)
    out[:, 0] = src[order]
    out[:, 1] = dst[order]
    if ncols > 2 and extra is not None:
        out[:, 2] = np.asarray(extra, np.int32)[order]
    if ncols > 3 and orient is not None:
        out[:, 3] = np.asarray(orient, np.float32)[order].view(np.int32)
    return out


def build_bank(complexes: Sequence[Complex], max_dim: int,
               x_dtype=np.float32, keep_top_upper: bool = False
               ) -> ComplexBank:
    """Host-side, one-time: per-complex buffers -> concatenated arenas.

    Mirrors pack_complexes' per-complex semantics (feature zero-fill for
    complexes missing x in a dim others have, top-dim upper handling,
    stable dst-sort); raises ValueError on shapes it cannot bank (mixed
    complex-label presence, ragged label widths)."""
    C = len(complexes)
    feat_dims = [None] * (max_dim + 1)
    any_up_orient = [False] * (max_dim + 1)
    any_down_orient = [False] * (max_dim + 1)
    any_cell_y = [False] * (max_dim + 1)
    any_sel = [False] * (max_dim + 1)
    for c in complexes:
        for k in range(max_dim + 1):
            co = c.cochains.get(k)
            if co is None:
                continue
            if co.x is not None and feat_dims[k] is None:
                feat_dims[k] = int(co.x.shape[1])
            any_up_orient[k] |= co.upper_orient is not None
            any_down_orient[k] |= co.lower_orient is not None
            any_cell_y[k] |= co.y is not None
            any_sel[k] |= co.mask is not None

    dims = []
    for k in range(max_dim + 1):
        cl, xs, ys, sels = [], [], [], []
        ul, ublocks = [], []
        dl, dblocks = [], []
        bl, bblocks = [], []
        fl, fblocks = [], []
        for c in complexes:
            co = c.cochains.get(k)
            n = int(co.num_cells or 0) if co is not None else 0
            cl.append(n)
            if feat_dims[k] is not None:
                if co is not None and co.x is not None:
                    xs.append(np.asarray(co.x, x_dtype))
                else:
                    xs.append(np.zeros((n, feat_dims[k]), x_dtype))
            if any_cell_y[k]:
                if co is not None and co.y is not None:
                    ys.append(np.asarray(co.y).reshape(-1))
                else:
                    ys.append(np.zeros(n, np.int32))
            if any_sel[k]:
                sels.append(np.asarray(co.mask, np.float32).reshape(-1)
                            if co is not None and co.mask is not None
                            else np.zeros(n, np.float32))

            if co is not None and co.upper_index is not None and \
                    (k < max_dim or keep_top_upper):
                cob = co.shared_coboundaries if k < max_dim else None
                blk = _sorted_cols(co.upper_index[0], co.upper_index[1],
                                   cob, co.upper_orient, 4)
            else:
                blk = np.zeros((0, 4), np.int32)
            ul.append(len(blk)); ublocks.append(blk)

            if co is not None and co.lower_index is not None:
                blk = _sorted_cols(co.lower_index[0], co.lower_index[1],
                                   co.shared_boundaries, co.lower_orient, 4)
            else:
                blk = np.zeros((0, 4), np.int32)
            dl.append(len(blk)); dblocks.append(blk)

            if co is not None and co.boundary_index is not None:
                blk = _sorted_cols(co.boundary_index[0],
                                   co.boundary_index[1], None, None, 2)
            else:
                blk = np.zeros((0, 2), np.int32)
            bl.append(len(blk)); bblocks.append(blk)

            # Factorized-up memberships: dim k+1's (dst-sorted) boundary
            # list re-sorted stably by member — matching pack_complexes'
            # global stable src-sort restricted to this complex.
            co_up = c.cochains.get(k + 1) if k < max_dim else None
            if co_up is not None and co_up.boundary_index is not None:
                blk = _sorted_cols(co_up.boundary_index[0],
                                   co_up.boundary_index[1], None, None, 2)
                blk = blk[np.argsort(blk[:, 0], kind="stable")]
            else:
                blk = np.zeros((0, 2), np.int32)
            fl.append(len(blk)); fblocks.append(blk)

        cell_len, cell_off = _lens_offs(cl)
        up_len, up_off = _lens_offs(ul)
        down_len, down_off = _lens_offs(dl)
        b_len, b_off = _lens_offs(bl)
        fac_len, fac_off = _lens_offs(fl)

        ycat = None
        if any_cell_y[k]:
            ycat = (np.concatenate(ys) if ys else np.zeros(0, np.int32))
        dims.append(DimBank(
            cell_len=cell_len, cell_off=cell_off,
            x=(np.concatenate(xs, axis=0) if feat_dims[k] is not None
               else None),
            y=ycat,
            sel=(np.concatenate(sels).astype(np.float32) if any_sel[k]
                 else None),
            up_len=up_len, up_off=up_off,
            up_cols=np.concatenate(ublocks, axis=0),
            down_len=down_len, down_off=down_off,
            down_cols=np.concatenate(dblocks, axis=0),
            b_len=b_len, b_off=b_off,
            b_cols=np.concatenate(bblocks, axis=0),
            fac_len=fac_len, fac_off=fac_off,
            fac_cols=np.concatenate(fblocks, axis=0),
            has_up_orient=any_up_orient[k],
            has_down_orient=any_down_orient[k]))

    y = None
    y_squeeze = False
    has_y = [c.y is not None for c in complexes]
    if any(has_y):
        if not all(has_y):
            raise ValueError("mixed complex-label presence")
        rows = [np.asarray(c.y).reshape(-1) for c in complexes]
        if len({r.shape[0] for r in rows}) > 1:
            raise ValueError("ragged complex labels")
        y = np.stack(rows)
        y_squeeze = y.shape[1] == 1
    return ComplexBank(dims=tuple(dims), y=y, y_squeeze=y_squeeze,
                       num_complexes=C, max_dim=max_dim)


# ---------------------------------------------------------------------------
# Device-side assembly (pure jnp; runs inside the jitted train step).
# ---------------------------------------------------------------------------


def _place(lens, cap):
    """Slot -> (complex position, inner offset, valid) for a concat of
    `lens[i]` rows per batch position into a `cap`-row arena."""
    import jax.numpy as jnp

    cum = jnp.cumsum(lens)
    starts = cum - lens
    j = jnp.arange(cap, dtype=jnp.int32)
    cid = (j[:, None] >= cum[None, :]).sum(axis=1).astype(jnp.int32)
    valid = j < cum[-1]
    cid_c = jnp.minimum(cid, lens.shape[0] - 1)
    inner = j - starts[cid_c]
    return cid_c, inner, valid, starts


def _gather_rows(arena, rows, valid, fill=0):
    import jax.numpy as jnp

    if arena is None:
        return None
    if arena.shape[0] == 0:        # no such rows anywhere in the bank
        return jnp.zeros((rows.shape[0],) + arena.shape[1:], arena.dtype)
    rows = jnp.clip(rows, 0, arena.shape[0] - 1)
    out = arena[rows]
    mask = valid if out.ndim == 1 else valid[:, None]
    return jnp.where(mask, out, jnp.asarray(fill, out.dtype))


def assemble_batch(bank: ComplexBank, plan: PadPlan, idx, count):
    """Gather complexes `idx[:count]` from the bank into a ComplexBatch of
    shape `plan` (idx int32 [B_cap], rows past `count` ignored)."""
    import jax.numpy as jnp

    B = int(idx.shape[0])
    slot_valid = jnp.arange(B, dtype=jnp.int32) < count
    idx = jnp.where(slot_valid, idx, 0)
    max_dim = bank.max_dim

    # First pass: cell placements per dim (edge remaps need neighbors').
    placements = []
    cell_starts = []
    for k in range(max_dim + 1):
        db = bank.dims[k]
        lens = jnp.where(slot_valid, db.cell_len[idx], 0)
        placements.append(_place(lens, plan.num_cells[k]))
        cell_starts.append(placements[-1][3])       # starts [B]

    dims_out = []
    for k in range(max_dim + 1):
        db = bank.dims[k]
        cid, inner, valid, starts = placements[k]
        rows = db.cell_off[idx[cid]] + inner
        x = _gather_rows(db.x, rows, valid)
        ycells = _gather_rows(db.y, rows, valid)
        sel = _gather_rows(db.sel, rows, valid)
        cell_mask = valid.astype(jnp.float32)
        bvec = jnp.where(valid, cid, plan.batch_size).astype(jnp.int32)

        trash = plan.num_cells[k] - 1

        def edges(elen, eoff, ecols, cap, extra_starts, src_trash,
                  dst_trash, want_orient, src_starts=None, dst_starts=None):
            import jax

            elens = jnp.where(slot_valid, elen[idx], 0)
            ecid, einner, evalid, _ = _place(elens, cap)
            erows = eoff[idx[ecid]] + einner
            cols = _gather_rows(ecols, erows, evalid)      # [cap, 2 or 4]
            off_dst = starts[ecid] if dst_starts is None else dst_starts[ecid]
            off_src = off_dst if src_starts is None else src_starts[ecid]
            src = cols[:, 0] + jnp.where(evalid, off_src, src_trash)
            dst = cols[:, 1] + jnp.where(evalid, off_dst, dst_trash)
            if cols.shape[1] == 2:
                return (src.astype(jnp.int32), dst.astype(jnp.int32),
                        None, None, evalid.astype(jnp.float32))
            extra = cols[:, 2]
            if extra_starts is not None:
                extra = extra + jnp.where(evalid, extra_starts[ecid], 0)
            orient = jax.lax.bitcast_convert_type(cols[:, 3], jnp.float32) \
                if want_orient else None
            return (src.astype(jnp.int32), dst.astype(jnp.int32),
                    extra.astype(jnp.int32), orient,
                    evalid.astype(jnp.float32))

        # Upper: src/dst in dim k, cob in dim k+1 (zeros at top dim).
        up_src, up_dst, up_cob, up_orient, up_mask = edges(
            db.up_len, db.up_off, db.up_cols, plan.num_up[k],
            cell_starts[k + 1] if k < max_dim else None, trash, trash,
            db.has_up_orient)
        down_src, down_dst, down_shared, down_orient, down_mask = edges(
            db.down_len, db.down_off, db.down_cols, plan.num_down[k],
            cell_starts[k - 1] if k > 0 else None, trash, trash,
            db.has_down_orient)
        # Boundary: src lives in dim k-1 (no extra/orient columns).
        src_trash_b = (plan.num_cells[k - 1] - 1) if k > 0 else 0
        b_src, b_dst, _, _, b_mask = edges(
            db.b_len, db.b_off, db.b_cols, plan.num_boundary[k],
            None, src_trash_b, trash, False,
            src_starts=cell_starts[k - 1] if k > 0 else
            jnp.zeros_like(cell_starts[k]))

        # Factorized-up memberships: src in dim k, coboundary in dim k+1
        # (the packer's post-pass sort, reproduced by concatenating the
        # per-complex member-sorted lists with ascending offsets).
        fac_src = fac_cob = fac_mask = None
        if k < max_dim and db.fac_cols is not None \
                and plan.num_boundary[k + 1] > 0:
            fac_src, fac_cob, _, _, fac_mask = edges(
                db.fac_len, db.fac_off, db.fac_cols,
                plan.num_boundary[k + 1], None, trash,
                plan.num_cells[k + 1] - 1, False,
                src_starts=cell_starts[k], dst_starts=cell_starts[k + 1])

        dims_out.append(CochainBuffers(
            x=x, cell_mask=cell_mask, batch=bvec,
            up_src=up_src, up_dst=up_dst, up_cob=up_cob, up_mask=up_mask,
            down_src=down_src, down_dst=down_dst,
            down_shared=down_shared, down_mask=down_mask,
            b_src=b_src, b_dst=b_dst, b_mask=b_mask,
            up_orient=up_orient, down_orient=down_orient,
            y=ycells, sel_mask=sel,
            fac_src=fac_src, fac_cob=fac_cob, fac_mask=fac_mask))

    y = None
    if bank.y is not None:
        vals = bank.y[idx]
        if bank.y_squeeze:
            vals = vals[:, 0]
        mask = slot_valid if vals.ndim == 1 else slot_valid[:, None]
        y = jnp.where(mask, vals, jnp.asarray(0, vals.dtype))
        if plan.batch_size > B:
            pad = [(0, plan.batch_size - B)] + [(0, 0)] * (vals.ndim - 1)
            y = jnp.pad(y, pad)
    y_mask = (jnp.arange(plan.batch_size, dtype=jnp.int32) < count) \
        .astype(jnp.float32)
    return ComplexBatch(dims=tuple(dims_out), y=y, y_mask=y_mask,
                        batch_size=plan.batch_size, max_dim=max_dim)
