"""Host-side tile planning for the Pallas segment-SpMM kernel.

The kernel turns gather->segment-sum into two MXU matmuls per edge tile:

    msg  = onehot(src - win_start) @ x[win_start : win_start+W]   [T,W]@[W,F]
    out += onehot_dst(dst - block*B)^T-style matmul               [B,T]@[T,F]

For that to work each tile must satisfy, by construction here:
  1. all src ids lie in an arbitrary window [win_start, win_start + W)
     (x windows are DMA'd with dynamic offsets, no alignment needed);
  2. all dst ids lie in ONE aligned output block [b*B, (b+1)*B)
     (output blocks live on a regular grid so Pallas can map them);
  3. tile out-block ids are non-decreasing, and EVERY output block is
     visited at least once (empty blocks get all-padding tiles), so the
     kernel can zero each block on first visit and accumulate.

num_tiles is padded to a bucket size so jit compiles O(log) shapes.

Planning is one lexsort plus fully vectorised per-start tile limits (a
global searchsorted for the src window; binary-doubling range tables for
the unordered extra stream) followed by an O(num_tiles) greedy chain —
the only Python loop left, a few array lookups per emitted tile.
Within each dst segment the
edges are re-sorted by src so the src window of a growing tile is just
[src[i], src[j-1]] — intra-tile edge order is irrelevant to the kernel
(one-hot matmuls accumulate), inter-tile block order is preserved.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
from flax import struct


@struct.dataclass
class TilePlan:
    """Device arrays + static geometry for one adjacency's tiles."""

    src_rel: np.ndarray    # [tiles, 1, T] int32, src - win_start[tile]
    dst_rel: np.ndarray    # [tiles, 1, T] int32, dst - block*out_block[tile]
    mask: np.ndarray       # [tiles, 1, T] float32
    extra_rel: Optional[np.ndarray]  # [tiles, 1, T] int32 (2nd gather stream)
    win_start: np.ndarray  # [tiles] int32
    extra_start: Optional[np.ndarray]  # [tiles] int32
    out_block: np.ndarray  # [tiles] int32 (block ids, non-decreasing)
    tile: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    num_src: int = struct.field(pytree_node=False)   # x rows (padded, >= window)
    num_extra: int = struct.field(pytree_node=False)
    num_dst: int = struct.field(pytree_node=False)   # out rows (multiple of block)
    # bf16 MXU passes for the value operand: 1 = bf16-rounded values (XLA's
    # default f32-matmul precision on TPU), 2 = ~2^-17 relative error,
    # 3 = full f32 accuracy (Precision.HIGHEST equivalent).  Static so it
    # participates in jit cache keys.
    passes: int = struct.field(pytree_node=False, default=2)
    # True when the adjacency has no valid edges at all: callers skip the
    # kernel launch and emit zeros (static, known at pack time).
    empty: bool = struct.field(pytree_node=False, default=False)
    # Windowed-scatter mode (dst_start is not None): the whole output stays
    # VMEM-resident for the kernel's duration and each tile scatters into a
    # dynamic `block`-row window at dst_start[tile] (8-aligned) — no aligned
    # out-block constraint, no per-tile output DMA.  `supertile` consecutive
    # tiles share one grid step to amortise fixed per-step overhead.
    dst_start: Optional[np.ndarray] = None   # [tiles] int32
    supertile: int = struct.field(pytree_node=False, default=1)

    @property
    def num_tiles(self) -> int:
        return int(self.win_start.shape[0])


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pow2_round(n: int, minimum: int = 1) -> int:
    n = max(n, minimum)
    return 1 << int(np.ceil(np.log2(n)))


PRECISION_PASSES = {"default": 1, "high": 2, "exact": 3, "highest": 3}


def _sorted_valid(src, dst, mask, extra):
    """Drop masked-out edges and sort by dst (stable)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    mask = np.asarray(mask, np.float32)
    extra = None if extra is None else np.asarray(extra, np.int64)
    valid = mask != 0          # weights may be signed (orientations)
    order = np.argsort(dst, kind="stable")
    order = order[valid[order]]
    return (src[order], dst[order], mask[order],
            extra[order] if extra is not None else None)


def _build_range_tables(extra, levels: int):
    """Sparse range-min/max tables: tbl[l][i] = min/max(extra[i : i+2^l]).
    Entries at i with i + 2^l > n are invalid and must not be consumed."""
    tmin = [extra.astype(np.int32)]
    tmax = [extra.astype(np.int32)]
    for l in range(1, levels + 1):
        h = 1 << (l - 1)
        lo = tmin[-1]
        hi = tmax[-1]
        tmin.append(np.minimum(lo, np.r_[lo[h:], lo[-h:]]))
        tmax.append(np.maximum(hi, np.r_[hi[h:], hi[-h:]]))
    return tmin, tmax


def _per_start_limits(src, extra, seg_starts, seg_ends, tile: int,
                      window: int, tables=None) -> np.ndarray:
    """jlim[i]: the furthest end a tile starting at edge i may take.

    Fully vectorised.  Constraints per tile [i, j):
      - j - i <= tile;
      - j <= end of i's dst segment;
      - src[i:j] within [src[i]//8*8, +window)  (src ascending in-segment,
        so this is a searchsorted; segments are isolated by lifting every
        key by seg_id * LIFT so ONE global searchsorted handles all
        segments and clips at segment ends automatically);
      - extra[i:j] span < window after 8-alignment (extra is unordered:
        solved with binary doubling over precomputed range-min/max tables,
        extending each i greedily by decreasing powers of two)."""
    n = len(src)
    seg_id = np.zeros(n, np.int64)
    seg_id[seg_starts[1:]] = 1
    seg_id = np.cumsum(seg_id)
    seg_end = seg_ends[seg_id]

    # Window limit on the sorted stream.
    lift = np.int64(1) << 34
    key = src + seg_id * lift
    w_lim = (src // 8) * 8 + window + seg_id * lift
    jw = np.searchsorted(key, w_lim, side="left")
    jlim = np.minimum(np.minimum(jw, np.arange(n) + tile), seg_end)

    if extra is not None and n:
        # Sparse range-min/max tables up to the tile length.
        levels = max(int(np.ceil(np.log2(tile))), 1)
        if tables is not None and len(tables[0]) > levels:
            tmin, tmax = tables
        else:
            tmin, tmax = _build_range_tables(extra, levels)
        # Greedy binary extension: grow each tile [i, j) while the
        # 8-aligned span of extra[i:j] stays below `window` and j stays
        # within jlim (which already encodes tile/segment/src limits).
        j = np.arange(n)
        cmin = np.full(n, np.iinfo(np.int32).max, np.int64)
        cmax = np.full(n, np.iinfo(np.int32).min, np.int64)
        for l in range(levels, -1, -1):
            step = 1 << l
            jc = np.minimum(j, n - 1)
            nmin = np.minimum(cmin, tmin[l][jc])
            nmax = np.maximum(cmax, tmax[l][jc])
            ok = ((j + step <= jlim)
                  & (nmax - (nmin // 8) * 8 < window))
            j = np.where(ok, j + step, j)
            cmin = np.where(ok, nmin, cmin)
            cmax = np.where(ok, nmax, cmax)
        jlim = np.maximum(j, np.arange(n) + 1)   # always advance >= 1
    return jlim


def _split_tiles(src, extra, seg_starts, seg_ends, tile: int, window: int,
                 tables=None) -> Tuple[np.ndarray, np.ndarray]:
    """Split dst segments into tiles obeying tile size + src/extra windows.

    src must be ascending within each segment (lexsorted); extra (if given)
    is unordered (span-checked via range tables).  Returns tile
    (starts, ends) index arrays partitioning [0, n).  The per-start limits
    are vectorised; only the O(num_tiles) greedy chain is a Python loop."""
    if len(src) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    jlim = _per_start_limits(src, extra, seg_starts, seg_ends, tile, window,
                             tables=tables)
    starts = []
    for s, e in zip(seg_starts, seg_ends):
        i = int(s)
        e = int(e)
        while i < e:
            starts.append(i)
            i = int(jlim[i])
    starts = np.asarray(starts, np.int64)
    ends = np.r_[starts[1:], len(src)].astype(np.int64)
    # Tile ends clip at segment boundaries (the chain restarts there).
    seg_of = np.searchsorted(seg_starts, starts, side="right") - 1
    ends = np.minimum(ends, seg_ends[seg_of])
    return starts, ends


def _fill_tiles(src, dst, weights, extra, t_starts, t_ends, pad_count,
                tile: int, window: int, num_src_pad: int, num_extra_pad: int):
    """Vectorised scatter of edges into [tiles, T] rel arrays.

    Returns (src_rel, dst_abs, mask, ex_rel, win_start, ex_start) where
    dst_abs holds ABSOLUTE dst ids (callers subtract their block base).
    pad_count extra all-masked tiles are appended."""
    n_real = len(t_starts)
    t_count = n_real + pad_count
    counts = t_ends - t_starts
    rows = np.repeat(np.arange(n_real), counts)
    cols = np.arange(len(src)) - np.repeat(t_starts, counts)

    src_rel = np.zeros((t_count, tile), np.int32)
    dst_abs = np.zeros((t_count, tile), np.int64)
    m = np.zeros((t_count, tile), np.float32)
    win_start = np.zeros(t_count, np.int32)
    ex_rel = None
    ex_start = None

    if n_real:
        # Per-tile minima: src is ascending within a tile, so min = first.
        w0 = (src[t_starts] // 8) * 8
        w0 = np.minimum(w0, num_src_pad - window).astype(np.int64)
        win_start[:n_real] = w0
        src_rel[rows, cols] = src - w0[rows]
        dst_abs[rows, cols] = dst
        m[rows, cols] = weights
    if extra is not None:
        ex_rel = np.zeros((t_count, tile), np.int32)
        ex_start = np.zeros(t_count, np.int32)
        if n_real:
            e0 = np.minimum.reduceat(extra, t_starts)
            e0 = np.minimum((e0 // 8) * 8, num_extra_pad - window)
            ex_start[:n_real] = e0
            ex_rel[rows, cols] = extra - e0[rows]
    return src_rel, dst_abs, m, ex_rel, win_start, ex_start


def _reshape3(a):
    return None if a is None else a[:, None, :]


def _grid_boundaries(src, dst, extra, tile: int, window: int, block: int):
    """Tile boundaries for grid mode: dst segments are aligned blocks."""
    n = len(dst)
    blk = dst // block
    seg_starts = np.flatnonzero(np.r_[True, blk[1:] != blk[:-1]])
    seg_ends = np.r_[seg_starts[1:], n]
    # Re-sort by src within each dst block (extra as tie-break for locality).
    keys = (src, blk) if extra is None else (extra, src, blk)
    order = np.lexsort(keys)
    src, dst = src[order], dst[order]
    extra = extra[order] if extra is not None else None
    t_starts, t_ends = _split_tiles(src, extra, seg_starts, seg_ends,
                                    tile, window)
    return order, t_starts, t_ends, blk


def build_tile_plan(src, dst, mask, num_src: int, num_dst: int,
                    extra=None, num_extra: int = 0,
                    tile: int = 512, window: int = 512, block: int = 256,
                    bucket_tiles: bool = True, passes: int = 2,
                    min_tiles: int = 0) -> TilePlan:
    """Plan dst-sorted edges into kernel tiles (see module docstring).

    min_tiles forces at least that many (padded) tiles — used to give
    several same-shape batches identical plan shapes (DP shard stacking)."""
    src, dst, weights, extra_v = _sorted_valid(src, dst, mask, extra)
    has_extra = extra is not None
    n = len(dst)

    num_src_pad = max(_round_up(num_src, 8), window)
    num_extra_pad = max(_round_up(num_extra, 8), window) if has_extra else 0
    num_dst_pad = _round_up(max(num_dst, block), block)
    n_blocks = num_dst_pad // block

    if n:
        order, t_starts, t_ends, _ = _grid_boundaries(
            src, dst, extra_v, tile, window, block)
        src, dst, weights = src[order], dst[order], weights[order]
        extra_v = extra_v[order] if has_extra else None
        tile_blk = (dst[t_starts] // block).astype(np.int64)
    else:
        t_starts = t_ends = np.zeros(0, np.int64)
        tile_blk = np.zeros(0, np.int64)

    # Interleave all-padding tiles so every out block is visited, in order:
    # block b gets an empty tile iff no real tile targets it.
    present = np.zeros(n_blocks, bool)
    present[tile_blk] = True
    missing = np.flatnonzero(~present)
    n_real = len(t_starts)
    n_tiles = n_real + len(missing)
    target = _pow2_round(n_tiles) if bucket_tiles else n_tiles
    target = max(target, min_tiles)
    pad_count = target - n_real

    src_rel, dst_abs, m, ex_rel, win_start, ex_start = _fill_tiles(
        src, dst, weights, extra_v, t_starts, t_ends, pad_count,
        tile, window, num_src_pad, num_extra_pad)

    # Block ids: real tiles in dst order, then the missing blocks, then
    # trailing accumulation padding repeating the last block — merged into
    # one globally non-decreasing sequence.
    t_count = n_real + pad_count
    out_block = np.zeros(t_count, np.int32)
    out_block[:n_real] = tile_blk
    out_block[n_real:n_real + len(missing)] = missing
    last_blk = (out_block[n_real + len(missing) - 1]
                if (n_real + len(missing)) else 0)
    out_block[n_real + len(missing):] = last_blk
    order2 = np.argsort(out_block, kind="stable")

    def _ro(a):
        return None if a is None else a[order2]

    dst_rel = (dst_abs - out_block[:, None].astype(np.int64) * block
               ).astype(np.int32)
    dst_rel[m == 0] = 0

    plan = TilePlan(
        src_rel=_reshape3(_ro(src_rel)),
        dst_rel=_reshape3(_ro(dst_rel)),
        mask=_reshape3(_ro(m)), extra_rel=_reshape3(_ro(ex_rel)),
        win_start=_ro(win_start), extra_start=_ro(ex_start),
        out_block=out_block[order2],
        tile=tile, window=window, block=block,
        num_src=num_src_pad, num_extra=num_extra_pad, num_dst=num_dst_pad,
        passes=passes, empty=(n == 0))
    assert plan.src_rel.max(initial=0) < window and plan.src_rel.min(initial=0) >= 0
    assert plan.dst_rel.max(initial=0) < block and plan.dst_rel.min(initial=0) >= 0
    if ex_rel is not None:
        assert plan.extra_rel.max(initial=0) < window
        assert plan.extra_rel.min(initial=0) >= 0
    return plan


def concat_window_plans(plans, src_offsets, dst_offsets,
                        extra_offsets=None) -> Optional["TilePlan"]:
    """Concatenate windowed-scatter plans into ONE plan over concatenated
    source/destination row spaces — one kernel launch covers what took one
    launch per plan.

    Each plan k addresses rows [0, num_src_k) of its own source array and
    [0, num_dst_k) of its own output; after concatenation it addresses
    [src_offsets[k], +num_src_k) of the stacked source and
    [dst_offsets[k], +num_dst_k) of the stacked output.  Window starts are
    shifted by the offsets, relative streams are unchanged, so tile windows
    never cross a section boundary.  Offsets must be 8-aligned (the padded
    per-dim section sizes are, by construction in pack_complexes).

    Returns None when the plans cannot be combined: mixed kernel modes,
    mismatched geometry/passes, an offset list not matching the plans
    (wrong length, misaligned), or a section span smaller than its plan's
    padded row count (windows/blocks would cross section boundaries).
    """
    plans = list(plans)
    if not plans:
        return None
    p0 = plans[0]
    has_extra = p0.extra_rel is not None
    for p in plans:
        if (p.dst_start is None or p.empty
                or (p.extra_rel is not None) != has_extra
                or (p.tile, p.window, p.block, p.supertile, p.passes)
                != (p0.tile, p0.window, p0.block, p0.supertile, p0.passes)
                or p.num_src < p.window or p.num_dst < p.block):
            return None
    if has_extra and extra_offsets is None:
        return None
    # Layout validation: one offset per plan, 8-aligned, and every section
    # span at least its plan's padded row count — a caller laying sections
    # out by UNPADDED sizes would otherwise get windows/blocks silently
    # reading and writing across section boundaries.
    sizes = (("num_src", src_offsets), ("num_dst", dst_offsets)) + (
        (("num_extra", extra_offsets),) if has_extra else ())
    for field, off in sizes:
        if len(off) != len(plans) or any(o % 8 for o in off):
            return None
        spans = [off[i + 1] - off[i] for i in range(len(off) - 1)]
        if any(s < getattr(plans[i], field)
               for i, s in enumerate(spans)):
            return None

    def cat(field, offs=None):
        parts = []
        for i, p in enumerate(plans):
            a = getattr(p, field)
            parts.append(a if offs is None else a + offs[i])
        return np.concatenate(parts, axis=0)

    return TilePlan(
        src_rel=cat("src_rel"), dst_rel=cat("dst_rel"), mask=cat("mask"),
        extra_rel=cat("extra_rel") if has_extra else None,
        win_start=cat("win_start", src_offsets),
        extra_start=cat("extra_start", extra_offsets) if has_extra else None,
        out_block=cat("out_block"),
        tile=p0.tile, window=p0.window, block=p0.block,
        num_src=src_offsets[-1] + plans[-1].num_src,
        num_extra=(extra_offsets[-1] + plans[-1].num_extra
                   if has_extra else 0),
        num_dst=dst_offsets[-1] + plans[-1].num_dst,
        passes=p0.passes, empty=False,
        dst_start=cat("dst_start", dst_offsets), supertile=p0.supertile)


_TUNER_SAMPLE_EDGES = 50_000


def build_tile_plan_auto(src, dst, mask, num_src: int, num_dst: int,
                         extra=None, num_extra: int = 0, tile: int = 256,
                         window: int = 256, block: int = 256,
                         passes: int = 2) -> TilePlan:
    """build_tile_plan with window/block geometry chosen by occupancy.

    Tiles fragment on two boundaries: the source-window span and the
    dst-block span (a tile's dsts must fall in ONE aligned block, so small
    blocks over many small complexes leave tiles part-empty).  The kernel's
    per-tile cost is dominated by one-hot construction + MXU work, both
    proportional to the tile AREA tile*(2*window + block), plus a small
    fixed grid-step overhead — search tile/window/block and minimise
    tiles * (fixed + area), calibrated on hardware traces.  Candidates are
    costed with a boundary-only pass sharing one lexsort per block size;
    only the winner is materialised."""
    s, d, w, e = _sorted_valid(src, dst, mask, extra)
    n = len(d)
    # The kernels are only validated for >=128 geometries (one-hot matmul
    # operands must tile the 128-lane MXU); filter candidates accordingly
    # rather than assuming the defaults' halves land exactly on 64.
    MIN_GEOM = 128
    blocks = sorted(c for c in {block // 2, block, 2 * block, 4 * block}
                    if c >= MIN_GEOM)
    tiles_c = sorted(c for c in {tile // 2, tile} if c >= MIN_GEOM)
    windows = sorted(c for c in {window // 2, window, 2 * window, 4 * window}
                     if c >= MIN_GEOM)
    best, best_cost = None, None
    for b in blocks:
        num_dst_pad = _round_up(max(num_dst, b), b)
        if n:
            blk = d // b
            seg_starts = np.flatnonzero(np.r_[True, blk[1:] != blk[:-1]])
            seg_ends = np.r_[seg_starts[1:], n]
            keys = (s, blk) if e is None else (e, s, blk)
            order = np.lexsort(keys)
            s_srt = s[order]
            e_srt = e[order] if e is not None else None
            blocks_hit = len(seg_starts)
            # Cost on a contiguous segment-prefix sample for large
            # channels (the winner geometry is materialised exactly);
            # range tables for the extra stream are built ONCE per block
            # sort and shared across all (tile, window) candidates.
            if n > _TUNER_SAMPLE_EDGES:
                k = min(int(np.searchsorted(
                    seg_ends, _TUNER_SAMPLE_EDGES, side="left")) + 1,
                    len(seg_starts))
                cut = int(seg_ends[k - 1])
            else:
                k, cut = len(seg_starts), n
            ss, se = seg_starts[:k], seg_ends[:k]
            s_smp = s_srt[:cut]
            e_smp = e_srt[:cut] if e_srt is not None else None
            scale = n / cut
            tables = None
            if e_smp is not None:
                max_lv = max(int(np.ceil(np.log2(max(tiles_c)))), 1)
                tables = _build_range_tables(e_smp, max_lv)
        for t in tiles_c:
            for win in windows:
                if n:
                    t_starts, _ = _split_tiles(s_smp, e_smp, ss, se, t, win,
                                               tables=tables)
                    count = (int(round(len(t_starts) * scale))
                             + num_dst_pad // b - blocks_hit)
                else:
                    count = num_dst_pad // b
                n_tiles = _pow2_round(max(count, 1))
                area = t * ((2 * win if e is not None else win) + b)
                cost = n_tiles * (80_000.0 + area)
                if best is None or cost < best_cost:
                    best, best_cost = (t, win, b), cost
    t, win, b = best
    return build_tile_plan(src, dst, mask, num_src, num_dst, extra=extra,
                           num_extra=num_extra, tile=t, window=win, block=b,
                           passes=passes)


def build_window_plan(src, dst, mask, num_src: int, num_dst: int,
                      extra=None, num_extra: int = 0,
                      tile: int = 256, window: int = 256, block: int = 256,
                      supertile: int = 4, passes: int = 2,
                      bucket_tiles: bool = True, min_tiles: int = 0) -> TilePlan:
    """Plan edges for the windowed-scatter kernel (TilePlan.dst_start).

    Like build_tile_plan but the dst constraint is a movable 8-aligned
    `block`-row window instead of an aligned block grid: no interleaved
    empty tiles, no fragmentation at block boundaries.  Tiles are padded to
    a multiple of `supertile` (and bucketed to a power of two) so the
    kernel grid is tiles/supertile."""
    src, dst, weights, extra_v = _sorted_valid(src, dst, mask, extra)
    has_extra = extra is not None
    n = len(dst)

    num_src_pad = max(_round_up(num_src, 8), window)
    num_extra_pad = max(_round_up(num_extra, 8), window) if has_extra else 0
    num_dst_pad = max(_round_up(num_dst, 8), block)

    if n:
        # Greedy dst segments: dst ascending, so each segment is
        # [i, searchsorted(dst, (dst[i]//8)*8 + block)).  The per-start
        # limits are one vectorised searchsorted; the chain is O(segments).
        seg_lim = np.searchsorted(dst, (dst // 8) * 8 + block, side="left")
        seg_starts, i = [], 0
        while i < n:
            seg_starts.append(i)
            i = int(seg_lim[i])
        seg_starts = np.asarray(seg_starts, np.int64)
        seg_ends = np.r_[seg_starts[1:], n].astype(np.int64)
        seg_id = np.zeros(n, np.int64)
        seg_id[seg_starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        keys = ((src, seg_id) if not has_extra
                else (extra_v, src, seg_id))
        order = np.lexsort(keys)
        src, dst, weights = src[order], dst[order], weights[order]
        extra_v = extra_v[order] if has_extra else None
        t_starts, t_ends = _split_tiles(src, extra_v, seg_starts, seg_ends,
                                        tile, window)
    else:
        t_starts = t_ends = np.zeros(0, np.int64)

    n_tiles = max(len(t_starts), 1)
    target = _round_up(n_tiles, supertile)
    if bucket_tiles:
        target = _round_up(_pow2_round(n_tiles), supertile)
    target = max(target, _round_up(min_tiles, supertile))
    pad_count = target - len(t_starts)

    src_rel, dst_abs, m, ex_rel, win_start, ex_start = _fill_tiles(
        src, dst, weights, extra_v, t_starts, t_ends, pad_count,
        tile, window, num_src_pad, num_extra_pad)

    t_count = len(t_starts) + pad_count
    d_start = np.zeros(t_count, np.int32)
    if len(t_starts):
        # dst is NOT sorted within a tile (tiles are re-sorted by src), so
        # the window base is the per-tile minimum, not the first element.
        d0 = (np.minimum.reduceat(dst, t_starts) // 8) * 8
        d_start[:len(t_starts)] = np.minimum(d0, num_dst_pad - block)
    dst_rel = (dst_abs - d_start[:, None].astype(np.int64)).astype(np.int32)
    dst_rel[m == 0] = 0

    plan = TilePlan(
        src_rel=_reshape3(src_rel), dst_rel=_reshape3(dst_rel),
        mask=_reshape3(m), extra_rel=_reshape3(ex_rel),
        win_start=win_start, extra_start=ex_start,
        out_block=np.zeros(t_count, np.int32),   # unused in windowed mode
        tile=tile, window=window, block=block,
        num_src=num_src_pad, num_extra=num_extra_pad, num_dst=num_dst_pad,
        passes=passes, empty=(n == 0), dst_start=d_start,
        supertile=supertile)
    assert plan.src_rel.max(initial=0) < window and plan.src_rel.min(initial=0) >= 0
    assert plan.dst_rel.max(initial=0) < block and plan.dst_rel.min(initial=0) >= 0
    if ex_rel is not None:
        assert plan.extra_rel.max(initial=0) < window
        assert plan.extra_rel.min(initial=0) >= 0
    return plan
