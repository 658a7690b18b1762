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
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
from flax import struct


@struct.dataclass
class TilePlan:
    """Device arrays + static geometry for one adjacency's tiles."""

    src_rel: np.ndarray    # [tiles, T] int32, src - win_start[tile]
    dst_rel: np.ndarray    # [tiles, T] int32, dst - block*out_block[tile]
    mask: np.ndarray       # [tiles, T] float32
    extra_rel: Optional[np.ndarray]  # [tiles, T] int32 (2nd gather stream)
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
    tiles * (fixed + area), calibrated on hardware traces."""
    candidates = []
    for t in {tile // 2, tile}:
        for w in {window // 2, window, 2 * window, 4 * window}:
            for b in {block // 2, block, 2 * block, 4 * block}:
                if t >= 128 and w >= 128 and b >= 128:
                    candidates.append((t, w, b))
    best, best_cost = None, None
    for t, w, b in sorted(candidates):
        plan = build_tile_plan(src, dst, mask, num_src, num_dst,
                               extra=extra, num_extra=num_extra,
                               tile=t, window=w, block=b, passes=passes)
        area = t * ((2 * w if extra is not None else w) + b)
        cost = plan.num_tiles * (80_000.0 + area)
        if best is None or cost < best_cost:
            best, best_cost = plan, cost
    return best


def build_window_plan(src, dst, mask, num_src: int, num_dst: int,
                      extra=None, num_extra: int = 0,
                      tile: int = 256, window: int = 256, block: int = 256,
                      supertile: int = 4, passes: int = 2,
                      bucket_tiles: bool = True) -> TilePlan:
    """Plan edges for the windowed-scatter kernel (TilePlan.dst_start).

    Like build_tile_plan but the dst constraint is a movable 8-aligned
    `block`-row window instead of an aligned block grid: no interleaved
    empty tiles, no fragmentation at block boundaries.  Tiles are padded to
    a multiple of `supertile` (and bucketed to a power of two) so the
    kernel grid is tiles/supertile."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    mask = np.asarray(mask, np.float32)
    has_extra = extra is not None
    extra = np.asarray(extra, np.int64) if has_extra else None

    valid = mask != 0
    order = np.argsort(dst, kind="stable")
    order = order[valid[order]]
    src, dst = src[order], dst[order]
    weights = mask[order]
    extra_v = extra[order] if has_extra else None

    num_src_pad = max(_round_up(num_src, 8), window)
    num_extra_pad = max(_round_up(num_extra, 8), window) if has_extra else 0
    num_dst_pad = max(_round_up(num_dst, 8), block)

    raw_tiles = []  # (i, j, w0, e0, d0)
    i, n = 0, len(dst)
    while i < n:
        smin = smax = int(src[i])
        dmin = dmax = int(dst[i])
        emin = emax = int(extra_v[i]) if has_extra else 0
        j = i
        while j < n and (j - i) < tile:
            ns_min, ns_max = min(smin, int(src[j])), max(smax, int(src[j]))
            if ns_max - (ns_min // 8) * 8 >= window:
                break
            nd_min, nd_max = min(dmin, int(dst[j])), max(dmax, int(dst[j]))
            if nd_max - (nd_min // 8) * 8 >= block:
                break
            if has_extra:
                ne_min = min(emin, int(extra_v[j]))
                ne_max = max(emax, int(extra_v[j]))
                if ne_max - (ne_min // 8) * 8 >= window:
                    break
                emin, emax = ne_min, ne_max
            smin, smax = ns_min, ns_max
            dmin, dmax = nd_min, nd_max
            j += 1
        w0 = min((smin // 8) * 8, num_src_pad - window)
        e0 = min((emin // 8) * 8, num_extra_pad - window) if has_extra else 0
        d0 = min((dmin // 8) * 8, num_dst_pad - block)
        raw_tiles.append((i, j, w0, e0, d0))
        i = j

    n_tiles = max(len(raw_tiles), 1)
    target = _round_up(n_tiles, supertile)
    if bucket_tiles:
        target = _round_up(_pow2_round(n_tiles), supertile)
    while len(raw_tiles) < target:
        raw_tiles.append((None, None, 0, 0, 0))

    t_count = len(raw_tiles)
    src_rel = np.zeros((t_count, tile), np.int32)
    dst_rel = np.zeros((t_count, tile), np.int32)
    m = np.zeros((t_count, tile), np.float32)
    ex_rel = np.zeros((t_count, tile), np.int32) if has_extra else None
    win_start = np.zeros(t_count, np.int32)
    ex_start = np.zeros(t_count, np.int32) if has_extra else None
    d_start = np.zeros(t_count, np.int32)

    for t, (i, j, w0, e0, d0) in enumerate(raw_tiles):
        win_start[t] = w0
        d_start[t] = d0
        if has_extra:
            ex_start[t] = e0
        if i is None:
            continue
        cnt = j - i
        src_rel[t, :cnt] = src[i:j] - w0
        dst_rel[t, :cnt] = dst[i:j] - d0
        m[t, :cnt] = weights[i:j]
        if has_extra:
            ex_rel[t, :cnt] = extra_v[i:j] - e0
        assert src_rel[t].max() < window and src_rel[t].min() >= 0
        assert dst_rel[t].max() < block and dst_rel[t].min() >= 0

    def _r(a):
        return None if a is None else a[:, None, :]

    return TilePlan(
        src_rel=_r(src_rel), dst_rel=_r(dst_rel), mask=_r(m),
        extra_rel=_r(ex_rel),
        win_start=win_start, extra_start=ex_start,
        out_block=np.zeros(t_count, np.int32),   # unused in windowed mode
        tile=tile, window=window, block=block,
        num_src=num_src_pad, num_extra=num_extra_pad, num_dst=num_dst_pad,
        passes=passes, empty=(len(dst) == 0), dst_start=d_start,
        supertile=supertile)


def build_tile_plan(src, dst, mask, num_src: int, num_dst: int,
                    extra=None, num_extra: int = 0,
                    tile: int = 512, window: int = 512, block: int = 256,
                    bucket_tiles: bool = True, passes: int = 2) -> TilePlan:
    """Plan dst-sorted edges into kernel tiles (see module docstring)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    mask = np.asarray(mask, np.float32)
    has_extra = extra is not None
    extra = np.asarray(extra, np.int64) if has_extra else None

    valid = mask != 0          # weights may be signed (orientations)
    order = np.argsort(dst, kind="stable")
    order = order[valid[order]]
    src, dst = src[order], dst[order]
    weights = mask[order]
    extra_v = extra[order] if has_extra else None

    num_src_pad = max(_round_up(num_src, 8), window)
    num_extra_pad = max(_round_up(num_extra, 8), window) if has_extra else 0
    num_dst_pad = _round_up(max(num_dst, block), block)
    n_blocks = num_dst_pad // block

    # Greedy split into tiles.
    raw_tiles = []  # (i, j, w0, e0, blk)
    i, n = 0, len(dst)
    while i < n:
        blk = int(dst[i]) // block
        smin = smax = int(src[i])
        emin = emax = int(extra_v[i]) if has_extra else 0
        j = i
        while j < n and (j - i) < tile:
            if int(dst[j]) // block != blk:
                break
            ns_min, ns_max = min(smin, int(src[j])), max(smax, int(src[j]))
            if ns_max - (ns_min // 8) * 8 >= window:
                break
            if has_extra:
                ne_min = min(emin, int(extra_v[j]))
                ne_max = max(emax, int(extra_v[j]))
                if ne_max - (ne_min // 8) * 8 >= window:
                    break
                emin, emax = ne_min, ne_max
            smin, smax = ns_min, ns_max
            j += 1
        # Align window starts to the sublane granularity: unaligned dynamic
        # slices on the second-minor dim force slow relayouts in Mosaic.
        w0 = min((smin // 8) * 8, num_src_pad - window)
        e0 = min((emin // 8) * 8, num_extra_pad - window) if has_extra else 0
        raw_tiles.append((i, j, w0, e0, blk))
        i = j

    # Interleave all-padding tiles so every out block is visited, in order.
    tiles = []
    next_block = 0
    for (i, j, w0, e0, blk) in raw_tiles:
        while next_block < blk:
            tiles.append((None, None, 0, 0, next_block))
            next_block += 1
        tiles.append((i, j, w0, e0, blk))
        next_block = max(next_block, blk + 1)
    while next_block < n_blocks:
        tiles.append((None, None, 0, 0, next_block))
        next_block += 1

    # Pad the tile count to a power of two with trailing accumulation tiles
    # (same block as the last tile, all-masked).
    n_tiles = len(tiles)
    target = _pow2_round(n_tiles) if bucket_tiles else n_tiles
    while len(tiles) < target:
        tiles.append((None, None, 0, 0, tiles[-1][4]))

    t_count = len(tiles)
    src_rel = np.zeros((t_count, tile), np.int32)
    dst_rel = np.zeros((t_count, tile), np.int32)
    m = np.zeros((t_count, tile), np.float32)
    ex_rel = np.zeros((t_count, tile), np.int32) if has_extra else None
    win_start = np.zeros(t_count, np.int32)
    ex_start = np.zeros(t_count, np.int32) if has_extra else None
    out_block = np.zeros(t_count, np.int32)

    for t, (i, j, w0, e0, blk) in enumerate(tiles):
        out_block[t] = blk
        win_start[t] = w0
        if has_extra:
            ex_start[t] = e0
        if i is None:
            continue
        cnt = j - i
        src_rel[t, :cnt] = src[i:j] - w0
        dst_rel[t, :cnt] = dst[i:j] - blk * block
        m[t, :cnt] = weights[i:j]
        if has_extra:
            ex_rel[t, :cnt] = extra_v[i:j] - e0
        assert src_rel[t].max() < window and src_rel[t].min() >= 0
        assert dst_rel[t].max() < block and dst_rel[t].min() >= 0

    # Shape [tiles, 1, T]: Pallas TPU block shapes must have their last two
    # dims divisible by (8, 128) OR equal to the array dims; (1, T) blocks on
    # a [tiles, 1, T] array satisfy the latter.
    def _r(a):
        return None if a is None else a[:, None, :]

    return TilePlan(
        src_rel=_r(src_rel), dst_rel=_r(dst_rel), mask=_r(m),
        extra_rel=_r(ex_rel),
        win_start=win_start, extra_start=ex_start, out_block=out_block,
        tile=tile, window=window, block=block,
        num_src=num_src_pad, num_extra=num_extra_pad, num_dst=num_dst_pad,
        passes=passes, empty=(len(dst) == 0))
