"""Pallas TPU kernel: tiled one-hot segment-SpMM.

The message-passing hot path — gather rows of x by `src`, weight, and
segment-sum into `dst` — is reformulated as two MXU matmuls per edge tile
(see cwn_tpu.ops.tiles for the plan invariants):

    msg     = onehot_src * weight  @  x_window          [T,W] @ [W,F]
    out_blk += onehot_dst          @  msg               [B,T] @ [T,F]

Two variants share the kernel body:
  - VMEM-resident x (default when x fits on-chip): windows are dynamic
    slices of a VMEM block, no DMA;
  - HBM x with per-tile async DMA windows (large cell counts).

Output blocks live on an aligned grid, are zeroed on first visit and
accumulated across consecutive tiles (dst-sorted => non-decreasing block
ids).  All-padding tiles skip their matmuls.

This replaces torch-scatter's CUDA scatter-add (the aggregation engine of
the reference, /root/reference/mp/cell_mp.py:423-479) with a formulation
that rides the MXU systolic array instead of fighting random scatters.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cwn_tpu.ops.tiles import TilePlan

# VMEM budget for keeping x resident on-chip (bytes).
_X_VMEM_LIMIT = 8 * 1024 * 1024


def _row_bytes(feat: int) -> int:
    """VMEM bytes per f32 row: the last dim pads to the 128-lane register
    width, so a [N, 1] array costs 512 B/row in VMEM, not 4 B."""
    return ((feat + 127) // 128) * 128 * 4

def _pad_feat_128(feat: int) -> int:
    """HBM window DMAs slice the lane (last) dim, and Mosaic requires such
    slices to be 128-aligned — so the HBM-x kernels run at a feature width
    padded to a multiple of 128 and the caller slices the result back."""
    return ((feat + 127) // 128) * 128


# Global interpret-mode switch (tests on CPU flip this on).
_FORCE_INTERPRET = False


def set_interpret(value: bool):
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(value)


def _split_bf16(v, passes):
    """f32 -> `passes` bf16 terms summing (in f32) to v with relative error
    ~2^(-8*passes): 1 = bf16 rounding (XLA's default f32-matmul precision on
    TPU), 2 ~ 2^-17, 3 = exact to f32 (~2^-24)."""
    terms = []
    r = v
    for _ in range(passes):
        h = r.astype(jnp.bfloat16)
        terms.append(h)
        r = r - h.astype(jnp.float32)
    return terms


def _onehot_dot(onehot_bf16, v, passes=3):
    """onehot @ v via `passes` native bf16 MXU passes; f32 accumulate.

    The one-hot operand is exact in bf16, so only v needs splitting — at
    passes=3 this matches Precision.HIGHEST accuracy at half the passes."""
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    out = None
    for t in _split_bf16(v, passes):
        out = d(onehot_bf16, t) if out is None else out + d(onehot_bf16, t)
    return out


def _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          xwin_get, *, tile, window, block, passes):
    srcrel = srcrel_ref[0, 0, :]
    dstrel = dstrel_ref[0, 0, :]
    weight = mask_ref[0, 0, :]

    prev = blk_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk_ref[t] != prev)
    has_edges = jnp.any(weight != 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(has_edges)
    def _():
        onehot_s = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == srcrel[:, None]).astype(jnp.bfloat16)
        onehot_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                    == dstrel[None, :]).astype(jnp.bfloat16)
        # Per-edge weights applied AFTER the gather matmul (msg row e is
        # x[src[e]]), keeping the one-hot operands exactly representable.
        msg = _onehot_dot(onehot_s, xwin_get(), passes) * weight[:, None]
        contrib = _onehot_dot(onehot_d, msg, passes)
        out_ref[...] = out_ref[...] + contrib


def _kernel_vmem(win_ref, blk_ref, srcrel_ref, dstrel_ref, mask_ref,
                 x_ref, out_ref, *, tile, window, block, passes):
    t = pl.program_id(0)
    w0 = win_ref[t]
    _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          lambda: x_ref[pl.ds(w0, window), :],
          tile=tile, window=window, block=block, passes=passes)


def _kernel_hbm(win_ref, blk_ref, srcrel_ref, dstrel_ref, mask_ref,
                x_ref, out_ref, xwin, sem, *, tile, window, block, passes):
    t = pl.program_id(0)
    # Plans 8-align every window start ((src//8)*8, clamped to an 8-aligned
    # num_src_pad); Mosaic needs the annotation to prove the HBM slice is
    # sublane-tiled (it can't infer it for wide lane layouts).
    w0 = pl.multiple_of(win_ref[t], 8)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(w0, window), :], xwin, sem)
    cp.start()
    cp.wait()
    _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          lambda: xwin[...], tile=tile, window=window, block=block,
          passes=passes)


def segment_spmm(x: jnp.ndarray, plan: TilePlan,
                 interpret: bool = False) -> jnp.ndarray:
    """out[d] = sum_{e: dst[e]=d} weight[e] * x[src[e]]  -> [num_dst, F].

    x is padded to plan.num_src rows; output has plan.num_dst rows (both
    padded; callers slice)."""
    tile, window, block = plan.tile, plan.window, plan.block
    feat = x.shape[-1]
    if plan.empty:
        return jnp.zeros((plan.num_dst, feat), jnp.float32)
    if plan.dst_start is not None:
        return _win_segment_spmm(x, plan, interpret or _FORCE_INTERPRET)
    if x.shape[0] < plan.num_src:
        x = jnp.pad(x, ((0, plan.num_src - x.shape[0]), (0, 0)))
    n_tiles = plan.num_tiles
    interpret = interpret or _FORCE_INTERPRET
    x_resident = plan.num_src * _row_bytes(feat) <= _X_VMEM_LIMIT
    out_feat = feat
    if not x_resident and feat != _pad_feat_128(feat):
        feat = _pad_feat_128(feat)
        x = jnp.pad(x, ((0, 0), (0, feat - out_feat)))

    tile_spec = pl.BlockSpec((1, 1, tile), lambda t, w, b: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    if x_resident:
        kernel = functools.partial(_kernel_vmem, tile=tile, window=window,
                                   block=block, passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        kernel = functools.partial(_kernel_hbm, tile=tile, window=window,
                                   block=block, passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((window, feat), jnp.float32),
                   pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec, x_spec],
        out_specs=pl.BlockSpec((block, feat), lambda t, w, b: (b[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * plan.passes * (tile * window + tile * block)
            * feat,
            bytes_accessed=n_tiles * (window + block) * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.out_block, plan.src_rel, plan.dst_rel,
      plan.mask, x.astype(jnp.float32))
    return out[:, :out_feat] if out_feat != feat else out


@jax.custom_vjp
def segment_spmm_ad(x, fwd_plan: TilePlan, bwd_plan: TilePlan):
    """Differentiable segment SpMM: bwd_plan is the transpose adjacency
    (src<->dst swapped, re-sorted, same weights)."""
    return segment_spmm(x, fwd_plan)


def _spmm_fwd(x, fwd_plan, bwd_plan):
    return segment_spmm(x, fwd_plan), (bwd_plan, x.shape[0])


def _spmm_bwd(res, g):
    bwd_plan, n_rows = res
    dx = segment_spmm(g, bwd_plan)
    return dx[:n_rows], None, None


segment_spmm_ad.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Fused two-sided message kernel.
#
# The non-identity CIN message (the headline config's hot path,
# /root/reference/mp/layers.py:184-189 `msg_up_nn(cat[up_x_j, up_attr])`)
# decomposes as
#
#     msg_e = act( xs[src_e] + xu[cob_e] + bias ),   out[dst] = sum msg_e
#
# with xs = x @ W1 and xu = x_up @ W2 computed as dense MXU matmuls over
# CELLS (not edges).  The per-edge part then runs entirely in VMEM: two
# one-hot gather matmuls, a VPU bias+activation, and a one-hot scatter
# matmul — no [E, F] tensor ever touches HBM, and no XLA scatter appears
# in either direction of the differentiation.
#
# Backward recomputes the pre-activation instead of storing it: for each
# target side t in {src, cob} a plan sorted by t gathers g by dst and the
# *other* side by its pointer (both window streams), while the t-side
# values are gathered from the output block itself (block-side one-hot).
# ---------------------------------------------------------------------------


def _act_fn(name):
    if name == "relu":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "id":
        return lambda v: v
    raise NotImplementedError(f"fused kernel act {name}")


def _dact_fn(name):
    if name == "relu":
        return lambda v: (v > 0).astype(v.dtype)
    if name == "id":
        return lambda v: jnp.ones_like(v)
    raise NotImplementedError(f"fused kernel act {name}")


FUSED_ACTS = ("relu", "id")


def _fused_fwd_body(t, blk_ref, srel_ref, erel_ref, drel_ref, mask_ref,
                    bias_ref, out_ref, xs_get, xu_get, *, tile, window,
                    block, act, passes):
    srel = srel_ref[0, 0, :]
    erel = erel_ref[0, 0, :]
    drel = drel_ref[0, 0, :]
    w = mask_ref[0, 0, :]

    prev = blk_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk_ref[t] != prev)
    has_edges = jnp.any(w != 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(has_edges)
    def _():
        oh_s = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                == srel[:, None]).astype(jnp.bfloat16)
        oh_e = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                == erel[:, None]).astype(jnp.bfloat16)
        oh_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                == drel[None, :]).astype(jnp.bfloat16)
        pre = (_onehot_dot(oh_s, xs_get(), passes)
               + _onehot_dot(oh_e, xu_get(), passes)
               + bias_ref[0, :][None, :])
        msg = _act_fn(act)(pre) * w[:, None]
        out_ref[...] = out_ref[...] + _onehot_dot(oh_d, msg, passes)


def _fused_bwd_body(t, blk_ref, grel_ref, erel_ref, drel_ref, mask_ref,
                    bias_ref, xblk_ref, out_ref, g_get, xw_get, *, tile,
                    window, block, act, passes):
    grel = grel_ref[0, 0, :]
    erel = erel_ref[0, 0, :]
    drel = drel_ref[0, 0, :]
    w = mask_ref[0, 0, :]

    prev = blk_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk_ref[t] != prev)
    has_edges = jnp.any(w != 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(has_edges)
    def _():
        oh_g = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                == grel[:, None]).astype(jnp.bfloat16)
        oh_e = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                == erel[:, None]).astype(jnp.bfloat16)
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, block), 1)
                == drel[:, None]).astype(jnp.bfloat16)
        oh_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                == drel[None, :]).astype(jnp.bfloat16)
        ge = _onehot_dot(oh_g, g_get(), passes)
        other = _onehot_dot(oh_e, xw_get(), passes)
        mine = _onehot_dot(oh_b, xblk_ref[...], passes)
        pre = mine + other + bias_ref[0, :][None, :]
        dpre = _dact_fn(act)(pre) * w[:, None] * ge
        out_ref[...] = out_ref[...] + _onehot_dot(oh_d, dpre, passes)


def _pad_rows(x, n):
    if x.shape[0] < n:
        x = jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))
    return x


def fused_message_fwd(xs: jnp.ndarray, xu: jnp.ndarray, bias: jnp.ndarray,
                      plan: TilePlan, act: str = "relu",
                      interpret: bool = False) -> jnp.ndarray:
    """out[d] = sum_{e: dst=d} mask_e * act(xs[src_e] + xu[extra_e] + bias)."""
    assert plan.extra_rel is not None, "plan must carry the extra stream"
    tile, window, block = plan.tile, plan.window, plan.block
    feat = xs.shape[-1]
    if plan.empty:
        return jnp.zeros((plan.num_dst, feat), jnp.float32)
    if plan.dst_start is not None:
        return _win_fused_fwd(xs, xu, bias, plan, act,
                              interpret or _FORCE_INTERPRET)
    xs = _pad_rows(xs.astype(jnp.float32), plan.num_src)
    xu = _pad_rows(xu.astype(jnp.float32), plan.num_extra)
    n_tiles = plan.num_tiles
    interpret = interpret or _FORCE_INTERPRET
    resident = (plan.num_src + plan.num_extra) * _row_bytes(feat) <= _X_VMEM_LIMIT
    out_feat = feat
    if not resident and feat != _pad_feat_128(feat):
        feat = _pad_feat_128(feat)
        xs = jnp.pad(xs, ((0, 0), (0, feat - out_feat)))
        xu = jnp.pad(xu, ((0, 0), (0, feat - out_feat)))
        bias = jnp.pad(bias.reshape(-1), (0, feat - out_feat))
    bias2 = jnp.reshape(bias.astype(jnp.float32), (1, feat))

    tile_spec = pl.BlockSpec((1, 1, tile), lambda t, w, e, b: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    if resident:
        def kernel(win_ref, ewin_ref, blk_ref, srel, erel, drel, mask,
                   bias_ref, xs_ref, xu_ref, out_ref):
            t = pl.program_id(0)
            w0, e0 = win_ref[t], ewin_ref[t]
            _fused_fwd_body(t, blk_ref, srel, erel, drel, mask, bias_ref,
                            out_ref,
                            lambda: xs_ref[pl.ds(w0, window), :],
                            lambda: xu_ref[pl.ds(e0, window), :],
                            tile=tile, window=window, block=block, act=act,
                            passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        def kernel(win_ref, ewin_ref, blk_ref, srel, erel, drel, mask,
                   bias_ref, xs_ref, xu_ref, out_ref, swin, ewin, sem1, sem2):
            t = pl.program_id(0)
            w0, e0 = win_ref[t], ewin_ref[t]
            cp1 = pltpu.make_async_copy(
                xs_ref.at[pl.ds(w0, window), :], swin, sem1)
            cp2 = pltpu.make_async_copy(
                xu_ref.at[pl.ds(e0, window), :], ewin, sem2)
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            _fused_fwd_body(t, blk_ref, srel, erel, drel, mask, bias_ref,
                            out_ref, lambda: swin[...], lambda: ewin[...],
                            tile=tile, window=window, block=block, act=act,
                            passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((window, feat), jnp.float32),
                   pltpu.VMEM((window, feat), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec, tile_spec, bias_spec,
                  x_spec, x_spec],
        out_specs=pl.BlockSpec((block, feat), lambda t, w, e, b: (b[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * plan.passes
            * (2 * tile * window + tile * block) * feat,
            bytes_accessed=n_tiles * (2 * window + block) * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.extra_start, plan.out_block,
      plan.src_rel, plan.extra_rel, plan.dst_rel, plan.mask,
      bias2, xs, xu)
    return out[:, :out_feat] if out_feat != feat else out


def fused_message_bwd(g: jnp.ndarray, x_mine: jnp.ndarray,
                      x_other: jnp.ndarray, bias: jnp.ndarray,
                      plan: TilePlan, act: str = "relu",
                      interpret: bool = False) -> jnp.ndarray:
    """d x_mine for the fused message op.

    `plan` is sorted by the *mine* side: its window stream gathers g (by
    the forward dst), its extra stream gathers x_other, and its out blocks
    cover the mine rows — whose values are gathered block-side to
    recompute the pre-activation."""
    assert plan.extra_rel is not None
    tile, window, block = plan.tile, plan.window, plan.block
    feat = g.shape[-1]
    if plan.empty:
        return jnp.zeros((plan.num_dst, feat), jnp.float32)
    if plan.dst_start is not None:
        return _win_fused_bwd(g, x_mine, x_other, bias, plan, act,
                              interpret or _FORCE_INTERPRET)
    g = _pad_rows(g.astype(jnp.float32), plan.num_src)
    x_other = _pad_rows(x_other.astype(jnp.float32), plan.num_extra)
    x_mine = _pad_rows(x_mine.astype(jnp.float32), plan.num_dst)
    n_tiles = plan.num_tiles
    interpret = interpret or _FORCE_INTERPRET
    resident = (plan.num_src + plan.num_extra) * _row_bytes(feat) <= _X_VMEM_LIMIT
    out_feat = feat
    if not resident and feat != _pad_feat_128(feat):
        feat = _pad_feat_128(feat)
        g = jnp.pad(g, ((0, 0), (0, feat - out_feat)))
        x_other = jnp.pad(x_other, ((0, 0), (0, feat - out_feat)))
        x_mine = jnp.pad(x_mine, ((0, 0), (0, feat - out_feat)))
        bias = jnp.pad(bias.reshape(-1), (0, feat - out_feat))
    bias2 = jnp.reshape(bias.astype(jnp.float32), (1, feat))

    tile_spec = pl.BlockSpec((1, 1, tile), lambda t, w, e, b: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    blkside_spec = pl.BlockSpec((block, feat), lambda t, w, e, b: (b[t], 0),
                                memory_space=pltpu.VMEM)

    if resident:
        def kernel(win_ref, ewin_ref, blk_ref, grel, erel, drel, mask,
                   bias_ref, xblk_ref, g_ref, xo_ref, out_ref):
            t = pl.program_id(0)
            w0, e0 = win_ref[t], ewin_ref[t]
            _fused_bwd_body(t, blk_ref, grel, erel, drel, mask, bias_ref,
                            xblk_ref, out_ref,
                            lambda: g_ref[pl.ds(w0, window), :],
                            lambda: xo_ref[pl.ds(e0, window), :],
                            tile=tile, window=window, block=block, act=act,
                            passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        def kernel(win_ref, ewin_ref, blk_ref, grel, erel, drel, mask,
                   bias_ref, xblk_ref, g_ref, xo_ref, out_ref,
                   gwin, owin, sem1, sem2):
            t = pl.program_id(0)
            w0, e0 = win_ref[t], ewin_ref[t]
            cp1 = pltpu.make_async_copy(
                g_ref.at[pl.ds(w0, window), :], gwin, sem1)
            cp2 = pltpu.make_async_copy(
                xo_ref.at[pl.ds(e0, window), :], owin, sem2)
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            _fused_bwd_body(t, blk_ref, grel, erel, drel, mask, bias_ref,
                            xblk_ref, out_ref, lambda: gwin[...],
                            lambda: owin[...],
                            tile=tile, window=window, block=block, act=act,
                            passes=plan.passes)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((window, feat), jnp.float32),
                   pltpu.VMEM((window, feat), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec, tile_spec, bias_spec,
                  blkside_spec, x_spec, x_spec],
        out_specs=pl.BlockSpec((block, feat), lambda t, w, e, b: (b[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * plan.passes
            * (2 * tile * window + 3 * tile * block) * feat,
            bytes_accessed=n_tiles * (2 * window + 2 * block) * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.extra_start, plan.out_block,
      plan.src_rel, plan.extra_rel, plan.dst_rel, plan.mask,
      bias2, x_mine, g, x_other)
    return out[:, :out_feat] if out_feat != feat else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_message_spmm(xs, xu, bias, fwd_plan: TilePlan,
                       bwd_src_plan: TilePlan, bwd_extra_plan: TilePlan,
                       act: str = "relu"):
    """Differentiable fused message channel (see fused_message_fwd).

    bwd_src_plan: edges sorted by src (window: dst for g; extra: the
    coboundary pointer).  bwd_extra_plan: sorted by the coboundary pointer
    (window: dst; extra: src)."""
    return fused_message_fwd(xs, xu, bias, fwd_plan, act=act)


def _fused_fwd_rule(xs, xu, bias, fwd_plan, bwd_src_plan, bwd_extra_plan,
                    act):
    out = fused_message_fwd(xs, xu, bias, fwd_plan, act=act)
    return out, (xs, xu, bias, bwd_src_plan, bwd_extra_plan,
                 xs.shape[0], xu.shape[0])


def _fused_bwd_rule(act, res, g):
    xs, xu, bias, bwd_s, bwd_e, n_s, n_u = res
    dxs = fused_message_bwd(g, xs, xu, bias, bwd_s, act=act)
    dxu = fused_message_bwd(g, xu, xs, bias, bwd_e, act=act)
    # sum_e d_pre_e lands once in each side's scatter; read it off dxs.
    dbias = jnp.sum(dxs, axis=0)
    return dxs[:n_s], dxu[:n_u], dbias, None, None, None


fused_message_spmm.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# ---------------------------------------------------------------------------
# Windowed-scatter kernels (TilePlan.dst_start is not None).
#
# The whole output lives in VMEM for the kernel's duration (out_spec maps
# every grid step to the full array) and each tile scatters into a dynamic
# 8-aligned `block`-row window — no aligned out-block grid, no per-tile
# output DMA, no interleaved empty tiles.  `supertile` consecutive tiles
# run in one unrolled grid step to amortise the fixed per-step cost
# (stream DMA issue + pipeline bookkeeping), which hardware traces show
# dominates the small-tile regime.
# ---------------------------------------------------------------------------


def _win_spmm_kernel(win_ref, dwin_ref, srel_ref, drel_ref, mask_ref,
                     x_ref, out_ref, *, tile, window, block, passes,
                     supertile):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for s in range(supertile):
        t = g * supertile + s
        sl = pl.ds(s * tile, tile)
        srel = srel_ref[0, 0, sl]
        drel = drel_ref[0, 0, sl]
        wgt = mask_ref[0, 0, sl]
        w0 = win_ref[t]
        d0 = dwin_ref[t]

        @pl.when(jnp.any(wgt != 0))
        def _(srel=srel, drel=drel, wgt=wgt, w0=w0, d0=d0):
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == srel[:, None]).astype(jnp.bfloat16)
            oh_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                    == drel[None, :]).astype(jnp.bfloat16)
            msg = _onehot_dot(oh_s, x_ref[pl.ds(w0, window), :],
                              passes) * wgt[:, None]
            contrib = _onehot_dot(oh_d, msg, passes)
            out_ref[pl.ds(d0, block), :] = \
                out_ref[pl.ds(d0, block), :] + contrib


def _reshape_stream(a, plan):
    S, T = plan.supertile, plan.tile
    G = plan.num_tiles // S
    return jnp.asarray(a).reshape(G, 1, S * T)


def _win_segment_spmm(x, plan, interpret):
    tile, window, block = plan.tile, plan.window, plan.block
    feat = x.shape[-1]
    S = plan.supertile
    G = plan.num_tiles // S
    if x.shape[0] < plan.num_src:
        x = jnp.pad(x, ((0, plan.num_src - x.shape[0]), (0, 0)))

    stream = pl.BlockSpec((1, 1, S * tile), lambda g, w, d: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[stream, stream, stream,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((plan.num_dst, feat), lambda g, w, d: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_win_spmm_kernel, tile=tile, window=window,
                               block=block, passes=plan.passes, supertile=S)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_tiles * plan.passes
            * (tile * window + tile * block) * feat,
            bytes_accessed=(plan.num_src + plan.num_dst) * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.dst_start,
      _reshape_stream(plan.src_rel, plan), _reshape_stream(plan.dst_rel, plan),
      _reshape_stream(plan.mask, plan), x.astype(jnp.float32))


def _win_fused_fwd_kernel(win_ref, ewin_ref, dwin_ref, srel_ref, erel_ref,
                          drel_ref, mask_ref, bias_ref, xs_ref, xu_ref,
                          out_ref, *, tile, window, block, passes, supertile,
                          act):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for s in range(supertile):
        t = g * supertile + s
        sl = pl.ds(s * tile, tile)
        srel = srel_ref[0, 0, sl]
        erel = erel_ref[0, 0, sl]
        drel = drel_ref[0, 0, sl]
        wgt = mask_ref[0, 0, sl]
        w0 = win_ref[t]
        e0 = ewin_ref[t]
        d0 = dwin_ref[t]

        @pl.when(jnp.any(wgt != 0))
        def _(srel=srel, erel=erel, drel=drel, wgt=wgt, w0=w0, e0=e0, d0=d0):
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == srel[:, None]).astype(jnp.bfloat16)
            oh_e = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == erel[:, None]).astype(jnp.bfloat16)
            oh_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                    == drel[None, :]).astype(jnp.bfloat16)
            pre = (_onehot_dot(oh_s, xs_ref[pl.ds(w0, window), :], passes)
                   + _onehot_dot(oh_e, xu_ref[pl.ds(e0, window), :], passes)
                   + bias_ref[0, :][None, :])
            msg = _act_fn(act)(pre) * wgt[:, None]
            contrib = _onehot_dot(oh_d, msg, passes)
            out_ref[pl.ds(d0, block), :] = \
                out_ref[pl.ds(d0, block), :] + contrib


def _win_fused_fwd(xs, xu, bias, plan, act, interpret):
    tile, window, block = plan.tile, plan.window, plan.block
    feat = xs.shape[-1]
    S = plan.supertile
    G = plan.num_tiles // S
    xs = _pad_rows(xs.astype(jnp.float32), plan.num_src)
    xu = _pad_rows(xu.astype(jnp.float32), plan.num_extra)
    bias2 = jnp.reshape(bias.astype(jnp.float32), (1, feat))

    stream = pl.BlockSpec((1, 1, S * tile), lambda g, w, e, d: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[stream, stream, stream, stream, full, full, full],
        out_specs=pl.BlockSpec((plan.num_dst, feat),
                               lambda g, w, e, d: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_win_fused_fwd_kernel, tile=tile,
                               window=window, block=block,
                               passes=plan.passes, supertile=S, act=act)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_tiles * plan.passes
            * (2 * tile * window + tile * block) * feat,
            bytes_accessed=(plan.num_src + plan.num_extra + plan.num_dst)
            * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.extra_start, plan.dst_start,
      _reshape_stream(plan.src_rel, plan),
      _reshape_stream(plan.extra_rel, plan),
      _reshape_stream(plan.dst_rel, plan),
      _reshape_stream(plan.mask, plan), bias2, xs, xu)


def _win_fused_bwd_kernel(win_ref, ewin_ref, dwin_ref, grel_ref, erel_ref,
                          drel_ref, mask_ref, bias_ref, g_ref, xo_ref,
                          xm_ref, out_ref, *, tile, window, block, passes,
                          supertile, act):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for s in range(supertile):
        t = gi * supertile + s
        sl = pl.ds(s * tile, tile)
        grel = grel_ref[0, 0, sl]
        erel = erel_ref[0, 0, sl]
        drel = drel_ref[0, 0, sl]
        wgt = mask_ref[0, 0, sl]
        w0 = win_ref[t]
        e0 = ewin_ref[t]
        d0 = dwin_ref[t]

        @pl.when(jnp.any(wgt != 0))
        def _(grel=grel, erel=erel, drel=drel, wgt=wgt, w0=w0, e0=e0, d0=d0):
            oh_g = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == grel[:, None]).astype(jnp.bfloat16)
            oh_e = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
                    == erel[:, None]).astype(jnp.bfloat16)
            oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, block), 1)
                    == drel[:, None]).astype(jnp.bfloat16)
            oh_d = (jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
                    == drel[None, :]).astype(jnp.bfloat16)
            ge = _onehot_dot(oh_g, g_ref[pl.ds(w0, window), :], passes)
            other = _onehot_dot(oh_e, xo_ref[pl.ds(e0, window), :], passes)
            mine = _onehot_dot(oh_b, xm_ref[pl.ds(d0, block), :], passes)
            pre = mine + other + bias_ref[0, :][None, :]
            dpre = _dact_fn(act)(pre) * wgt[:, None] * ge
            contrib = _onehot_dot(oh_d, dpre, passes)
            out_ref[pl.ds(d0, block), :] = \
                out_ref[pl.ds(d0, block), :] + contrib


def _win_fused_bwd(g, x_mine, x_other, bias, plan, act, interpret):
    tile, window, block = plan.tile, plan.window, plan.block
    feat = g.shape[-1]
    S = plan.supertile
    G = plan.num_tiles // S
    g = _pad_rows(g.astype(jnp.float32), plan.num_src)
    x_other = _pad_rows(x_other.astype(jnp.float32), plan.num_extra)
    x_mine = _pad_rows(x_mine.astype(jnp.float32), plan.num_dst)
    bias2 = jnp.reshape(bias.astype(jnp.float32), (1, feat))

    stream = pl.BlockSpec((1, 1, S * tile), lambda gg, w, e, d: (gg, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[stream, stream, stream, stream, full, full, full, full],
        out_specs=pl.BlockSpec((plan.num_dst, feat),
                               lambda gg, w, e, d: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_win_fused_bwd_kernel, tile=tile,
                               window=window, block=block,
                               passes=plan.passes, supertile=S, act=act)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_dst, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_tiles * plan.passes
            * (2 * tile * window + 2 * tile * block) * feat,
            bytes_accessed=(plan.num_src + plan.num_extra + 2 * plan.num_dst)
            * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.extra_start, plan.dst_start,
      _reshape_stream(plan.src_rel, plan),
      _reshape_stream(plan.extra_rel, plan),
      _reshape_stream(plan.dst_rel, plan),
      _reshape_stream(plan.mask, plan), bias2, g, x_other, x_mine)
