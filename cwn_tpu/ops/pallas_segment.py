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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cwn_tpu.ops.tiles import TilePlan

# VMEM budget for keeping x resident on-chip (bytes).
_X_VMEM_LIMIT = 8 * 1024 * 1024

# Global interpret-mode switch (tests on CPU flip this on).
_FORCE_INTERPRET = False


def set_interpret(value: bool):
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(value)


def _split3(v):
    """f32 -> three bf16 terms summing (in f32) to v exactly to ~2^-24."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return h1, h2, h3


def _exact_onehot_dot(onehot_bf16, v):
    """onehot @ v with f32 accuracy via 3 native bf16 MXU passes.

    The one-hot operand is exact in bf16, so only v needs splitting — this
    matches Precision.HIGHEST accuracy at half the passes."""
    t1, t2, t3 = _split3(v)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(onehot_bf16, t1) + d(onehot_bf16, t2) + d(onehot_bf16, t3)


def _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          xwin_get, *, tile, window, block):
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
        msg = _exact_onehot_dot(onehot_s, xwin_get()) * weight[:, None]
        contrib = _exact_onehot_dot(onehot_d, msg)
        out_ref[...] = out_ref[...] + contrib


def _kernel_vmem(win_ref, blk_ref, srcrel_ref, dstrel_ref, mask_ref,
                 x_ref, out_ref, *, tile, window, block):
    t = pl.program_id(0)
    w0 = win_ref[t]
    _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          lambda: x_ref[pl.ds(w0, window), :],
          tile=tile, window=window, block=block)


def _kernel_hbm(win_ref, blk_ref, srcrel_ref, dstrel_ref, mask_ref,
                x_ref, out_ref, xwin, sem, *, tile, window, block):
    t = pl.program_id(0)
    w0 = win_ref[t]
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(w0, window), :], xwin, sem)
    cp.start()
    cp.wait()
    _body(t, blk_ref, srcrel_ref, dstrel_ref, mask_ref, out_ref,
          lambda: xwin[...], tile=tile, window=window, block=block)


def segment_spmm(x: jnp.ndarray, plan: TilePlan,
                 interpret: bool = False) -> jnp.ndarray:
    """out[d] = sum_{e: dst[e]=d} weight[e] * x[src[e]]  -> [num_dst, F].

    x is padded to plan.num_src rows; output has plan.num_dst rows (both
    padded; callers slice)."""
    tile, window, block = plan.tile, plan.window, plan.block
    feat = x.shape[-1]
    if x.shape[0] < plan.num_src:
        x = jnp.pad(x, ((0, plan.num_src - x.shape[0]), (0, 0)))
    n_tiles = plan.num_tiles
    interpret = interpret or _FORCE_INTERPRET
    x_resident = plan.num_src * feat * 4 <= _X_VMEM_LIMIT

    tile_spec = pl.BlockSpec((1, 1, tile), lambda t, w, b: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    if x_resident:
        kernel = functools.partial(_kernel_vmem, tile=tile, window=window,
                                   block=block)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        kernel = functools.partial(_kernel_hbm, tile=tile, window=window,
                                   block=block)
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
            flops=2 * n_tiles * (tile * window + tile * block) * feat,
            bytes_accessed=n_tiles * (window + block) * feat * 4,
            transcendentals=0),
    )(plan.win_start, plan.out_block, plan.src_rel, plan.dst_rel,
      plan.mask, x.astype(jnp.float32))
    return out


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
