"""The functional cochain message-passing engine.

Replaces the reference's reflection-driven `CochainMessagePassing.propagate`
(/root/reference/mp/cell_mp.py:357-524) with explicit dataflow over the
padded buffers of `cwn_tpu.batch.CochainBuffers`:

  up channel:        msg = f_up(x[up_src], up_attr)        -> segsum into up_dst
  down channel:      msg = f_down(x[down_src], down_attr)  -> segsum into down_dst
  boundary channel:  msg = f_b(boundary_attr[b_src])       -> segsum into b_dst

where `up_attr` is the feature row of the shared coboundary
(x_{k+1}[up_cob]) and `down_attr` of the shared boundary
(x_{k-1}[down_shared]); orientation models override these with per-edge
+-1 signs.  Missing channels yield zeros, matching the reference's
zero-fill update (/root/reference/mp/cell_mp.py:517-522).

All reductions are masked, destination-sorted segment reductions with a
static segment count — XLA compiles them to sorted segment sums on TPU.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cwn_tpu.batch import CochainBuffers
from cwn_tpu.ops import segment_reduce


def halo_gather_src(buf, x_source, send):
    """The edge-partitioned halo buffer for one channel ([D*P, F])."""
    from cwn_tpu.parallel.edge_partition import halo_gather
    return halo_gather(x_source, send, buf.ep_axis)


def _source_rows(buf, x_source, send, positions):
    """Rows of x_source addressed by per-edge `positions` — a local take,
    or a halo all_to_all + take in edge-partitioned mode."""
    if buf.ep_axis is not None and send is not None:
        halo = halo_gather_src(buf, x_source, send)
        return jnp.take(halo, positions, axis=0, mode='clip')
    return jnp.take(x_source, positions, axis=0, mode='clip')


def gather_up_attr(buf: CochainBuffers, x_up: Optional[jnp.ndarray]):
    """Features of the shared coboundary of each upper edge ([E_up, F])."""
    if x_up is None:
        return None
    return _source_rows(buf, x_up, buf.cob_send, buf.up_cob)


def gather_down_attr(buf: CochainBuffers, x_down: Optional[jnp.ndarray]):
    """Features of the shared boundary of each lower edge ([E_dn, F])."""
    if x_down is None:
        return None
    return _source_rows(buf, x_down, buf.dsh_send, buf.down_shared)


def _identity_channel(x_source, plan, plan_t, n):
    """Fused Pallas gather+weight+segment-sum for identity messages."""
    from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
    return segment_spmm_ad(x_source, plan, plan_t)[:n]


def _uniform_channel(x_source, plan, plan_t, n_src_struct: int,
                     n_dst_struct: int, count: int, n: int):
    """Shared-structure batched identity channel.

    Every complex in the batch has the SAME adjacency (and orientations);
    the arena holds their cells complex-major, so [count*n_struct, F]
    reshapes to [n_struct, count*F] (cell-major) and ONE small SpMM over
    the structure plan applies the adjacency to all complexes at once —
    the value operand is count*F lanes wide, which is what the MXU wants.

    The plan is a BandedPlan (dense A-tile matmuls; cwn_tpu.ops.banded)
    when the structure is banded in cell order, else a one-hot TilePlan —
    spmm_ad dispatches on the type.
    """
    from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
    f = x_source.shape[-1]
    xb = x_source[:count * n_src_struct].reshape(count, n_src_struct, f)
    xb = jnp.swapaxes(xb, 0, 1).reshape(n_src_struct, count * f)
    # Mosaic requires the lane (last) dim of kernel loads to tile the
    # 128-lane registers once it exceeds 128; pad the flattened width.
    w = count * f
    w_pad = ((w + 127) // 128) * 128 if w > 128 else w
    if w_pad != w:
        xb = jnp.pad(xb, ((0, 0), (0, w_pad - w)))
    out = segment_spmm_ad(xb, plan, plan_t)[:n_dst_struct, :w]
    out = out.reshape(n_dst_struct, count, f)
    out = jnp.swapaxes(out, 0, 1).reshape(count * n_dst_struct, f)
    return jnp.pad(out, ((0, n - count * n_dst_struct), (0, 0)))


def _uniform_usable(plan, buf, x) -> bool:
    return (plan is not None and buf.uni_count is not None
            and x.dtype == jnp.float32 and buf.ep_axis is None)


def fused_mlp_channel(x, x_shared, kernel, bias, plan, plan_bs, plan_bc,
                      act: str, n: int):
    """Fused non-identity channel: segsum_dst(act(W [x_j ; attr] + b)).

    Splits the message Linear into two dense cell-level matmuls and runs
    the per-edge gather+act+segment-sum as one Pallas kernel per direction
    (see cwn_tpu.ops.pallas_segment.fused_message_spmm).  Exactly the
    reference's `msg_up_nn(cat[up_x_j, up_attr])` message
    (/root/reference/mp/layers.py:184-189) with the [E, F] intermediates
    never leaving VMEM."""
    from cwn_tpu.ops.pallas_segment import fused_message_spmm
    f = x.shape[-1]
    xs = x @ kernel[:f]
    xu = x_shared @ kernel[f:]
    return fused_message_spmm(xs, xu, bias, plan, plan_bs, plan_bc, act)[:n]


def factorized_up_usable(buf, cob_buf, x, x_shared,
                         min_ratio: float = 4.0) -> bool:
    """The O(memberships) upper channel beats the O(pairs) XLA fallback
    when the pair list is much longer than the membership list (i.e.
    coboundaries have many members — rings).  When Pallas tile plans ARE
    attached, the pairwise MXU kernels still win (the factorized
    reductions currently run as XLA scatter fusions; see PERF.md round-4
    trace), so the kernel path keeps precedence.  Static shapes only, so
    the branch is jit-stable per batch shape."""
    return (buf.fac_src is not None and cob_buf is not None
            and x_shared is not None and buf.ep_axis is None
            and buf.up_orient is None and buf.up_plan is None
            and x.dtype == jnp.float32 and x_shared.dtype == jnp.float32
            and buf.up_src.shape[0] >= min_ratio * buf.fac_src.shape[0])


def factorized_kernel_usable(buf, cob_buf, x, x_shared,
                             min_ratio: float = 2.0) -> bool:
    """Kernelized factorized channel: the three membership reductions run
    as Pallas identity SpMMs (plans built by add_tile_plans).  Beats the
    pairwise kernels whenever the pair list meaningfully exceeds the
    membership list — the per-tile work is identical, there are just
    fewer tiles."""
    return (buf.fac_s_plan is not None and buf.fac_o_plan is not None
            and buf.fac_g_plan is not None and cob_buf is not None
            and x_shared is not None and buf.ep_axis is None
            and buf.up_orient is None
            and x.dtype == jnp.float32 and x_shared.dtype == jnp.float32
            and x.shape[-1] >= MIN_KERNEL_FEAT
            and buf.up_src.shape[0] >= min_ratio * buf.fac_src.shape[0])


def factorized_up_channel_kernel(x, x_shared, kernel, bias, buf, cob_buf,
                                 act_fn, n: int):
    """factorized_up_channel with the three reductions on the MXU kernels.

    t1 gathers/activation stay in XLA (pure gathers fuse well); the
    segment sums — the part XLA lowers to slow scatter fusions — run as
    identity one-hot SpMMs over membership-position plans (full-occupancy
    tiles: the position stream is ascending by construction)."""
    from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
    f = x.shape[-1]
    xs = x @ kernel[:f]
    xu = x_shared @ kernel[f:]
    b_row = bias.reshape(1, -1)

    def t(src_ids, cob_ids, mask):
        pre = (jnp.take(xs, src_ids, axis=0, mode="clip")
               + jnp.take(xu, cob_ids, axis=0, mode="clip") + b_row)
        return act_fn(pre) * mask[:, None]

    n_up = x_shared.shape[0]
    t1 = t(cob_buf.b_src, cob_buf.b_dst, cob_buf.b_mask)
    s_c = segment_spmm_ad(t1, buf.fac_s_plan, buf.fac_s_plan_t)[:n_up]
    own = t(buf.fac_src, buf.fac_cob, buf.fac_mask)
    if buf.fac_go_plan is not None:
        # Launch-consolidated form: one kernel over the concatenated
        # source arena [S_c ; own] yields both reductions in adjacent
        # output sections (plan built by batch.add_tile_plans).
        from cwn_tpu.ops.pallas_segment import _pad_rows
        s_split, d_split = buf.fac_go_split
        cat = jnp.concatenate(
            [_pad_rows(s_c, s_split),
             _pad_rows(own, buf.fac_go_plan.num_src - s_split)], axis=0)
        outc = segment_spmm_ad(cat, buf.fac_go_plan, buf.fac_go_plan_t)
        return outc[:n] - outc[d_split:d_split + n]
    return (segment_spmm_ad(s_c, buf.fac_g_plan, buf.fac_g_plan_t)[:n]
            - segment_spmm_ad(own, buf.fac_o_plan, buf.fac_o_plan_t)[:n])


def factorized_up_channel(x, x_shared, kernel, bias, buf, cob_buf, act_fn,
                          n: int):
    """Exact pairwise upper-channel sum in O(memberships) work.

    out[i] = sum over pairs (j -> i sharing coboundary c) of
             act(xs[j] + xu[c] + b)
           = sum_{c ni i} (S_c - act(xs[i] + xu[c] + b)),
             S_c = sum_{j in c} act(xs[j] + xu[c] + b)

    because the message depends only on the SOURCE and the shared
    coboundary, never the destination.  `cob_buf` (dim k+1) provides the
    membership list sorted by coboundary (its boundary structure); buf's
    fac_* arrays are the same list sorted by member.  Term-for-term equal
    to the pairwise path (same addends, different association order).
    Replaces the dominant O(r^2) ring tiles of the molecular step
    (reference comparator keeps the pairwise form:
    /root/reference/data/utils.py upper-adjacency construction +
    /root/reference/mp/cell_mp.py scatter aggregation).
    """
    f = x.shape[-1]
    xs = x @ kernel[:f]
    xu = x_shared @ kernel[f:]
    b_row = bias.reshape(1, -1)

    def t(src_ids, cob_ids, mask):
        pre = (jnp.take(xs, src_ids, axis=0, mode="clip")
               + jnp.take(xu, cob_ids, axis=0, mode="clip") + b_row)
        return act_fn(pre) * mask[:, None]

    # Coboundary-sorted pass: per-coboundary member sums S_c.
    s_c = segment_reduce("add")(
        t(cob_buf.b_src, cob_buf.b_dst, cob_buf.b_mask), cob_buf.b_dst,
        x_shared.shape[0], indices_are_sorted=True)
    # Member-sorted pass: each member collects its coboundaries' S_c and
    # subtracts its own contribution (the j = i pair is not an upper edge).
    own = t(buf.fac_src, buf.fac_cob, buf.fac_mask)
    # MISCOMPILATION GUARD (XLA:TPU): without this barrier, fusing the
    # gather+act recompute of `own` into the final scatter-add compiles to
    # wrong results at some shapes (observed on CSL batches: jitted output
    # off by O(100) while eager/CPU/numpy agree; returning `own` as an
    # extra output, or this barrier, restores correctness).  Keep the
    # [M, F] term materialised.
    own = jax.lax.optimization_barrier(own)
    tot = jnp.take(s_c, buf.fac_cob, axis=0, mode="clip") \
        * buf.fac_mask[:, None]
    return segment_reduce("add")(
        tot - own, buf.fac_src, n, indices_are_sorted=True)


# Below this feature width the one-hot MXU formulation wastes most of its
# 128 lanes (a [N, 1] stream still costs full 128-lane rows in VMEM) and
# the XLA gather+segsum fallback wins; the molecular configs (emb 48-160)
# all sit above it.
MIN_KERNEL_FEAT = 32


def fused_channel_usable(buf_plan, buf_plan_bs, buf_plan_bc, x, x_shared,
                         act: str) -> bool:
    from cwn_tpu.ops.pallas_segment import FUSED_ACTS
    return (buf_plan is not None and buf_plan_bs is not None
            and buf_plan_bc is not None and x_shared is not None
            and x.dtype == jnp.float32 and x_shared.dtype == jnp.float32
            and x.shape[-1] >= MIN_KERNEL_FEAT
            and act in FUSED_ACTS)


def _plan_usable(plan, x):
    """Kernel path requires f32 (the fp64 SR path keeps the XLA oracle)
    and a feature width that doesn't waste the 128-lane MXU."""
    return (plan is not None and x.dtype == jnp.float32
            and x.shape[-1] >= MIN_KERNEL_FEAT)


def propagate(buf: CochainBuffers,
              x: jnp.ndarray,
              up_attr: Optional[jnp.ndarray] = None,
              down_attr: Optional[jnp.ndarray] = None,
              boundary_attr: Optional[jnp.ndarray] = None,
              message_up: Optional[Callable] = None,
              message_down: Optional[Callable] = None,
              message_boundary: Optional[Callable] = None,
              aggr_up: str = "add",
              aggr_down: str = "add",
              aggr_boundary: str = "add",
              up_identity: bool = False,
              down_identity: bool = False,
              boundary_identity: bool = False):
    """Run the three adjacency channels; returns (up_out, down_out, boundary_out).

    Channels run when a message function is given AND the buffer has slots;
    otherwise their output is zeros shaped like the message output (here:
    like x, since all shipped message functions preserve feature size).

    *_identity declares that the message function is the identity on the
    gathered features (possibly orientation-weighted — weights live in the
    tile plan); when the batch carries Pallas tile plans, those channels run
    as fused one-hot SpMM kernels on the MXU, with the XLA gather+segsum as
    the fallback/oracle path.
    """
    n = x.shape[0]
    zeros = jnp.zeros_like(x)

    up_out = zeros
    if message_up is not None and buf.up_src.shape[0] > 0:
        if up_identity and aggr_up == "add" \
                and _uniform_usable(buf.uni_up_plan, buf, x):
            up_out = _uniform_channel(x, buf.uni_up_plan, buf.uni_up_plan_t,
                                      buf.uni_cells, buf.uni_cells,
                                      buf.uni_count, n)
        elif up_identity and _plan_usable(buf.up_plan, x) and aggr_up == "add":
            # EP-sharded plans address the halo buffer, not local cells.
            src_x = x if buf.ep_axis is None else \
                halo_gather_src(buf, x, buf.up_send)
            up_out = _identity_channel(src_x, buf.up_plan, buf.up_plan_t, n)
        else:
            up_x_j = _source_rows(buf, x, buf.up_send, buf.up_src)
            msg = message_up(up_x_j, up_attr)
            up_out = segment_reduce(aggr_up)(
                msg, buf.up_dst, n, mask=buf.up_mask, indices_are_sorted=True)

    down_out = zeros
    if message_down is not None and buf.down_src.shape[0] > 0:
        if down_identity and aggr_down == "add" \
                and _uniform_usable(buf.uni_down_plan, buf, x):
            down_out = _uniform_channel(
                x, buf.uni_down_plan, buf.uni_down_plan_t,
                buf.uni_cells, buf.uni_cells, buf.uni_count, n)
        elif down_identity and _plan_usable(buf.down_plan, x) and aggr_down == "add":
            src_x = x if buf.ep_axis is None else \
                halo_gather_src(buf, x, buf.down_send)
            down_out = _identity_channel(src_x, buf.down_plan,
                                         buf.down_plan_t, n)
        else:
            down_x_j = _source_rows(buf, x, buf.down_send, buf.down_src)
            msg = message_down(down_x_j, down_attr)
            down_out = segment_reduce(aggr_down)(
                msg, buf.down_dst, n, mask=buf.down_mask,
                indices_are_sorted=True)

    boundary_out = zeros
    if message_boundary is not None and boundary_attr is not None \
            and buf.b_src.shape[0] > 0:
        if boundary_identity and aggr_boundary == "add" \
                and _uniform_usable(buf.uni_b_plan, buf, boundary_attr):
            boundary_out = _uniform_channel(
                boundary_attr, buf.uni_b_plan, buf.uni_b_plan_t,
                buf.uni_b_src_cells, buf.uni_cells, buf.uni_count, n)
        elif boundary_identity and _plan_usable(buf.b_plan, boundary_attr) \
                and aggr_boundary == "add":
            src_b = boundary_attr if buf.ep_axis is None else \
                halo_gather_src(buf, boundary_attr, buf.b_send)
            boundary_out = _identity_channel(src_b, buf.b_plan,
                                             buf.b_plan_t, n)
        else:
            boundary_x_j = _source_rows(buf, boundary_attr, buf.b_send,
                                        buf.b_src)
            msg = message_boundary(boundary_x_j)
            boundary_out = segment_reduce(aggr_boundary)(
                msg, buf.b_dst, n, mask=buf.b_mask, indices_are_sorted=True)

    return up_out, down_out, boundary_out


def boundary_all(data, xs):
    """Launch-consolidated identity boundary channels: every dim's
    segsum_{b_dst}(x_{k-1}[b_src]) as ONE windowed kernel over the
    concatenated pre-layer cell arenas (plan built by
    batch.add_tile_plans; there is no cross-dim dependency because dim k
    reads dim k-1's PRE-layer features).

    Returns {k: [n_k, F]} for the covered dims, or None when the batch
    carries no combined plan or a gate fails (dtype, EP mode, feature
    width) — callers fall back to per-dim propagate."""
    plan = getattr(data, "b_all_plan", None)
    if plan is None or data.b_all_dims is None:
        return None
    srcs = [xs[k - 1] for k in data.b_all_dims if k - 1 < len(xs)]
    if (len(srcs) != len(data.b_all_dims)
            or any(data.dims[k].ep_axis is not None for k in data.b_all_dims)
            or not all(_plan_usable(plan, x) for x in srcs)):
        return None
    from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
    so, do = data.b_all_src_off, data.b_all_dst_off
    parts = []
    for i, x in enumerate(srcs):
        span = so[i + 1] - so[i]
        if x.shape[0] < span:
            x = jnp.pad(x, ((0, span - x.shape[0]), (0, 0)))
        parts.append(x[:span])
    out = segment_spmm_ad(jnp.concatenate(parts, axis=0), plan,
                          data.b_all_plan_t)
    return {k: out[do[i]:do[i] + data.dims[k].cell_mask.shape[0]]
            for i, k in enumerate(data.b_all_dims)}


def boundary_reduce(boundary_x: jnp.ndarray, buf: CochainBuffers,
                    num_cells: int, reduce: str = "add") -> jnp.ndarray:
    """Reduce boundary-cell features into each cell (InitReduceConv,
    /root/reference/mp/layers.py:473-487)."""
    if reduce == "add" and _uniform_usable(buf.uni_b_plan, buf, boundary_x):
        return _uniform_channel(boundary_x, buf.uni_b_plan, buf.uni_b_plan_t,
                                buf.uni_b_src_cells, buf.uni_cells,
                                buf.uni_count, num_cells)
    if reduce == "add" and _plan_usable(buf.b_plan, boundary_x):
        src_b = boundary_x if buf.ep_axis is None else \
            halo_gather_src(buf, boundary_x, buf.b_send)
        return _identity_channel(src_b, buf.b_plan, buf.b_plan_t,
                                 num_cells)
    feats = _source_rows(buf, boundary_x, buf.b_send, buf.b_src)
    return segment_reduce(reduce)(
        feats, buf.b_dst, num_cells, mask=buf.b_mask, indices_are_sorted=True)
