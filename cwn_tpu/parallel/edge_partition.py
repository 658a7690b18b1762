"""Edge-partitioned model parallelism for large complexes.

The reference never partitions a single complex's message passing
(SURVEY.md section 5.7); this is the TPU-native axis the build adds — the
analogue of sequence parallelism.  Cells of every dimension are sharded
across the mesh; each device owns a contiguous cell range and the adjacency
edges whose DESTINATION falls in its range (the packer's dst-sorted edge
lists split into per-shard chunks by construction).

Halo exchange is a *requested-rows* all_to_all, not a full all_gather:
at pack time each destination shard records exactly which source rows it
needs from each owner (`*_send` index matrices); at step time every device
gathers its outgoing rows locally and one `lax.all_to_all` over ICI swaps
them.  Traffic per channel is sum(unique halo rows), not num_cells.  The
per-edge source indices are rewritten to positions in the received halo
buffer, so the aggregation stays a local dst-sorted segment-sum and no
reduce collective is needed.  XLA's latency-hiding scheduler overlaps the
all_to_all with the independent dense cell-level matmuls of the same layer.

The flax models run UNCHANGED under shard_map: `shard_batch` marks each
CochainBuffers with `ep_axis`, and the engine (cwn_tpu.mp.propagate,
gather_up/down_attr, boundary_reduce) plus the readout pooling
(cwn_tpu.nn.pool_cells via the ep_pool_axis context) switch to the halo
path when they see it.  BatchNorm statistics ride the existing
sync_bn_axis context, so EP training is bit-for-bit the single-device
program up to summation order.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from cwn_tpu.batch import CochainBuffers, ComplexBatch


def halo_gather(x_local: jnp.ndarray, send_idx: jnp.ndarray,
                axis: str) -> jnp.ndarray:
    """Exchange requested rows over the mesh axis.

    x_local [n_local, F]: this device's cell block.
    send_idx [D, P]: local row ids this device ships to each destination.
    Returns the halo buffer [D*P, F] where row s*P+p is the p-th row
    requested from shard s (matching the positions shard_batch wrote into
    the edge source arrays)."""
    d, p = send_idx.shape
    send = jnp.take(x_local, send_idx.reshape(-1), axis=0,
                    mode="clip").reshape(d, p, x_local.shape[-1])
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    return recv.reshape(d * p, x_local.shape[-1])


def _round8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


@dataclasses.dataclass(frozen=True)
class EPShapes:
    """Per-dim EP buffer shapes: edge capacities and halo widths.

    Two batches packed with the same PadPlan can still need different
    per-shard edge capacities and halo request widths (both are functions
    of which cells the edges touch, not just of the padded sizes).  For
    DP x EP stacking, measure each DP shard's requirements, union them,
    and pass the union to `shard_batch(shapes=...)` so every shard's EP
    pack is stack-compatible.

    caps[k]  = (cap_up, cap_down, cap_b)              per-shard edge slots
    halos[k] = (p_up, p_cob, p_down, p_dsh, p_b)      per-owner halo rows
    """

    caps: Tuple[Tuple[int, int, int], ...]
    halos: Tuple[Tuple[int, int, int, int, int], ...]

    @staticmethod
    def union(shapes: Sequence["EPShapes"]) -> "EPShapes":
        return EPShapes(
            caps=tuple(tuple(max(s.caps[k][i] for s in shapes)
                             for i in range(3))
                       for k in range(len(shapes[0].caps))),
            halos=tuple(tuple(max(s.halos[k][i] for s in shapes)
                              for i in range(5))
                        for k in range(len(shapes[0].halos))))


def _channel_shape(src, dst, mask, n_local: int, n_src_local: int,
                   d: int) -> Tuple[int, int]:
    """Required (edge capacity, halo width) for one channel's shard pack."""
    owner = dst // n_local
    valid = mask != 0
    cap = 0
    p = 8
    for r in range(d):
        sel = (owner == r) & valid
        cap = max(cap, int(sel.sum()))
        reqs, _ = _halo_requests(src, sel, d, n_src_local)
        p = max(p, max((len(q) for q in reqs), default=0))
    return _round8(cap), _round8(p)


def measure_ep_shapes(batch: ComplexBatch, n_devices: int) -> EPShapes:
    """The EPShapes shard_batch would use for this batch (see EPShapes)."""
    d = n_devices
    caps, halos = [], []
    for k, buf in enumerate(batch.dims):
        n_pad = buf.cell_mask.shape[0]
        n_local = n_pad // d
        n_dn_pad = batch.dims[k - 1].cell_mask.shape[0] if k > 0 else d
        n_up_pad = (batch.dims[k + 1].cell_mask.shape[0]
                    if k + 1 < len(batch.dims) else d)
        up_src = buf.up_src.astype(np.int64)
        up_dst = buf.up_dst.astype(np.int64)
        cap_up, p_up = _channel_shape(up_src, up_dst, buf.up_mask,
                                      n_local, n_local, d)
        _, p_cob = _channel_shape(buf.up_cob.astype(np.int64), up_dst,
                                  buf.up_mask, n_local, n_up_pad // d, d)
        dn_src = buf.down_src.astype(np.int64)
        dn_dst = buf.down_dst.astype(np.int64)
        cap_dn, p_dn = _channel_shape(dn_src, dn_dst, buf.down_mask,
                                      n_local, n_local, d)
        _, p_dsh = _channel_shape(buf.down_shared.astype(np.int64), dn_dst,
                                  buf.down_mask, n_local, n_dn_pad // d, d)
        cap_b, p_b = _channel_shape(buf.b_src.astype(np.int64),
                                    buf.b_dst.astype(np.int64), buf.b_mask,
                                    n_local, n_dn_pad // d, d)
        caps.append((cap_up, cap_dn, cap_b))
        halos.append((p_up, p_cob, p_dn, p_dsh, p_b))
    return EPShapes(caps=tuple(caps), halos=tuple(halos))


def _halo_requests(global_src: np.ndarray, valid: np.ndarray, d: int,
                   n_src_local: int):
    """For one destination shard: the rows it needs from every owner.

    Returns (per-owner local-id request lists, global->halo-rank map)."""
    needed = np.unique(global_src[valid]) if valid.any() else \
        np.zeros(0, np.int64)
    owners = needed // n_src_local
    reqs = [needed[owners == s] - s * n_src_local for s in range(d)]
    return reqs, needed


def _shard_channel(src, dst, extras, mask, n_local: int, n_src_local: int,
                   d: int, cap: Optional[int] = None,
                   p: Optional[int] = None):
    """Partition one channel's dst-sorted edges into D shards and build the
    halo plan for its source stream.

    Returns per-shard edge arrays [D, E_cap] (src rewritten to halo
    positions, dst re-based local), per-shard extras, and the send matrix
    [D_sender, D_dst, P].  `cap`/`p` force the edge capacity / halo width
    (must cover this batch's requirements) so several batches produce
    stack-compatible shards (see EPShapes)."""
    owner = dst // n_local
    valid = mask != 0
    sel = [(owner == r) & valid for r in range(d)]
    need_cap = _round8(max((int(s.sum()) for s in sel), default=0))
    assert cap is None or cap >= need_cap, (cap, need_cap)
    cap = need_cap if cap is None else cap

    # Halo requests per destination shard.
    reqs = []
    need_p = 8
    for r in range(d):
        req_r, _ = _halo_requests(src, sel[r], d, n_src_local)
        reqs.append(req_r)
        need_p = max(need_p, max((len(q) for q in req_r), default=0))
    need_p = _round8(need_p)
    assert p is None or p >= need_p, (p, need_p)
    p = need_p if p is None else p

    send = np.zeros((d, d, p), np.int32)        # [sender, dst, P]
    for r in range(d):
        for s in range(d):
            q = reqs[r][s]
            send[s, r, :len(q)] = q

    out_src = np.zeros((d, cap), np.int32)
    out_dst = np.full((d, cap), n_local - 1, np.int32)
    out_mask = np.zeros((d, cap), np.float32)
    out_extras = [np.zeros((d, cap), np.asarray(e).dtype) for e in extras]
    for r in range(d):
        e = int(sel[r].sum())
        if e:
            g = src[sel[r]]
            own = g // n_src_local
            # halo position = owner*P + rank of the row in that owner's
            # request list (lists are sorted-unique -> searchsorted).
            rank = np.empty(e, np.int64)
            for s in range(d):
                m = own == s
                if m.any():
                    rank[m] = np.searchsorted(reqs[r][s],
                                              g[m] - s * n_src_local)
            out_src[r, :e] = (own * p + rank).astype(np.int32)
            out_dst[r, :e] = dst[sel[r]] - r * n_local
            out_mask[r, :e] = mask[sel[r]]
            for o, arr in zip(out_extras, extras):
                o[r, :e] = np.asarray(arr)[sel[r]]
    return out_src, out_dst, out_mask, out_extras, send


def _shard_plans(src, dst, mask, orient, n_src: int, n_local: int, d: int,
                 tile: int = 256, window: int = 256, block: int = 256,
                 passes: int = 2):
    """Per-shard Pallas tile plans for one EP channel (+ transposes).

    src holds HALO positions in [0, n_src); dst is shard-local.  Tile
    counts are data-dependent, so every shard's plan is padded to the
    max across shards (all-masked tiles contribute zeros) and the stack
    over shards is shape-uniform."""
    from cwn_tpu.batch import _pad_plan_tiles
    from cwn_tpu.ops.tiles import build_tile_plan

    geom = dict(tile=tile, window=window, block=block, passes=passes)
    fwds, bwds = [], []
    for r in range(d):
        w = mask[r] if orient is None else mask[r] * orient[r]
        fwds.append(build_tile_plan(src[r], dst[r], w, n_src, n_local,
                                    **geom))
        bwds.append(build_tile_plan(dst[r], src[r], w, n_local, n_src,
                                    **geom))
    tf = max(p.num_tiles for p in fwds)
    tb = max(p.num_tiles for p in bwds)
    stack = lambda ps: jax.tree.map(lambda *xs: np.stack(xs, 0), *ps)
    fwd = stack([_pad_plan_tiles(p, tf).replace(empty=False) for p in fwds])
    bwd = stack([_pad_plan_tiles(p, tb).replace(empty=False) for p in bwds])
    return fwd, bwd


def shard_batch(batch: ComplexBatch, n_devices: int,
                axis: str = "cells",
                shapes: Optional[EPShapes] = None,
                use_pallas: bool = False) -> ComplexBatch:
    """Re-pack a ComplexBatch for edge partitioning over `axis`.

    Cell arrays become [D, N/D, ...]; each channel's edges are dst-shard
    partitioned with halo-position sources; complex-level labels are
    replicated per device.  The result is fed to shard_map with every
    leaf sharded on its leading axis.

    Per-shard edge capacities and halo widths default to this batch's
    requirements; pass `shapes` (a covering EPShapes, e.g. the union over
    several same-plan batches) to force deterministic shard shapes for
    DP x EP stacking."""
    d = n_devices
    new_dims = []
    for k, buf in enumerate(batch.dims):
        kcaps = shapes.caps[k] if shapes is not None else (None,) * 3
        khalos = shapes.halos[k] if shapes is not None else (None,) * 5
        n_pad = buf.cell_mask.shape[0]
        assert n_pad % d == 0, f"padded cells {n_pad} not divisible by {d}"
        n_local = n_pad // d
        # Missing neighbour dims get a dummy d-divisible size; their halo
        # streams are empty/zero and never consumed.
        n_dn_pad = batch.dims[k - 1].cell_mask.shape[0] if k > 0 else d
        n_up_pad = (batch.dims[k + 1].cell_mask.shape[0]
                    if k + 1 < len(batch.dims) else d)
        assert n_dn_pad % d == 0 and n_up_pad % d == 0

        def split_cells(a):
            if a is None:
                return None
            return np.asarray(a).reshape((d, n_local) + a.shape[1:])

        # Upper adjacency: sources in dim k, coboundary attr rows in k+1.
        up_src, up_dst, up_mask, (up_orient,), up_send = _shard_channel(
            buf.up_src.astype(np.int64), buf.up_dst.astype(np.int64),
            [buf.up_orient if buf.up_orient is not None
             else np.zeros_like(buf.up_mask)],
            buf.up_mask, n_local, n_local, d,
            cap=kcaps[0], p=khalos[0])
        up_cob, _, _, _, cob_send = _shard_channel(
            buf.up_cob.astype(np.int64), buf.up_dst.astype(np.int64), [],
            buf.up_mask, n_local, n_up_pad // d, d,
            cap=kcaps[0], p=khalos[1])

        down_src, down_dst, down_mask, (down_orient,), down_send = \
            _shard_channel(
                buf.down_src.astype(np.int64), buf.down_dst.astype(np.int64),
                [buf.down_orient if buf.down_orient is not None
                 else np.zeros_like(buf.down_mask)],
                buf.down_mask, n_local, n_local, d,
                cap=kcaps[1], p=khalos[2])
        down_shared, _, _, _, dsh_send = _shard_channel(
            buf.down_shared.astype(np.int64), buf.down_dst.astype(np.int64),
            [], buf.down_mask, n_local, n_dn_pad // d, d,
            cap=kcaps[1], p=khalos[3])

        b_src, b_dst, b_mask, _, b_send = _shard_channel(
            buf.b_src.astype(np.int64), buf.b_dst.astype(np.int64), [],
            buf.b_mask, n_local, n_dn_pad // d, d,
            cap=kcaps[2], p=khalos[4])

        up_p = up_pt = down_p = down_pt = b_p = b_pt = None
        if use_pallas:
            if up_mask.any():
                up_p, up_pt = _shard_plans(
                    up_src, up_dst, up_mask,
                    up_orient if buf.up_orient is not None else None,
                    d * up_send.shape[-1], n_local, d)
            if down_mask.any():
                down_p, down_pt = _shard_plans(
                    down_src, down_dst, down_mask,
                    down_orient if buf.down_orient is not None else None,
                    d * down_send.shape[-1], n_local, d)
            if b_mask.any():
                b_p, b_pt = _shard_plans(
                    b_src, b_dst, b_mask, None,
                    d * b_send.shape[-1], n_local, d)

        new_dims.append(CochainBuffers(
            x=split_cells(buf.x),
            cell_mask=split_cells(buf.cell_mask),
            batch=split_cells(buf.batch),
            up_src=up_src, up_dst=up_dst, up_cob=up_cob, up_mask=up_mask,
            down_src=down_src, down_dst=down_dst, down_shared=down_shared,
            down_mask=down_mask,
            b_src=b_src, b_dst=b_dst, b_mask=b_mask,
            up_orient=up_orient if buf.up_orient is not None else None,
            down_orient=down_orient if buf.down_orient is not None else None,
            y=split_cells(buf.y), sel_mask=split_cells(buf.sel_mask),
            up_plan=up_p, up_plan_t=up_pt,
            down_plan=down_p, down_plan_t=down_pt,
            b_plan=b_p, b_plan_t=b_pt,
            ep_axis=axis,
            up_send=up_send, cob_send=cob_send,
            down_send=down_send, dsh_send=dsh_send, b_send=b_send))

    rep = lambda a: (None if a is None
                     else np.broadcast_to(np.asarray(a)[None],
                                          (d,) + np.asarray(a).shape).copy())
    return batch.replace(dims=tuple(new_dims), y=rep(batch.y),
                         y_mask=rep(batch.y_mask))


def _pad_stacked_plan(plan, target: int):
    """Pad a [D, tiles, ...]-stacked TilePlan to `target` tiles (axis 1)."""
    t = plan.win_start.shape[1]
    if t >= target:
        return plan

    def tail(a, repeat_last=False):
        if a is None:
            return None
        if repeat_last:
            fills = np.repeat(a[:, -1:], target - t, axis=1)
            return np.concatenate([a, fills], axis=1)
        return np.pad(a, [(0, 0), (0, target - t)]
                      + [(0, 0)] * (a.ndim - 2))

    return plan.replace(
        src_rel=tail(plan.src_rel), dst_rel=tail(plan.dst_rel),
        mask=tail(plan.mask), extra_rel=tail(plan.extra_rel),
        win_start=tail(plan.win_start), extra_start=tail(plan.extra_start),
        out_block=tail(plan.out_block, repeat_last=True),
        dst_start=tail(plan.dst_start))


def shard_batch_stack(batches: Sequence[ComplexBatch], n_ep: int,
                      axis: str = "cells",
                      use_pallas: bool = False) -> ComplexBatch:
    """EP-shard several same-plan ComplexBatches (one per DP shard) with
    harmonised shapes and stack them on a leading data axis.

    The result's leaves are [D_dp, D_ep, ...] — the input format of
    make_dp_ep_train_step over a ('data', 'cells') mesh.  With use_pallas,
    per-shard kernel plans are attached and their (data-dependent) tile
    counts padded to the cross-batch maximum so stacking stays uniform."""
    shapes = EPShapes.union([measure_ep_shapes(b, n_ep) for b in batches])
    shards = [shard_batch(b, n_ep, axis=axis, shapes=shapes,
                          use_pallas=use_pallas)
              for b in batches]
    if use_pallas and len(shards) > 1:
        fields = ("up_plan", "up_plan_t", "down_plan", "down_plan_t",
                  "b_plan", "b_plan_t")
        targets = {}
        for k in range(len(shards[0].dims)):
            for f in fields:
                plans = [getattr(s.dims[k], f) for s in shards]
                have = [p for p in plans if p is not None]
                assert len(have) in (0, len(plans)), (k, f)
                if have:
                    targets[(k, f)] = max(p.win_start.shape[1]
                                          for p in have)
        out = []
        for s in shards:
            dims = []
            for k, d in enumerate(s.dims):
                repl = {f: _pad_stacked_plan(getattr(d, f),
                                             targets[(k, f)])
                        for f in fields if getattr(d, f) is not None}
                dims.append(d.replace(**repl) if repl else d)
            out.append(s.replace(dims=tuple(dims)))
        shards = out
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *shards)


def make_ep_train_step(model, tx, mesh: Mesh, loss_fn: Callable,
                       axis: str = "cells", donate: bool = True,
                       inject_lr: bool = False):
    """Jitted edge-partitioned train step: the UNMODIFIED flax model runs
    under shard_map on a cell-sharded batch; halo all_to_alls live inside
    propagate; BN stats and readout pooling psum over the axis.

    Returns step(params, batch_stats, opt_state, ep_batch, rng[, lr])."""
    from cwn_tpu.nn import ep_pool_axis, sync_bn_axis

    def body(params, batch_stats, batch, rng):
        batch_local = jax.tree.map(lambda a: a[0], batch)

        def loss_of(p):
            with sync_bn_axis(axis), ep_pool_axis(axis):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch_local,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
            s, w = loss_fn(out, batch_local.y, batch_local.y_mask)
            return s / jnp.maximum(w, 1.0), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        # Pooled outputs are replicated, so loss/grads agree across the
        # axis up to summation order; pmean re-synchronises exactly.
        grads = jax.lax.pmean(grads, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        return jax.lax.pmean(loss, axis), grads, new_bs

    rep = P()
    mapped = jax.shard_map(body, mesh=mesh,
                           in_specs=(rep, rep, P(axis), rep),
                           out_specs=(rep, rep, rep), check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(params, batch_stats, opt_state, batch, rng):
        loss, grads, new_bs = mapped(params, batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step_lr(params, batch_stats, opt_state, batch, rng, lr):
        loss, grads, new_bs = mapped(params, batch_stats, batch, rng)
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    return step_lr if inject_lr else step


def make_dp_ep_train_step(model, tx, mesh: Mesh, loss_fn: Callable,
                          dp_axis: str = "data", ep_axis: str = "cells",
                          donate: bool = True, inject_lr: bool = False):
    """2-D mesh training: data parallel over complex shards x edge
    partitioning of each shard's cells.

    `batch` leaves are stacked [D_dp, D_ep, ...] (stack shard_batch outputs
    of per-dp-shard packs built with one shared PadPlan).  BN statistics
    psum over BOTH axes (single-device global-batch semantics); pooling
    psums over the cell axis only; the loss weight-normalises over the
    data axis like make_dp_train_step."""
    from cwn_tpu.nn import ep_pool_axis, sync_bn_axis

    def body(params, batch_stats, batch, rng):
        batch_local = jax.tree.map(lambda a: a[0, 0], batch)

        def loss_of(p):
            with sync_bn_axis((dp_axis, ep_axis)), ep_pool_axis(ep_axis):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch_local,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
            s, w = loss_fn(out, batch_local.y, batch_local.y_mask)
            total_w = jax.lax.psum(w, dp_axis)
            loss = jax.lax.psum(s, dp_axis) / jnp.maximum(total_w, 1.0)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        grads = jax.lax.pmean(grads, (dp_axis, ep_axis))
        new_bs = jax.lax.pmean(new_bs, (dp_axis, ep_axis))
        return jax.lax.pmean(loss, (dp_axis, ep_axis)), grads, new_bs

    rep = P()
    mapped = jax.shard_map(body, mesh=mesh,
                           in_specs=(rep, rep, P(dp_axis, ep_axis), rep),
                           out_specs=(rep, rep, rep), check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(params, batch_stats, opt_state, batch, rng):
        loss, grads, new_bs = mapped(params, batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step_lr(params, batch_stats, opt_state, batch, rng, lr):
        loss, grads, new_bs = mapped(params, batch_stats, batch, rng)
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    return step_lr if inject_lr else step


def ep_forward(model, variables, ep_batch, mesh: Mesh, axis: str = "cells"):
    """Jitted EP inference: replicated output of the unmodified model."""
    from cwn_tpu.nn import ep_pool_axis

    def body(variables, batch):
        batch_local = jax.tree.map(lambda a: a[0], batch)
        with ep_pool_axis(axis):
            return model.apply(variables, batch_local, train=False)

    mapped = jax.shard_map(body, mesh=mesh, in_specs=(P(), P(axis)),
                           out_specs=P(), check_vma=False)
    return jax.jit(mapped)(variables, ep_batch)
