"""Edge-partitioned model parallelism for large complexes.

The reference never partitions a single complex's message passing
(SURVEY.md section 5.7); this is the TPU-native axis the build adds — the
analogue of sequence parallelism.  Cells of every dimension are sharded
across the mesh; each device owns a contiguous cell range and the adjacency
edges whose DESTINATION falls in its range (the packer's dst-sorted edge
lists split into equal chunks by construction).  Source cell features are
exchanged with one all_gather over ICI per channel (the halo), the local
gather+segment-sum runs on local edges only, and outputs are already
dst-local so no reduce is needed:

    out_local = segsum_local( msg(allgather(x)[src_local]) )

Packing: `shard_batch` splits a ComplexBatch into per-device shards with a
leading device axis.  Edges are padded per shard; cell ranges are equal
N/D blocks.  The train/forward step runs under shard_map with psum'd
gradients (data parallel composes on a second mesh axis).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cwn_tpu.batch import CochainBuffers, ComplexBatch


def _split_cells(n_pad: int, d: int):
    assert n_pad % d == 0, f"padded cells {n_pad} not divisible by mesh {d}"
    return n_pad // d


def _shard_edges(src, dst, extras, mask, n_local: int, d: int, trash_global: int):
    """Partition dst-sorted edges by destination shard; pad each shard to the
    max shard size (rounded to 128).  dst is re-based to local coordinates;
    src stays GLOBAL (sources are read from the all-gathered halo)."""
    owner = dst // n_local
    shards = []
    max_e = 0
    for r in range(d):
        sel = (owner == r) & (mask != 0)
        shards.append(sel)
        max_e = max(max_e, int(sel.sum()))
    cap = ((max_e + 127) // 128) * 128 if max_e else 128

    out_src = np.zeros((d, cap), np.int32)
    out_dst = np.zeros((d, cap), np.int32)
    out_mask = np.zeros((d, cap), np.float32)
    out_extras = [np.zeros((d, cap), e.dtype) for e in extras]
    for r in range(d):
        sel = shards[r]
        e = int(sel.sum())
        out_src[r, :e] = src[sel]
        out_dst[r, :e] = dst[sel] - r * n_local
        out_mask[r, :e] = mask[sel]
        out_src[r, e:] = trash_global
        out_dst[r, e:] = n_local - 1
        for o, arr in zip(out_extras, extras):
            o[r, :e] = arr[sel]
    return out_src, out_dst, out_mask, out_extras


def shard_batch(batch: ComplexBatch, n_devices: int) -> ComplexBatch:
    """Re-pack a ComplexBatch with a leading device axis on every buffer.

    Cell arrays become [D, N/D, ...]; edge arrays [D, E_shard]; the model
    runs under shard_map with this axis mapped over the mesh."""
    d = n_devices
    new_dims = []
    for k, buf in enumerate(batch.dims):
        n_pad = buf.cell_mask.shape[0]
        n_local = _split_cells(n_pad, d)
        trash = n_pad - 1

        def split_cells(a):
            if a is None:
                return None
            return np.asarray(a).reshape((d, n_local) + a.shape[1:])

        up_src, up_dst, up_mask, (up_cob, up_orient) = _shard_edges(
            buf.up_src, buf.up_dst,
            [buf.up_cob,
             buf.up_orient if buf.up_orient is not None
             else np.zeros_like(buf.up_mask)],
            buf.up_mask, n_local, d, trash)
        down_src, down_dst, down_mask, (down_shared, down_orient) = \
            _shard_edges(
                buf.down_src, buf.down_dst,
                [buf.down_shared,
                 buf.down_orient if buf.down_orient is not None
                 else np.zeros_like(buf.down_mask)],
                buf.down_mask, n_local, d, trash)
        n_dn_pad = batch.dims[k - 1].cell_mask.shape[0] if k > 0 else 1
        b_src, b_dst, b_mask, _ = _shard_edges(
            buf.b_src, buf.b_dst, [], buf.b_mask, n_local, d, n_dn_pad - 1)

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
            y=split_cells(buf.y), sel_mask=split_cells(buf.sel_mask)))
    return batch.replace(dims=tuple(new_dims))


def ep_propagate(buf_local: CochainBuffers, x_local: jnp.ndarray,
                 axis: str = "cells",
                 boundary_attr_local: jnp.ndarray = None):
    """Edge-partitioned propagate for identity channels inside shard_map.

    x_local: [N/D, F] this device's cell block.  Returns the three channel
    outputs for the local cells.  Halo exchange = one all_gather per used
    channel source; aggregation stays local (dst-partitioned edges).
    """
    from cwn_tpu.ops import segment_sum

    n_local = x_local.shape[0]
    # Halo: full x, gathered over the mesh axis (tiled -> [N, F]).
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)

    up_out = jnp.zeros_like(x_local)
    if buf_local.up_src.shape[0] > 0:
        m = jnp.take(x_full, buf_local.up_src, axis=0, mode="clip")
        up_out = segment_sum(m, buf_local.up_dst, n_local,
                             mask=buf_local.up_mask, indices_are_sorted=True)

    down_out = jnp.zeros_like(x_local)
    if buf_local.down_src.shape[0] > 0:
        m = jnp.take(x_full, buf_local.down_src, axis=0, mode="clip")
        down_out = segment_sum(m, buf_local.down_dst, n_local,
                               mask=buf_local.down_mask,
                               indices_are_sorted=True)

    boundary_out = jnp.zeros_like(x_local)
    if boundary_attr_local is not None and buf_local.b_src.shape[0] > 0:
        battr_full = jax.lax.all_gather(boundary_attr_local, axis, tiled=True)
        m = jnp.take(battr_full, buf_local.b_src, axis=0, mode="clip")
        boundary_out = segment_sum(m, buf_local.b_dst, n_local,
                                   mask=buf_local.b_mask,
                                   indices_are_sorted=True)
    return up_out, down_out, boundary_out
