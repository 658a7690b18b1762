"""Masked segment reductions (XLA path).

These replace torch_scatter.scatter(add/mean/max) (the aggregation engine of
the reference, /root/reference/mp/cell_mp.py:423-479) with static-shape JAX
segment ops.  All take an optional boolean/float mask over the data rows;
masked-out rows contribute nothing (sum/mean) or -inf (max, with empty
segments clamped to 0 like torch_scatter).

Edges are sorted by destination at packing time (host-side), so callers pass
`indices_are_sorted=True` and XLA lowers to an efficient sorted-segment
reduction instead of a general scatter.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    if mask is not None:
        data = data * mask.astype(data.dtype)[:, None]
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 mask: Optional[jnp.ndarray] = None,
                 indices_are_sorted: bool = False) -> jnp.ndarray:
    if mask is None:
        ones = jnp.ones((data.shape[0],), dtype=data.dtype)
    else:
        ones = mask.astype(data.dtype)
        data = data * ones[:, None]
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    return total / jnp.maximum(count, 1.0)[:, None]


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    neg_inf = jnp.array(-jnp.inf, dtype=data.dtype)
    if mask is not None:
        data = jnp.where(mask.astype(bool)[:, None], data, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    # torch_scatter leaves empty segments at 0.
    return jnp.where(jnp.isfinite(out), out, 0.0)


_REDUCERS = {
    "add": segment_sum,
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
}


def segment_reduce(reduce: str):
    try:
        return _REDUCERS[reduce]
    except KeyError:
        raise ValueError(f"Unknown reduction '{reduce}'") from None


def masked_segment_reduce(data, segment_ids, num_segments, mask, reduce="add",
                          indices_are_sorted: bool = False):
    return segment_reduce(reduce)(data, segment_ids, num_segments, mask=mask,
                                  indices_are_sorted=indices_are_sorted)
