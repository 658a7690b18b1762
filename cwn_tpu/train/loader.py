"""Batch loader: shuffling, packing, geometric shape-bucketing.

The TPU analogue of the reference's DataLoader/Collater
(/root/reference/data/data_loading.py:44-110): batches are packed host-side
into padded ComplexBatches whose pad sizes are rounded up to powers of two
(per buffer), so XLA compiles only a handful of distinct shapes regardless
of shuffling.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from cwn_tpu.batch import ComplexBatch, PadPlan, pack_complexes
from cwn_tpu.complex import Complex


def _pow2_round(n: int, minimum: int) -> int:
    if n <= minimum:
        return minimum
    return 1 << int(np.ceil(np.log2(n)))


def bucketize_plan(plan: PadPlan, pad_multiple: int = 128) -> PadPlan:
    """Round every pad size up to a power of two (>= pad_multiple)."""
    return PadPlan(
        batch_size=plan.batch_size,
        num_cells=tuple(_pow2_round(n, pad_multiple) for n in plan.num_cells),
        num_up=tuple(_pow2_round(n, pad_multiple) for n in plan.num_up),
        num_down=tuple(_pow2_round(n, pad_multiple) for n in plan.num_down),
        num_boundary=tuple(_pow2_round(n, pad_multiple) for n in plan.num_boundary),
    )


class ComplexLoader:
    """Iterates ComplexBatches over a list of complexes."""

    def __init__(self, complexes: Sequence[Complex], batch_size: int,
                 max_dim: int = 2, shuffle: bool = False, seed: int = 0,
                 pad_multiple: int = 128, plan: Optional[PadPlan] = None,
                 keep_top_upper: bool = False, x_dtype=np.float32,
                 drop_last: bool = False, use_pallas: bool = False,
                 kernel_tile: int = 256, device_prefetch: bool = True,
                 n_shards: int = 1):
        self.complexes = list(complexes)
        self.batch_size = batch_size
        self.max_dim = max_dim
        self.shuffle = shuffle
        self.pad_multiple = pad_multiple
        self.fixed_plan = plan
        self.keep_top_upper = keep_top_upper
        self.x_dtype = x_dtype
        self.drop_last = drop_last
        self.use_pallas = use_pallas and n_shards == 1
        self.kernel_tile = kernel_tile
        self.device_prefetch = device_prefetch
        # n_shards > 1: yield data-parallel batches — each global batch is
        # split into n contiguous shards packed with a SHARED PadPlan and
        # stacked on a leading device axis (shard_map slices it).  The
        # Pallas tile plans are per-shard-shape and are not attached in
        # this mode (the DP step rides the XLA segment-sum path).
        self.n_shards = n_shards
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.complexes)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[ComplexBatch]:
        it = self._iter_host()
        if not self.device_prefetch:
            yield from it
            return
        # One-deep device prefetch: upload batch i+1 (async dispatch of
        # device_put) while batch i computes — hides host->device latency.
        import jax
        pending = None
        for batch in it:
            staged = jax.device_put(batch)
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending

    def _iter_host(self) -> Iterator[ComplexBatch]:
        idx = np.arange(len(self.complexes))
        if self.shuffle:
            self._rng.shuffle(idx)
        self._epoch += 1
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batch_complexes = [self.complexes[i] for i in chunk]
            if self.n_shards > 1:
                yield self._pack_sharded(batch_complexes)
                continue
            plan = self.fixed_plan
            if plan is None:
                plan = PadPlan.for_complexes(
                    batch_complexes, self.max_dim,
                    batch_size=self.batch_size,
                    pad_multiple=self.pad_multiple)
                plan = bucketize_plan(plan, self.pad_multiple)
            packed = pack_complexes(batch_complexes, self.max_dim, plan=plan,
                                    x_dtype=self.x_dtype,
                                    keep_top_upper=self.keep_top_upper)
            if self.use_pallas:
                from cwn_tpu.batch import add_tile_plans
                packed = add_tile_plans(packed, tile=self.kernel_tile,
                                        window=self.kernel_tile,
                                        block=self.kernel_tile)
            yield packed

    def _pack_sharded(self, batch_complexes) -> ComplexBatch:
        """Pack one global batch as n_shards stacked per-device batches.

        Every shard uses the same PadPlan (the bucketized union over the
        shard plans) so shapes agree across the mesh; a short tail batch
        leaves trailing shards empty (y_mask 0 everywhere — the DP loss
        psum weights them out)."""
        import jax
        d = self.n_shards
        per = (self.batch_size + d - 1) // d
        groups = [batch_complexes[i * per:(i + 1) * per] for i in range(d)]
        plan = self.fixed_plan
        if plan is None:
            plans = [PadPlan.for_complexes(g, self.max_dim, batch_size=per,
                                           pad_multiple=self.pad_multiple)
                     for g in groups if g]
            plan = bucketize_plan(PadPlan.union(plans), self.pad_multiple)
        shards = [pack_complexes(g, self.max_dim, plan=plan,
                                 x_dtype=self.x_dtype,
                                 keep_top_upper=self.keep_top_upper)
                  for g in groups]
        shards = _harmonize_shards(shards)
        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *shards)


def _harmonize_shards(shards: List[ComplexBatch]) -> List[ComplexBatch]:
    """Make the pytree structures of same-plan shards identical.

    A shard packed from an empty (or feature-less) tail group leaves
    optional buffers as None where populated shards carry arrays; fill
    those with zeros so the stack/tree-map over shards is well-formed."""
    opt_fields = ("x", "y", "sel_mask", "up_orient", "down_orient")

    def template(getter):
        for s in shards:
            v = getter(s)
            if v is not None:
                return v
        return None

    y_t = template(lambda s: s.y)
    dim_ts = {
        (k, f): template(lambda s, k=k, f=f: getattr(s.dims[k], f))
        for k in range(len(shards[0].dims)) for f in opt_fields}

    out = []
    for s in shards:
        dims = []
        for k, d in enumerate(s.dims):
            repl = {}
            for f in opt_fields:
                t = dim_ts[(k, f)]
                if getattr(d, f) is None and t is not None:
                    repl[f] = np.zeros_like(t)
            dims.append(d.replace(**repl) if repl else d)
        y = s.y if s.y is not None or y_t is None else np.zeros_like(y_t)
        out.append(s.replace(dims=tuple(dims), y=y))
    return out
