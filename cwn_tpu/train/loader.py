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


def fused_device_put(batch):
    """Upload a host batch as ONE byte buffer + device-side unpack.

    A packed batch is ~50 small arrays; over a tunneled chip each leaf's
    device_put pays a round trip, which costs more than the bytes
    (measured ~2-3 s/epoch on ZINC-sized batches).  Concatenate every
    numpy leaf's bytes host-side, ship once, and slice/bitcast on device
    (jitted per shape signature).  Leaves already on device pass through.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(batch)
    np_leaves = []
    for l in leaves:
        if not isinstance(l, np.ndarray):
            return jax.device_put(batch)       # mixed host/device: plain put
        # Coerce like device_put does with x64 disabled.
        if l.dtype == np.int64:
            l = l.astype(np.int32)
        elif l.dtype == np.float64:
            l = l.astype(np.float32)
        np_leaves.append(np.ascontiguousarray(l))
    sig = tuple((l.shape, l.dtype.str) for l in np_leaves)

    buf = np.concatenate([l.view(np.uint8).reshape(-1) for l in np_leaves]) \
        if np_leaves else np.zeros(0, np.uint8)

    cache = fused_device_put._cache
    unpack = cache.get(sig)
    if unpack is None:
        @jax.jit
        def unpack(b, _sig=sig):
            out = []
            off = 0
            for shape, dtype in _sig:
                dt = np.dtype(dtype)
                nb = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
                chunk = jax.lax.dynamic_slice(b, (off,), (nb,))
                if dt.itemsize > 1:
                    chunk = jax.lax.bitcast_convert_type(
                        chunk.reshape(-1, dt.itemsize), dt)
                else:
                    chunk = chunk.astype(dt)
                out.append(chunk.reshape(shape))
                off += nb
            return out

        cache[sig] = unpack
    return jax.tree_util.tree_unflatten(treedef, unpack(buf))


fused_device_put._cache = {}


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
                 n_shards: int = 1, cache_batches: Optional[bool] = None):
        self.complexes = list(complexes)
        self.batch_size = batch_size
        self.max_dim = max_dim
        self.shuffle = shuffle
        self.pad_multiple = pad_multiple
        self.fixed_plan = plan
        self.keep_top_upper = keep_top_upper
        self.x_dtype = x_dtype
        self.drop_last = drop_last
        self.use_pallas = use_pallas
        self.kernel_tile = kernel_tile
        self.device_prefetch = device_prefetch
        # n_shards > 1: yield data-parallel batches — each global batch is
        # split into n contiguous shards packed with a SHARED PadPlan and
        # stacked on a leading device axis (shard_map slices it).  With
        # use_pallas, per-shard tile plans are harmonised to identical
        # shapes (add_tile_plans_sharded) so the kernel fast path survives
        # data parallelism.
        self.n_shards = n_shards
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        # Host-side batch reuse.  Non-shuffled loaders yield the SAME
        # batches every epoch: pack once, cache, replay (eval loaders were
        # repacking — and re-tile-planning — identical batches per epoch).
        self.cache_batches = (not shuffle) if cache_batches is None \
            else cache_batches
        self._cached_batches: Optional[List[ComplexBatch]] = None
        # Device-side replay cache: with device_prefetch, cached batches are
        # kept ON DEVICE across epochs — re-uploading identical packed
        # buffers (indices + tile plans, tens of MB) every epoch dominates
        # wall time on a tunneled chip.
        self._staged_batches: Optional[List[ComplexBatch]] = None
        # Shuffled loaders over structure-UNIFORM datasets (every complex
        # shares identical adjacency/orientation arrays — FLOW, OCEAN,
        # ring benchmarks) reuse one packed template per batch count and
        # only rewrite the per-sample streams (x / y / sel) each batch:
        # per-batch cost drops from a full pack + tile planning to a
        # couple of memcpys.  With device_prefetch, the per-sample streams
        # of the WHOLE dataset are additionally staged on device once
        # (a "bank") and batches are formed by device-side gather — the
        # per-step host->device traffic drops to the index vector, which
        # matters on a tunneled chip (~1.4 MB/batch was ~67 ms of the
        # FLOW step).
        self._uniform: Optional[bool] = None
        self._templates: dict = {}
        self._bank: Optional[dict] = None
        # Epoch-scan state (next_epoch_stack): the shared epoch PadPlan,
        # a one-deep background-packing future (packs epoch N+1 while the
        # device runs epoch N), and a poison flag after a failed attempt.
        self._epoch_plan: Optional[PadPlan] = None
        self._epoch_scan_broken = False
        self._prefetch = None
        self._executor = None
        self._cbank = None          # (host, device) bank, or False = can't

    def __len__(self) -> int:
        n = len(self.complexes)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[ComplexBatch]:
        if self.device_prefetch and self._staged_batches is not None:
            self._epoch += 1
            yield from self._staged_batches
            return
        it = self._iter_host()
        if not self.device_prefetch:
            yield from it
            return
        # One-deep device prefetch: upload batch i+1 (async dispatch of
        # device_put) while batch i computes — hides host->device latency.
        # device_put is a no-op for leaves already on device (the uniform
        # template fast path keeps everything but x/y/sel device-resident).
        import jax
        collect = [] if self.cache_batches else None
        pending = None
        for batch in it:
            staged = fused_device_put(batch)
            if collect is not None:
                collect.append(staged)
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending
        if collect is not None:
            self._staged_batches = collect
            self._cached_batches = None      # host copy now redundant

    def _iter_host(self) -> Iterator[ComplexBatch]:
        if self.cache_batches and self._cached_batches is not None:
            self._epoch += 1
            yield from self._cached_batches
            return
        idx = np.arange(len(self.complexes))
        if self.shuffle:
            self._rng.shuffle(idx)
        self._epoch += 1
        collect = [] if self.cache_batches else None
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batch_complexes = [self.complexes[i] for i in chunk]
            if self.n_shards > 1:
                yield self._pack_sharded(batch_complexes)
                continue
            if self._is_uniform():
                # Shuffled AND fixed-order loaders: eval loaders over a
                # uniform dataset get the shared-structure template path
                # too (one SpMM per channel instead of a 64x-replicated
                # block-diagonal plan — eval was most of the FLOW epoch).
                batch = self._pack_uniform(batch_complexes, chunk)
            else:
                batch = self._pack_one(batch_complexes)
            if collect is not None:
                collect.append(batch)
            yield batch
        if collect is not None:
            self._cached_batches = collect

    def _pack_one(self, batch_complexes, skip_edge_plans: bool = False,
                  plan: Optional[PadPlan] = None) -> ComplexBatch:
        if plan is None:
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
        if self.use_pallas and not skip_edge_plans:
            from cwn_tpu.batch import add_tile_plans
            packed = add_tile_plans(packed, tile=self.kernel_tile,
                                    window=self.kernel_tile,
                                    block=self.kernel_tile)
        return packed

    # ---- uniform-structure fast path -----------------------------------

    def _is_uniform(self) -> bool:
        if self._uniform is None:
            self._uniform = _structures_identical(self.complexes,
                                                  self.max_dim)
            if self._uniform and self.use_pallas and len(self.complexes) > 1:
                # Re-gauge the shared structure to banded cell order ONCE,
                # before any template/bank/plan is built (model outputs
                # are invariant to cell numbering; the banded SpMM kernel
                # is ~4x fewer tiles for it — cwn_tpu.lift.relabel).
                # Safe vs sibling loaders on the same split: idempotent
                # per complex, and the first uniform check always precedes
                # the first pack (background epoch packing starts later).
                from cwn_tpu.lift.relabel import rcm_relabel
                rcm_relabel(self.complexes, self.max_dim)
        return self._uniform

    def _ensure_bank(self) -> bool:
        """Stage every sample's per-sample streams (x / y / sel / complex y)
        on device once; returns False if the dataset shape doesn't allow it
        (mixed feature presence)."""
        if self._bank is not None:
            return self._bank.get("ok", False)
        import jax
        import jax.numpy as jnp

        bank = {"ok": True, "dims": {}}
        try:
            for k in range(self.max_dim + 1):
                co0 = self.complexes[0].cochains.get(k)
                if co0 is None or not (co0.num_cells or 0):
                    continue
                entry = {}
                cos = [c.cochains[k] for c in self.complexes]
                if co0.x is not None:
                    entry["x"] = jnp.asarray(np.stack(
                        [np.asarray(co.x, self.x_dtype) for co in cos]))
                if co0.y is not None:
                    entry["y"] = jnp.asarray(np.stack(
                        [np.asarray(co.y).reshape(-1) for co in cos]))
                if co0.mask is not None:
                    entry["sel"] = jnp.asarray(np.stack(
                        [np.asarray(co.mask, np.float32).reshape(-1)
                         for co in cos]))
                bank["dims"][k] = entry
            if self.complexes[0].y is not None:
                bank["y"] = jnp.asarray(np.stack(
                    [np.asarray(c.y).reshape(-1).astype(np.float32)
                     for c in self.complexes]))
        except (ValueError, TypeError):
            bank = {"ok": False}
        self._bank = bank
        return bank["ok"]

    def _pack_uniform_bank(self, tpl, chunk) -> ComplexBatch:
        """Form a batch on device: gather the chunk's rows from the staged
        bank into the (device-resident) template's stream slots."""
        import jax.numpy as jnp

        idx = jnp.asarray(np.asarray(chunk, np.int32))
        return gather_uniform_batch(tpl, self._bank["dims"],
                                    self._bank.get("y"), idx)

    def _pack_uniform(self, batch_complexes, chunk=None) -> ComplexBatch:
        count = len(batch_complexes)
        tpl = self._templates.get(count)
        if tpl is not None and chunk is not None and self.device_prefetch \
                and self._ensure_bank():
            return self._pack_uniform_bank(tpl, chunk)
        if tpl is None:
            # Uniform structure -> shared-structure batched plans: ONE
            # SpMM per channel over [n_struct, count*F], superseding the
            # per-edge block-diagonal plans (64x fewer tiles on FLOW, and
            # planning drops from seconds to milliseconds).
            tpl = self._pack_one(batch_complexes, skip_edge_plans=True)
            if self.use_pallas:
                from cwn_tpu.batch import add_uniform_tile_plans
                tpl = add_uniform_tile_plans(tpl, batch_complexes[0], count)
            if self.device_prefetch:
                # Stage the template on device ONCE: later batches replace
                # only the per-sample streams (x / y / sel), so the big
                # index + tile-plan leaves never cross the host->device
                # link again (the link is a tunnel; re-uploading the same
                # ~30 MB template every step starved the FLOW runs).
                import jax
                tpl = jax.device_put(tpl)
            self._templates[count] = tpl
            return tpl
        dims = []
        for k, d in enumerate(tpl.dims):
            co0 = batch_complexes[0].cochains.get(k)
            n_k = int(co0.num_cells or 0) if co0 is not None else 0
            repl = {}
            if n_k and d.x is not None:
                f = d.x.shape[1]
                x = np.zeros(d.x.shape, np.dtype(d.x.dtype))
                x[:count * n_k] = np.concatenate([
                    np.asarray(c.cochains[k].x, np.dtype(d.x.dtype))
                    if c.cochains[k].x is not None
                    else np.zeros((n_k, f), np.dtype(d.x.dtype))
                    for c in batch_complexes], axis=0)
                repl["x"] = x
            if n_k and d.y is not None:
                y = np.zeros(d.y.shape, np.dtype(d.y.dtype))
                y[:count * n_k] = np.concatenate([
                    np.asarray(c.cochains[k].y).reshape(-1)
                    for c in batch_complexes])
                repl["y"] = y
            if n_k and d.sel_mask is not None:
                sel = np.zeros(d.sel_mask.shape, np.dtype(d.sel_mask.dtype))
                sel[:count * n_k] = np.concatenate([
                    np.asarray(c.cochains[k].mask, np.float32).reshape(-1)
                    if c.cochains[k].mask is not None
                    else np.zeros(n_k, np.float32)
                    for c in batch_complexes])
                repl["sel_mask"] = sel
            dims.append(d.replace(**repl) if repl else d)
        y = tpl.y
        if y is not None:
            vals = np.stack([np.asarray(c.y).reshape(-1)
                             for c in batch_complexes])
            if vals.shape[1] == 1:
                vals = vals[:, 0]
            y = np.zeros(tpl.y.shape, np.dtype(tpl.y.dtype))
            y[:count] = vals.astype(np.dtype(tpl.y.dtype))
        return tpl.replace(dims=tuple(dims), y=y)

    # ---- epoch-scan fast path ------------------------------------------
    #
    # A training epoch as ONE device dispatch: every full batch of the
    # epoch is packed with a SHARED PadPlan (identical shapes), stacked on
    # a leading axis, shipped in one fused transfer, and the Trainer runs
    # a jitted lax.scan of train steps over it.  This kills the dominant
    # cost of small-step training through a tunneled chip — the per-step
    # host<->device round trip (measured 42 ms of a 46 ms ZINC step was
    # the scalar-loss fetch alone; tools/profile_dispatch.py).
    #
    # Uniform-structure datasets skip packing entirely: the epoch spec is
    # just the shuffled index matrix, and batches are gathered from the
    # device-resident bank INSIDE the scan body (gather_uniform_batch).

    def next_epoch_stack(self):
        """Return one epoch's scan spec, or None when unsupported.

        Spec kinds:
          {"kind": "uniform", "tpl", "bank_dims", "bank_y", "idx",
           "tail": ComplexBatch|None, "n", "skipped", "total"}
          {"kind": "stacked", "batches": <host pytree, leading axis n>,
           "n", "skipped", "total"}
        """
        if (self.n_shards > 1 or not self.shuffle
                or self._epoch_scan_broken or len(self.complexes) == 0
                or len(self.complexes) <= self.batch_size):
            return None
        try:
            if self._prefetch is not None:
                spec = self._prefetch.result()
                self._prefetch = None
            else:
                spec = self._build_epoch_spec()
            # Pack the NEXT epoch in the background: the main thread spends
            # the inter-epoch time blocked on device work (scan + eval),
            # during which the GIL is free.
            if spec is not None and spec["kind"] == "stacked":
                if self._executor is None:
                    import concurrent.futures
                    self._executor = concurrent.futures.ThreadPoolExecutor(1)
                self._prefetch = self._executor.submit(self._build_epoch_spec)
            return spec
        except Exception as e:          # fall back to the per-batch path
            import warnings
            warnings.warn(f"epoch-scan disabled: {type(e).__name__}: {e}")
            self._epoch_scan_broken = True
            return None

    def _build_epoch_spec(self):
        if self._is_uniform():
            return self._next_epoch_uniform()
        spec = self._next_epoch_banked()
        if spec is not None:
            return spec
        return self._next_epoch_stacked()

    def _ensure_cbank(self):
        """Host+device per-complex bank for on-device batch assembly
        (cwn_tpu.train.device_pack); None when the dataset can't be banked
        or the Pallas path is on (its host-built tile plans can't be
        assembled device-side)."""
        if self._cbank is False:
            return None
        if self._cbank is not None:
            return self._cbank
        if self.use_pallas or not self.device_prefetch:
            self._cbank = False
            return None
        try:
            from cwn_tpu.train.device_pack import build_bank
            hb = build_bank(self.complexes, self.max_dim,
                            x_dtype=self.x_dtype,
                            keep_top_upper=self.keep_top_upper)
            db = fused_device_put(hb)
        except (ValueError, TypeError) as e:
            import warnings
            warnings.warn(f"complex bank unavailable: {e}")
            self._cbank = False
            return None
        self._cbank = (hb, db)
        return self._cbank

    def _next_epoch_banked(self):
        bank = self._ensure_cbank()
        if bank is None:
            return None
        hb, db = bank
        idx = self._epoch_perm()
        b = self.batch_size
        chunks = [idx[s:s + b] for s in range(0, len(idx), b)]
        if self.drop_last and len(chunks[-1]) < b:
            chunks = chunks[:-1]
        total = len(chunks)
        # Per-chunk stream sizes from the host lens tables.
        cell = np.stack([d.cell_len for d in hb.dims])       # [D, C]
        up = np.stack([d.up_len for d in hb.dims])
        down = np.stack([d.down_len for d in hb.dims])
        bnd = np.stack([d.b_len for d in hb.dims])
        rows, counts, skipped = [], [], 0
        need_c = need_u = need_d = need_b = None
        for c in chunks:
            cells_k = cell[:, c].sum(axis=1)
            present = cells_k[cells_k > 0]
            if not (len(present) and present.min() > 1):     # BN safety
                skipped += 1
                continue
            sizes = (cells_k, up[:, c].sum(axis=1), down[:, c].sum(axis=1),
                     bnd[:, c].sum(axis=1))
            acc = (need_c, need_u, need_d, need_b)
            need_c, need_u, need_d, need_b = [
                s if a is None else np.maximum(a, s)
                for a, s in zip(acc, sizes)]
            row = np.zeros(b, np.int32)
            row[:len(c)] = c
            rows.append(row)
            counts.append(len(c))
        if not rows:
            return {"kind": "banked", "n": 0, "skipped": skipped,
                    "total": total}
        need = bucketize_plan(PadPlan(
            batch_size=b, num_cells=tuple(int(v) for v in need_c),
            num_up=tuple(int(v) for v in need_u),
            num_down=tuple(int(v) for v in need_d),
            num_boundary=tuple(int(v) for v in need_b)), self.pad_multiple)
        if self.fixed_plan is not None:
            assert self.fixed_plan.covers(need), \
                f"fixed plan too small for epoch: {need}"
            plan = self.fixed_plan
        else:
            if self._epoch_plan is None or not self._epoch_plan.covers(need):
                self._epoch_plan = need if self._epoch_plan is None else \
                    bucketize_plan(PadPlan.union([self._epoch_plan, need]),
                                   self.pad_multiple)
            plan = self._epoch_plan
        return {"kind": "banked", "bank": db,
                "idx": np.stack(rows), "counts": np.asarray(counts, np.int32),
                "plan": plan, "n": len(rows),
                "skipped": skipped, "total": total}

    def _epoch_perm(self) -> np.ndarray:
        idx = np.arange(len(self.complexes))
        self._rng.shuffle(idx)
        self._epoch += 1
        return idx

    def _next_epoch_uniform(self):
        idx = self._epoch_perm()
        b = self.batch_size
        n_full = len(idx) // b
        tail = idx[n_full * b:]
        if not self._ensure_bank():
            raise ValueError("uniform bank unavailable")
        tpl = self._templates.get(b)
        if tpl is None:
            tpl = self._pack_uniform([self.complexes[i]
                                      for i in idx[:b]], None)
            tpl = self._templates.get(b, tpl)
        tail_batch = None
        if len(tail) and not self.drop_last:
            tail_batch = self._pack_uniform(
                [self.complexes[i] for i in tail], tail)
        bank = self._bank
        return {"kind": "uniform", "tpl": tpl,
                "bank_dims": bank["dims"], "bank_y": bank.get("y"),
                "idx": idx[:n_full * b].astype(np.int32).reshape(n_full, b),
                "tail": tail_batch, "n": n_full,
                "skipped": 0, "total": n_full + (1 if tail_batch is not None
                                                 else 0)}

    def _next_epoch_stacked(self):
        import jax

        idx = self._epoch_perm()
        chunks = [idx[s:s + self.batch_size]
                  for s in range(0, len(idx), self.batch_size)]
        if self.drop_last and len(chunks[-1]) < self.batch_size:
            chunks = chunks[:-1]
        groups = [[self.complexes[i] for i in c] for c in chunks]
        # One shared plan for the whole epoch (and, across epochs, grown
        # monotonically so the scan recompiles at most a few times ever).
        plans = [PadPlan.for_complexes(g, self.max_dim,
                                       batch_size=self.batch_size,
                                       pad_multiple=self.pad_multiple)
                 for g in groups]
        need = bucketize_plan(PadPlan.union(plans), self.pad_multiple)
        if self._epoch_plan is None or not self._epoch_plan.covers(need):
            self._epoch_plan = need if self._epoch_plan is None else \
                bucketize_plan(PadPlan.union([self._epoch_plan, need]),
                               self.pad_multiple)
        plan = self._epoch_plan
        batches, skipped = [], 0
        for g in groups:
            batch = self._pack_one(g, plan=plan)
            if _host_trainable(batch):
                batches.append(batch)
            else:
                skipped += 1
        if not batches:
            return {"kind": "stacked", "batches": None, "n": 0,
                    "skipped": skipped, "total": len(groups)}
        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)
        return {"kind": "stacked", "batches": stacked, "n": len(batches),
                "skipped": skipped, "total": len(groups)}

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
        if self.use_pallas:
            from cwn_tpu.batch import add_tile_plans_sharded
            shards = add_tile_plans_sharded(shards, tile=self.kernel_tile,
                                            window=self.kernel_tile,
                                            block=self.kernel_tile)
        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *shards)


def _host_trainable(batch: ComplexBatch) -> bool:
    """BN-safety check on a host-packed batch (same semantics as
    Trainer._batch_trainable, but on numpy so it never syncs the device)."""
    counts = [float(np.asarray(d.cell_mask).sum()) for d in batch.dims]
    present = [c for c in counts if c > 0]
    return bool(present) and min(present) > 1


def gather_uniform_batch(tpl, bank_dims, bank_y, idx):
    """Form a ComplexBatch from a device-resident template + per-sample
    stream bank by gathering the rows in `idx` (int32 [count]).  Pure jnp
    — traceable, so it runs both eagerly (per-batch path) and inside the
    epoch-scan train loop (cwn_tpu.train.trainer)."""
    import jax.numpy as jnp

    count = int(idx.shape[0])
    dims = []
    for k, d in enumerate(tpl.dims):
        entry = bank_dims.get(k)
        if entry is None:
            dims.append(d)
            continue
        repl = {}
        if "x" in entry and d.x is not None:
            xs = entry["x"][idx]                       # [count, n, F]
            flat = xs.reshape(-1, xs.shape[-1])
            repl["x"] = jnp.pad(
                flat, ((0, d.x.shape[0] - flat.shape[0]), (0, 0)))
        if "y" in entry and d.y is not None:
            ys = entry["y"][idx].reshape(-1)
            repl["y"] = jnp.pad(
                ys, (0, d.y.shape[0] - ys.shape[0])).astype(d.y.dtype)
        if "sel" in entry and d.sel_mask is not None:
            ss = entry["sel"][idx].reshape(-1)
            repl["sel_mask"] = jnp.pad(
                ss, (0, d.sel_mask.shape[0] - ss.shape[0]))
        dims.append(d.replace(**repl) if repl else d)
    y = tpl.y
    if y is not None and bank_y is not None:
        vals = bank_y[idx]
        if vals.shape[1] == 1:
            vals = vals[:, 0]
        pad = [(0, tpl.y.shape[0] - count)] + \
            [(0, 0)] * (vals.ndim - 1)
        y = jnp.pad(vals, pad).astype(tpl.y.dtype)
    return tpl.replace(dims=tuple(dims), y=y)


def _structures_identical(complexes: Sequence[Complex], max_dim: int) -> bool:
    """True iff every complex shares the SAME structural arrays (indices,
    shared pointers, orientations, cell counts) — so one packed batch is a
    template for any other batch of the same size, differing only in
    x / y / sel streams.  Short-circuits on the first mismatch, so the
    check is cheap for heterogeneous datasets."""
    if len(complexes) <= 1:
        return True

    def _eq(a, b):
        if a is None or b is None:
            return a is None and b is None
        a, b = np.asarray(a), np.asarray(b)
        return a.shape == b.shape and np.array_equal(a, b)

    def _sig(c):
        out = []
        for k in range(max_dim + 1):
            co = c.cochains.get(k)
            out.append(None if co is None else (
                co.num_cells, co.upper_index, co.shared_coboundaries,
                co.upper_orient, co.lower_index, co.shared_boundaries,
                co.lower_orient, co.boundary_index))
        return out

    ref = _sig(complexes[0])
    for c in complexes[1:]:
        for a, b in zip(ref, _sig(c)):
            if (a is None) != (b is None):
                return False
            if a is None:
                continue
            if a[0] != b[0]:
                return False
            if not all(_eq(u, v) for u, v in zip(a[1:], b[1:])):
                return False
    return True


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
