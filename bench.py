"""Benchmark: the flagship train step on one chip, canonical ZINC shape.

Prints ONE JSON line with the headline metric plus falsifiable context:

  metric        boundary+upper message edges/s/chip while TRAINING
                (fwd+bwd) EmbedSparseCIN under the cwn-zinc-small config
                (2 layers, emb 48, ring k=18, edge feats, batch 128 —
                scripts/cwn-zinc-small.sh)
  value/unit    edges per second
  vs_baseline   value / REF_EDGES_PER_S.  The reference publishes no
                in-repo throughput (BASELINE.md); REF_EDGES_PER_S is a
                fixed provisional budget for the reference PyTorch stack,
                NOT a measured reference number.
  step_time_ms  p50 jitted step wall time
  msgs_per_step valid boundary+upper messages per optimizer step
  occupancy     valid/padded fraction for cells and adjacency slots
  pallas_speedup  step-time ratio XLA-fallback / Pallas-kernel path
  flops_per_step / tflops_per_s  XLA cost-analysis estimate of the
                compiled step (device-kind reported alongside)
"""
import json
import time

import numpy as np

REF_EDGES_PER_S = 20e6  # provisional reference-stack budget (see BASELINE.md)


def _load_complexes():
    import os
    import pickle

    from cwn_tpu.data.synthetic import synthetic_molecules
    from cwn_tpu.lift import convert_graph_dataset_with_rings

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_complexes_k18.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    graphs = synthetic_molecules(128, seed=0, min_nodes=15, max_nodes=35)
    complexes, _, _ = convert_graph_dataset_with_rings(
        graphs, max_ring_size=18, init_edges=True, init_rings=False)
    with open(cache, "wb") as f:
        pickle.dump(complexes, f)
    return complexes


def _build_batch():
    """ZINC-shaped synthetic molecules, canonical ring k=18 lift."""
    from cwn_tpu.batch import pack_complexes

    return pack_complexes(_load_complexes(), max_dim=2, pad_multiple=256)


def _occupancy(batch):
    cells_valid = sum(float(d.cell_mask.sum()) for d in batch.dims)
    cells_pad = sum(d.cell_mask.shape[0] for d in batch.dims)
    adj_valid = sum(float(d.up_mask.sum()) + float(d.down_mask.sum())
                    + float(d.b_mask.sum()) for d in batch.dims)
    adj_pad = sum(d.up_mask.shape[0] + d.down_mask.shape[0]
                  + d.b_mask.shape[0] for d in batch.dims)
    return {"cells": round(cells_valid / cells_pad, 3),
            "adjacency": round(adj_valid / adj_pad, 3)}


def _make_step(model, batch, y):
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(1e-3)

    # Donating the carried state lets XLA update params/opt-state in place;
    # without it every step pays an extra device copy of model + Adam state.
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            err = jnp.abs(out[:, 0] - y) * batch.y_mask
            return err.sum() / batch.y_mask.sum(), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    def make_state():
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        return params, batch_stats, tx.init(params)

    return step, make_state


def _time_steps(step, params, batch_stats, opt_state, batch,
                iters=50, windows=3):
    import jax

    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, batch)       # compile + warmup
    jax.block_until_ready(loss)
    dt = float("inf")
    for _ in range(windows):                          # tunneled chip: best-of
        t0 = time.perf_counter()
        for _ in range(iters):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batch)
        jax.block_until_ready(loss)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def _time_steps_alloc(make_state, step, batch, allocs=4, **kw):
    """best-of over `allocs` independent state allocations.

    Measured: the SAME executable on the same data varies up to ~1.9x in
    step time purely with where the (donated) train-state buffers landed
    in HBM — the within-allocation best-of-3 windows are stable while
    re-initialising the state re-rolls the step time (2.2-3.8 ms observed
    for one program).  Report the best placement as the throughput number
    and the spread for honesty."""
    times = []
    for _ in range(allocs):
        p, bs, opt = make_state()
        times.append(_time_steps(step, p, bs, opt, batch, **kw))
    return min(times), times


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.models.molec import EmbedSparseCIN

    num_layers, hidden = 2, 48      # cwn-zinc-small (500k-budget config)

    batch = _build_batch()
    occ = _occupancy(batch)
    msgs_per_layer = sum(
        int(d.up_mask.sum()) + int(d.b_mask.sum()) for d in batch.dims)
    msgs_per_step = msgs_per_layer * num_layers
    y = (jnp.asarray(np.asarray(batch.y, np.float32))
         if batch.y is not None else jnp.zeros(batch.batch_size, jnp.float32))

    model = EmbedSparseCIN(
        atom_types=28, bond_types=4, out_size=1, num_layers=num_layers,
        hidden=hidden, dropout_rate=0.0, max_dim=2, use_coboundaries=True,
        embed_edge=True)

    # Three arms, IDENTICAL tune budgets (2 independent placement tunes at
    # allocs=4 each; each arm reports the WORSE of its two tuned
    # measurements — a typical, reproducible number, not a best-of-N
    # lottery draw):
    #   xla         — no tile plans, fac_* present: the factorized-O(r)
    #                 XLA path (the path real ZINC training runs).
    #   xla_pairwise— fac_* stripped: the pre-round-4 pairwise XLA path,
    #                 kept for round-over-round comparability (the torch
    #                 anchor is also pairwise).
    #   pallas      — tile plans attached: the Pallas kernel path.
    from cwn_tpu.utils.placement import tune_state_placement

    def tuned_worse(step_fn, mk_fn, b, tunes=2, allocs=4):
        measured, probes0 = [], None
        for _ in range(tunes):
            state, _, probes = tune_state_placement(
                mk_fn, step_fn, b, allocs=allocs, iters=20, windows=2)
            measured.append(_time_steps(step_fn, *state, b))
            probes0 = probes if probes0 is None else probes0
            del state
        return max(measured), measured, probes0

    import dataclasses as _dc

    def strip_fac(b):
        return _dc.replace(b, dims=tuple(
            _dc.replace(d, fac_src=None, fac_cob=None, fac_mask=None)
            for d in b.dims))

    batch_xla = jax.device_put(batch)
    step, mk = _make_step(model, batch_xla, y)

    batch_pair = jax.device_put(strip_fac(batch))
    step_pair, mk_pair = _make_step(model, batch_pair, y)

    batch_pl = jax.device_put(add_tile_plans(batch))
    step_pl, mk_pl = _make_step(model, batch_pl, y)

    # Miscompilation canary BEFORE timing (a silent XLA:TPU fusion bug
    # corrupted CSL folds in round 4 — commit 95e834c): the factorized-XLA
    # path and the kernel path must both reproduce the pairwise oracle's
    # forward output on the bench batch.
    p0, bs0, _ = mk()
    fwd = jax.jit(lambda b: model.apply(
        {"params": p0, "batch_stats": bs0}, b, train=False))
    out_pair = np.asarray(fwd(batch_pair))
    # Tolerances are per-arm: the factorized rewrite is term-for-term the
    # same f32 sum (measured bit-exact on this batch), while the Pallas
    # kernels carry the documented passes=2 bf16 value splitting (~2^-17
    # relative per value, compounding over 2 layers to ~2e-3 relative on
    # this batch).  A structural miscompile (r4's was ~O(1) wrong) trips
    # either bound by orders of magnitude.
    for name, b_arm, rtol in (("factorized_xla", batch_xla, 1e-4),
                              ("pallas", batch_pl, 5e-3)):
        got = np.asarray(fwd(b_arm))
        err = float(np.max(np.abs(got - out_pair)))
        scale = float(np.max(np.abs(out_pair))) + 1e-6
        assert err <= rtol * scale + 1e-4, \
            f"CANARY FAILED: {name} deviates from the pairwise oracle " \
            f"(max abs err {err:.3e}, scale {scale:.3e})"
    del p0, bs0, fwd

    dt_xla, xla_tuned, _ = tuned_worse(step, mk, batch_xla)
    dt_pair, _, _ = tuned_worse(step_pair, mk_pair, batch_pair)

    # Cost analysis of the compiled Pallas-path step.
    flops = None
    try:
        p, bs, opt = mk_pl()
        cost = step_pl.lower(p, bs, opt, batch_pl).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception:
        pass
    dt_pl, tuned, pl_times = tuned_worse(step_pl, mk_pl, batch_pl)

    # Measured anchor: the same step on torch-CPU scatter ops (cached — the
    # anchor machine does not change between runs).
    anchor_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_torch_anchor.json")
    if os.path.exists(anchor_file):
        with open(anchor_file) as f:
            dt_torch = json.load(f)["step_time_s"]
    else:
        dt_torch = _torch_cpu_anchor(batch)
        with open(anchor_file, "w") as f:
            json.dump({"step_time_s": dt_torch}, f)
    torch_edges_per_s = msgs_per_step / dt_torch

    dt = min(dt_pl, dt_xla)
    edges_per_s = msgs_per_step / dt
    out = {
        "metric": "boundary+upper message edges/s/chip "
                  "(EmbedSparseCIN cwn-zinc-small train step, ring k=18)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / torch_edges_per_s, 3),
        "baseline_kind": "measured: same step via torch-CPU scatter "
                         "(reference-stack ops; no GPU in this env)",
        "torch_cpu_step_ms": round(dt_torch * 1e3, 3),
        "torch_cpu_edges_per_s": round(torch_edges_per_s, 1),
        "vs_provisional_budget": round(edges_per_s / REF_EDGES_PER_S, 3),
        "step_time_ms": round(dt * 1e3, 3),
        "xla_path": "factorized",   # step_time_ms_xla measures the O(r)
                                    # factorized up channel since round 4
        "canary_factorized_ok": True,   # asserted above, pre-timing
        "step_time_ms_xla": round(dt_xla * 1e3, 3),
        "step_time_ms_xla_tunes": [round(t * 1e3, 3) for t in xla_tuned],
        "step_time_ms_xla_pairwise": round(dt_pair * 1e3, 3),
        "step_time_ms_pallas": round(dt_pl * 1e3, 3),
        "step_time_ms_pallas_tunes": [round(t * 1e3, 3) for t in tuned],
        "placement_probe_ms": [round(t * 1e3, 3) for t in pl_times],
        "placement_tuned": True,
        "pallas_speedup": round(dt_xla / dt_pl, 3),
        "msgs_per_step": msgs_per_step,
        "occupancy": occ,
        "batch_size": int(batch.batch_size),
        "device": jax.devices()[0].device_kind,
    }
    if flops is not None:
        out["flops_per_step"] = flops
        out["tflops_per_s"] = round(flops / dt / 1e12, 3)

    # Kernel-path throughput THROUGH the DP code path (shard_map over a
    # 1-device mesh on the single chip): proves the parallel wrapper costs
    # ~nothing relative to the plain step.
    try:
        dp = _measure_dp(1)
        out["dp1_step_time_ms"] = dp["step_time_ms"]
        out["dp1_edges_per_s"] = dp["value"]
        out["dp1_msgs_per_step"] = dp["msgs_per_step"]
    except Exception as e:    # never block the headline number
        out["dp1_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


def _torch_cpu_anchor(batch, num_layers=2, hidden=48, warmup=2, iters=5):
    """Measured reference-stack anchor: the SAME train step (same packed
    buffers, same model shape — embed + per-dim cat-Linear-relu up messages,
    identity boundary messages, index_add_ scatter aggregation, GIN eps
    residuals, 2-layer update MLPs + combine, per-dim pooling, L1 loss,
    Adam) implemented with torch-CPU scatter ops, the role torch-scatter
    plays in the reference (/root/reference/mp/cell_mp.py:423-479).  An
    honest measured lower bound for `vs_baseline` — the reference publishes
    no throughput numbers and no GPU is present here (BASELINE.md)."""
    import torch

    torch.manual_seed(0)
    F = hidden

    dims = []
    for d in batch.dims:
        dims.append(dict(
            n=d.cell_mask.shape[0],
            x=None if d.x is None else torch.from_numpy(
                np.asarray(d.x, np.int64)),
            up_src=torch.from_numpy(np.asarray(d.up_src, np.int64)),
            up_dst=torch.from_numpy(np.asarray(d.up_dst, np.int64)),
            up_cob=torch.from_numpy(np.asarray(d.up_cob, np.int64)),
            up_mask=torch.from_numpy(np.asarray(d.up_mask, np.float32))[:, None],
            b_src=torch.from_numpy(np.asarray(d.b_src, np.int64)),
            b_dst=torch.from_numpy(np.asarray(d.b_dst, np.int64)),
            b_mask=torch.from_numpy(np.asarray(d.b_mask, np.float32))[:, None],
            batch=torch.from_numpy(np.asarray(d.batch, np.int64)),
            cell_mask=torch.from_numpy(
                np.asarray(d.cell_mask, np.float32))[:, None]))
    y = torch.from_numpy(np.asarray(batch.y, np.float32))
    y_mask = torch.from_numpy(np.asarray(batch.y_mask, np.float32))
    B = batch.batch_size

    class Conv(torch.nn.Module):
        def __init__(self):
            super().__init__()
            mk = lambda i, o: torch.nn.Linear(i, o)
            self.msg_up = torch.nn.ModuleList([mk(2 * F, F) for _ in dims])
            self.upd_up = torch.nn.ModuleList(
                [torch.nn.Sequential(mk(F, F), torch.nn.BatchNorm1d(F),
                                     torch.nn.ReLU(), mk(F, F),
                                     torch.nn.BatchNorm1d(F), torch.nn.ReLU())
                 for _ in dims])
            self.upd_b = torch.nn.ModuleList(
                [torch.nn.Sequential(mk(F, F), torch.nn.BatchNorm1d(F),
                                     torch.nn.ReLU(), mk(F, F),
                                     torch.nn.BatchNorm1d(F), torch.nn.ReLU())
                 for _ in dims])
            self.combine = torch.nn.ModuleList([mk(2 * F, F) for _ in dims])

        def forward(self, xs):
            out = []
            for k, d in enumerate(dims):
                x = xs[k]
                x_up = xs[k + 1] if k + 1 < len(dims) else None
                up = torch.zeros_like(x)
                if x_up is not None and d["up_src"].numel():
                    m = torch.cat([x.index_select(0, d["up_src"]),
                                   x_up.index_select(0, d["up_cob"])], dim=1)
                    m = torch.relu(self.msg_up[k](m)) * d["up_mask"]
                    up = up.index_add(0, d["up_dst"], m)
                bnd = torch.zeros_like(x)
                if k > 0 and d["b_src"].numel():
                    m = xs[k - 1].index_select(0, d["b_src"]) * d["b_mask"]
                    bnd = bnd.index_add(0, d["b_dst"], m)
                u = self.upd_up[k](up + x)
                b = self.upd_b[k](bnd + x)
                out.append(torch.relu(self.combine[k](
                    torch.cat([u, b], dim=1))))
            return out

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.ModuleList(
                [torch.nn.Embedding(32, F) for _ in dims])
            self.convs = torch.nn.ModuleList(
                [Conv() for _ in range(num_layers)])
            self.lin1 = torch.nn.ModuleList([torch.nn.Linear(F, 2 * F)
                                             for _ in dims])
            self.lin2 = torch.nn.Linear(2 * F, 1)

        def forward(self):
            xs = []
            for k, d in enumerate(dims):
                if d["x"] is not None:
                    xs.append(self.emb[k](d["x"][:, 0] % 32))
                else:
                    xs.append(torch.zeros(d["n"], F))
            for conv in self.convs:
                xs = conv(xs)
            pooled = 0
            for k, d in enumerate(dims):
                p = torch.zeros(B + 1, F).index_add(
                    0, d["batch"].clamp(max=B), xs[k] * d["cell_mask"])[:B]
                pooled = pooled + torch.relu(self.lin1[k](p))
            return self.lin2(pooled)

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        out = net()
        loss = ((out[:, 0] - y).abs() * y_mask).sum() / y_mask.sum()
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def main_dp(n_devices: int):
    """DP mode: the flagship train step under make_dp_train_step over an
    n-device mesh, WITH the Pallas tile plans attached per shard — proves
    the kernel fast path survives data parallelism on real hardware
    (n_devices=1 on the single tunneled chip; >1 needs more chips)."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps(_measure_dp(n_devices)))


def _measure_dp(n_devices: int):
    import jax
    import jax.numpy as jnp
    import optax
    from cwn_tpu.batch import PadPlan, add_tile_plans_sharded, pack_complexes
    from cwn_tpu.models.molec import EmbedSparseCIN
    from cwn_tpu.parallel import make_dp_train_step, make_mesh, stack_shards

    num_layers, hidden = 2, 48
    complexes = _load_complexes()
    per = len(complexes) // n_devices
    groups = [complexes[i * per:(i + 1) * per] for i in range(n_devices)]
    plan = PadPlan.union([PadPlan.for_complexes(g, 2, pad_multiple=256)
                          for g in groups])
    shards = [pack_complexes(g, max_dim=2, plan=plan) for g in groups]
    shards = add_tile_plans_sharded(shards)
    stacked = jax.device_put(stack_shards(shards))

    msgs_per_step = num_layers * sum(
        int(d.up_mask.sum()) + int(d.b_mask.sum())
        for s in shards for d in s.dims)

    model = EmbedSparseCIN(
        atom_types=28, bond_types=4, out_size=1, num_layers=num_layers,
        hidden=hidden, dropout_rate=0.0, max_dim=2, use_coboundaries=True,
        embed_edge=True)
    tx = optax.adam(1e-3)

    def make_state():
        variables = model.init({"params": jax.random.PRNGKey(0)}, shards[0],
                               train=False)
        params, bs = variables["params"], variables["batch_stats"]
        return params, bs, tx.init(params)

    def loss_fn(out, y, y_mask):
        err = jnp.abs(out[:, 0] - y.astype(jnp.float32)) * y_mask
        return err.sum(), y_mask.sum()

    mesh = make_mesh(n_devices)
    step = make_dp_train_step(model, tx, mesh, loss_fn, donate=True)
    rng = jax.random.PRNGKey(0)

    def step1(p, b, o, batch):
        p, b, o, loss = step(p, b, o, batch, rng)
        return p, b, o, loss

    dt, _ = _time_steps_alloc(make_state, step1, stacked, allocs=3)
    edges_per_s = msgs_per_step / dt
    return {
        "metric": f"DP({n_devices}) boundary+upper message edges/s "
                  "(EmbedSparseCIN train step, Pallas plans attached)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 3),
        "step_time_ms": round(dt * 1e3, 3),
        "msgs_per_step": msgs_per_step,
        "n_devices": n_devices,
        "device": jax.devices()[0].device_kind,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=0,
                    help="run the DP-mode bench over an N-device mesh "
                         "(default: the single-chip headline bench)")
    a = ap.parse_args()
    if a.n_devices > 0:
        main_dp(a.n_devices)
    else:
        main()
