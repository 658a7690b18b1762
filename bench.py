"""Benchmark: message throughput of the flagship training step on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

The metric is boundary+upper adjacency message edges processed per second
per chip while *training* (forward+backward) EmbedSparseCIN on ZINC-shaped
synthetic molecules.  The reference publishes no in-repo numbers
(BASELINE.md); `vs_baseline` is measured against a fixed reference budget
REF_EDGES_PER_S estimated for the reference PyTorch stack on its target
GPU — revisit as better baselines land.
"""
import json
import time

import numpy as np

REF_EDGES_PER_S = 20e6  # provisional reference-stack budget (see BASELINE.md)


def main():
    import os

    import jax

    # Persistent compilation cache: the cold compile of the train step is
    # ~10 min behind the device tunnel; cache it on disk so repeated bench
    # runs (and the driver's) start from warm.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax
    from cwn_tpu.batch import pack_complexes
    from cwn_tpu.data.synthetic import synthetic_molecules
    from cwn_tpu.lift import convert_graph_dataset_with_rings
    from cwn_tpu.models.molec import EmbedSparseCIN

    batch_size = 128
    num_layers = 4
    hidden = 128

    # The lift is a host-side preprocessing stage; cache it like the
    # reference caches processed datasets so the benchmark measures the
    # device path, not Python preprocessing.
    import os
    import pickle
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_complexes.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            complexes = pickle.load(f)
    else:
        graphs = synthetic_molecules(batch_size, seed=0, min_nodes=15,
                                     max_nodes=35)
        complexes, _, _ = convert_graph_dataset_with_rings(
            graphs, max_ring_size=8, init_edges=True, init_rings=False)
        with open(cache, "wb") as f:
            pickle.dump(complexes, f)
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=256)

    # Messages per forward: valid up + boundary edges over all dims, per layer.
    msgs_per_layer = sum(
        int(d.up_mask.sum()) + int(d.b_mask.sum()) for d in batch.dims)
    msgs_per_step = msgs_per_layer * num_layers

    from cwn_tpu.batch import add_tile_plans
    batch = add_tile_plans(batch)       # Pallas one-hot SpMM kernels
    batch = jax.device_put(batch)       # device-resident (steady-state train)

    model = EmbedSparseCIN(
        atom_types=28, bond_types=4, out_size=1, num_layers=num_layers,
        hidden=hidden, dropout_rate=0.0, max_dim=2, use_coboundaries=True,
        embed_edge=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    y = jnp.asarray(np.asarray(batch.y, np.float32))

    import functools

    # Donating the carried state lets XLA update params/opt-state in place;
    # without it every step pays an extra device-to-device copy of the full
    # model + Adam state (~3x step time behind the device tunnel).
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

    # Warmup/compile.
    params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, batch)
    jax.block_until_ready(loss)

    # Best of 3 windows: the chip is shared/tunneled, single windows are
    # noisy (+-50%).
    iters = 50
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batch)
        jax.block_until_ready(loss)
        dt = min(dt, time.perf_counter() - t0)

    edges_per_s = msgs_per_step * iters / dt
    print(json.dumps({
        "metric": "boundary+upper message edges/s/chip (EmbedSparseCIN train step)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
