"""Step-time decomposition + precision sweep for the headline ZINC bench.

Run on the real chip (serialized — nothing else on the TPU).  Produces the
numbers behind PERF.md: forward vs backward split, per-kernel costs,
passes=1/2/3 step times, and the XLA-path comparison, each best-of-3
windows over best-of-2 allocations.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=50, windows=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import bench
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.models.molec import EmbedSparseCIN

    batch = bench._build_batch()
    y = jnp.asarray(np.asarray(batch.y, np.float32))
    model = EmbedSparseCIN(
        atom_types=28, bond_types=4, out_size=1, num_layers=2, hidden=48,
        dropout_rate=0.0, max_dim=2, use_coboundaries=True, embed_edge=True)
    tx = optax.adam(1e-3)
    report = {}

    def make_fns(b):
        variables = model.init({"params": jax.random.PRNGKey(0)}, b,
                               train=False)
        p0, bs0 = variables["params"], variables["batch_stats"]

        @jax.jit
        def fwd(p, bs):
            out, _ = model.apply({"params": p, "batch_stats": bs}, b,
                                 train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats"])
            return jnp.abs(out[:, 0] - y).sum()

        @jax.jit
        def fwdbwd(p, bs):
            def loss(pp):
                out, _ = model.apply({"params": pp, "batch_stats": bs}, b,
                                     train=True,
                                     rngs={"dropout": jax.random.PRNGKey(0)},
                                     mutable=["batch_stats"])
                return jnp.abs(out[:, 0] - y).sum()
            l, g = jax.value_and_grad(loss)(p)
            return l, g

        @functools.partial(jax.jit, donate_argnums=(2,))
        def full(p, bs, opt):
            def loss(pp):
                out, mut = model.apply(
                    {"params": pp, "batch_stats": bs}, b, train=True,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"])
                return jnp.abs(out[:, 0] - y).sum(), mut["batch_stats"]
            (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, nopt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), nbs, nopt, l

        return p0, bs0, fwd, fwdbwd, full

    for label, b in [
        ("xla", jax.device_put(batch)),
        ("pallas_p1", jax.device_put(add_tile_plans(batch,
                                                    precision="default"))),
        ("pallas_p2", jax.device_put(add_tile_plans(batch,
                                                    precision="high"))),
        ("pallas_p3", jax.device_put(add_tile_plans(batch,
                                                    precision="exact"))),
    ]:
        best = {"fwd": 1e9, "fwdbwd": 1e9, "full": 1e9}
        for alloc in range(2):
            p0, bs0, fwd, fwdbwd, full = make_fns(b)
            best["fwd"] = min(best["fwd"], timeit(fwd, p0, bs0))
            best["fwdbwd"] = min(best["fwdbwd"], timeit(fwdbwd, p0, bs0))
            # The full step donates only the opt state; params/bs reused.
            t = timeit(lambda: full(p0, bs0, tx.init(p0)), iters=30)
            best["full"] = min(best["full"], t)
        report[label] = {k: round(v * 1e3, 3) for k, v in best.items()}
        print(label, report[label], flush=True)

    with open("exp_results/perf_decomposition.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
