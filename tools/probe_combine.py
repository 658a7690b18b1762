"""Bisect the launch-consolidation regression: time the Pallas-arm train
step with each combined plan enabled in isolation (see PERF.md round 5).

Usage: python tools/probe_combine.py
"""
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def strip(batch, fac=False, pool=False, bnd=False):
    """Remove the named combined plans (True = strip)."""
    dims = batch.dims
    if fac:
        dims = tuple(dc.replace(d, fac_go_plan=None, fac_go_plan_t=None,
                                fac_go_split=None) for d in dims)
    rep = dict(dims=dims)
    if pool:
        rep.update(pool_all_plan=None, pool_all_plan_t=None,
                   pool_all_src_off=None, pool_all_dst_off=None)
    if bnd:
        rep.update(b_all_plan=None, b_all_plan_t=None, b_all_dims=None,
                   b_all_src_off=None, b_all_dst_off=None)
    return dc.replace(batch, **rep)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.models.molec import EmbedSparseCIN

    base = add_tile_plans(bench._build_batch())
    y = (jnp.asarray(np.asarray(base.y, np.float32)) if base.y is not None
         else jnp.zeros(base.batch_size, jnp.float32))
    model = EmbedSparseCIN(atom_types=28, bond_types=4, out_size=1,
                           num_layers=2, hidden=48, dropout_rate=0.0,
                           max_dim=2, use_coboundaries=True, embed_edge=True)

    configs = {
        "none": strip(base, fac=True, pool=True, bnd=True),
        "fac": strip(base, pool=True, bnd=True),
        "pool": strip(base, fac=True, bnd=True),
        "bnd": strip(base, fac=True, pool=True),
        "all": base,
    }
    for name, b in configs.items():
        b = jax.device_put(b)
        step, mk = bench._make_step(model, b, y)
        # 2 allocations, best-of: coarse placement control.
        best = float("inf")
        for _ in range(2):
            p, bs, opt = mk()
            dt = bench._time_steps(step, p, bs, opt, b, iters=30, windows=2)
            best = min(best, dt)
        print(f"{name:6s} {best * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
