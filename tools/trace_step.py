"""Capture a device trace of the headline bench step and report where the
time goes, op by op.

Round-4 perf lever driver: PERF.md's roofline says the composed step runs
~5x off speed-of-light while the standalone kernels are fast — this tool
shows which XLA ops (layout/copy/fusion/custom-call) eat the difference.

Usage: python tools/trace_step.py [--steps 30] [--out exp_results/trace_ops.json]
"""
import argparse
import collections
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def capture(steps: int, trace_dir: str):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.models.molec import EmbedSparseCIN

    import bench

    batch = bench._build_batch()
    y = (jnp.asarray(np.asarray(batch.y, np.float32))
         if batch.y is not None
         else jnp.zeros(batch.batch_size, jnp.float32))
    model = EmbedSparseCIN(
        atom_types=28, bond_types=4, out_size=1, num_layers=2,
        hidden=48, dropout_rate=0.0, max_dim=2, use_coboundaries=True,
        embed_edge=True)
    batch_pl = jax.device_put(add_tile_plans(batch))
    step, mk = bench._make_step(model, batch_pl, y)
    p, bs, opt = mk()
    p, bs, opt, loss = step(p, bs, opt, batch_pl)   # compile + warmup
    jax.block_until_ready(loss)
    for _ in range(5):
        p, bs, opt, loss = step(p, bs, opt, batch_pl)
    jax.block_until_ready(loss)

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            p, bs, opt, loss = step(p, bs, opt, batch_pl)
        jax.block_until_ready(loss)


def analyze(trace_dir: str, steps: int, top: int = 40):
    """Per-op and per-category device self-time via xprof's hlo_stats."""
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data([sorted(paths)[-1]],
                                                   "hlo_stats", {})
    d = json.loads(data)
    idx = {c["id"]: k for k, c in enumerate(d["cols"])}
    rows = [[(c or {}).get("v") for c in row["c"]] for row in d["rows"]]

    per_op = collections.Counter()
    per_cat = collections.Counter()
    occ = collections.Counter()
    tot = 0.0
    for row in rows:
        st = row[idx["total_self_time"]] or 0.0
        per_cat[str(row[idx["category"]])] += st
        per_op[(str(row[idx["category"]]),
                str(row[idx["hlo_op_name"]]))] += st
        occ[str(row[idx["category"]])] += row[idx["occurrences"]] or 0
        tot += st
    out = {
        "steps": steps,
        "total_device_self_us": round(tot, 1),
        "per_step_device_self_us": round(tot / max(steps, 1), 1),
        "categories_us_per_step": {
            k: {"us": round(v / max(steps, 1), 2),
                "pct": round(100 * v / max(tot, 1e-9), 1),
                "occurrences": occ[k]}
            for k, v in per_cat.most_common(12)},
        "top_ops_us_per_step": [
            {"category": c, "op": o,
             "us_per_step": round(v / max(steps, 1), 2),
             "pct": round(100 * v / max(tot, 1e-9), 2)}
            for (c, o), v in per_op.most_common(top)],
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--trace_dir", default="/tmp/cwn_trace")
    ap.add_argument("--out", default=os.path.join(
        HERE, "exp_results", "trace_ops.json"))
    ap.add_argument("--analyze_only", action="store_true")
    a = ap.parse_args()
    if not a.analyze_only:
        capture(a.steps, a.trace_dir)
    res = analyze(a.trace_dir, a.steps)
    with open(a.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"per_step_device_self_us":
                      res["per_step_device_self_us"], "out": a.out}))
    for row in res["top_ops_us_per_step"][:25]:
        print(f"{row['us_per_step']:9.2f} us  {row['pct']:5.2f}%  {row['op']}")
