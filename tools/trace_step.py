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
    """Sum per-op device time from the xplane protobuf (no plugin needed)."""
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    per_line = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                # TensorCore op lines vary by runtime; fall back to any
                # line whose events resolve through event_metadata.
                pass
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else str(ev.metadata_id)
                dur_us = ev.duration_ps / 1e6
                per_line[(plane.name, line.name)] += dur_us
                if line.name == "XLA Ops":
                    per_op[name] += dur_us

    total_op_us = sum(per_op.values())
    out = {
        "steps": steps,
        "total_xla_op_us": round(total_op_us, 1),
        "per_step_xla_op_us": round(total_op_us / max(steps, 1), 1),
        "lines_us": {f"{p} :: {l}": round(v, 1)
                     for (p, l), v in per_line.most_common(12)},
        "top_ops_us_per_step": [
            {"op": k, "us_per_step": round(v / max(steps, 1), 2),
             "pct": round(100 * v / max(total_op_us, 1e-9), 2)}
            for k, v in per_op.most_common(top)],
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
    print(json.dumps({"per_step_xla_op_us": res["per_step_xla_op_us"],
                      "out": a.out}))
    for row in res["top_ops_us_per_step"][:25]:
        print(f"{row['us_per_step']:9.2f} us  {row['pct']:5.2f}%  {row['op']}")
