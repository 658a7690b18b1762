"""concat_window_plans: one kernel launch over stacked per-dim sections
must reproduce the per-plan results exactly (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cwn_tpu.ops.pallas_segment import (fused_message_fwd, segment_spmm)
from cwn_tpu.ops.tiles import build_window_plan, concat_window_plans


@pytest.fixture(autouse=True)
def _interpret_mode():
    from cwn_tpu.ops import pallas_segment
    pallas_segment.set_interpret(True)
    yield
    pallas_segment.set_interpret(False)


def _adj(seed, n_src, n_dst, e, signed=True, n_extra=None):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, e)
    dst = np.sort(rng.integers(0, n_dst, e))
    w = (rng.random(e) < 0.9).astype(np.float32)
    if signed:
        w *= rng.choice([-1.0, 1.0], e).astype(np.float32)
    extra = rng.integers(0, n_extra, e) if n_extra else None
    return src, dst, w, extra


GEOM = dict(tile=128, window=128, block=128, supertile=2)


def test_concat_identity_matches_per_plan():
    f = 32
    rng = np.random.default_rng(7)
    secs = [(256, 384, 900, 11), (384, 256, 700, 12), (128, 128, 300, 13)]
    plans, xs, outs = [], [], []
    for n_src, n_dst, e, seed in secs:
        src, dst, w, _ = _adj(seed, n_src, n_dst, e)
        p = build_window_plan(src, dst, w, n_src, n_dst, **GEOM)
        x = rng.normal(size=(n_src, f)).astype(np.float32)
        plans.append(p)
        xs.append(x)
        outs.append(np.asarray(segment_spmm(jnp.asarray(x), p)))
    src_offs = np.cumsum([0] + [p.num_src for p in plans])[:-1].tolist()
    dst_offs = np.cumsum([0] + [p.num_dst for p in plans])[:-1].tolist()
    combined = concat_window_plans(plans, src_offs, dst_offs)
    assert combined is not None
    x_all = np.concatenate(xs, axis=0)
    out_all = np.asarray(segment_spmm(jnp.asarray(x_all), combined))
    np.testing.assert_array_equal(
        out_all, np.concatenate(outs, axis=0))


def test_concat_fused_matches_per_plan():
    f = 32
    rng = np.random.default_rng(3)
    secs = [(256, 256, 192, 800, 21), (384, 128, 256, 600, 22)]
    plans, xs_l, xu_l, outs = [], [], [], []
    bias = np.zeros(f, np.float32)
    for n_src, n_dst, n_extra, e, seed in secs:
        src, dst, w, extra = _adj(seed, n_src, n_dst, e, n_extra=n_extra)
        p = build_window_plan(src, dst, w, n_src, n_dst, extra=extra,
                              num_extra=n_extra, **GEOM)
        xs = rng.normal(size=(n_src, f)).astype(np.float32)
        xu = rng.normal(size=(n_extra, f)).astype(np.float32)
        plans.append(p)
        xs_l.append(xs)
        xu_l.append(xu)
        outs.append(np.asarray(fused_message_fwd(
            jnp.asarray(xs), jnp.asarray(xu), jnp.asarray(bias), p)))
    src_offs = np.cumsum([0] + [p.num_src for p in plans])[:-1].tolist()
    dst_offs = np.cumsum([0] + [p.num_dst for p in plans])[:-1].tolist()
    ex_offs = np.cumsum([0] + [p.num_extra for p in plans])[:-1].tolist()
    combined = concat_window_plans(plans, src_offs, dst_offs, ex_offs)
    assert combined is not None
    out_all = np.asarray(fused_message_fwd(
        jnp.asarray(np.concatenate(xs_l)), jnp.asarray(np.concatenate(xu_l)),
        jnp.asarray(bias), combined))
    np.testing.assert_array_equal(out_all, np.concatenate(outs, axis=0))


def test_concat_refuses_mixed_geometry():
    src, dst, w, _ = _adj(1, 256, 256, 500)
    p1 = build_window_plan(src, dst, w, 256, 256, **GEOM)
    p2 = build_window_plan(src, dst, w, 256, 256, tile=128, window=256,
                           block=128, supertile=2)
    assert concat_window_plans([p1, p2], [0, 256], [0, 256]) is None
