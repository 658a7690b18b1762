"""Orientation equivariance/invariance of the trajectory models.

Parity: /root/reference/mp/test_orientation.py:40-146 — flipping edge
orientations (x -> T x, adjacency orientations conjugated) must flip
OrientedConv outputs equivariantly and leave EdgeOrient model outputs
unchanged; with relu (non-odd activation) equivariance must break.
"""
import numpy as np
import jax
import pytest

from cwn_tpu.batch import pack_complexes
from cwn_tpu.data.datasets.flow import (
    build_flow_cochain, extract_boundary_matrices, get_orient_matrix)
from cwn_tpu.models.orient import EdgeMPNN, EdgeOrient


def make_flow_samples(orientation="default", seed=0, n=4, orient_seed=99):
    """Tiny triangulated square with random flows.

    The flows are drawn from `seed`; the orientation flips from
    `orient_seed` — so the same `seed` under 'default' vs 'random'
    orientation yields the SAME geometric flows, differently oriented."""
    rng = np.random.default_rng(seed)
    orng = np.random.default_rng(orient_seed)
    points = np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.], [0.5, 0.5]])
    triangles = np.array([[0, 1, 4], [1, 3, 4], [2, 3, 4], [0, 2, 4]])
    B1, B2 = extract_boundary_matrices(points, triangles)
    n_edges = B1.shape[1]
    out = []
    for i in range(n):
        x = rng.normal(size=(n_edges, 1))
        T2 = get_orient_matrix(n_edges, orientation, orng)
        out.append((build_flow_cochain(B1, B2, T2, x, i % 2), T2))
    return out


def _pack(complexes):
    return pack_complexes(complexes, max_dim=1, pad_multiple=16,
                          keep_top_upper=True)


@pytest.mark.parametrize("act", ["id", "tanh"])
def test_edge_orient_invariant_to_orientation(act):
    rng = np.random.default_rng(0)
    base = make_flow_samples("default", seed=1)
    flipped = make_flow_samples("random", seed=1)
    model = EdgeOrient(num_input_features=1, num_classes=2, num_layers=2,
                       hidden=8, nonlinearity=act)
    b0 = _pack([c for c, _ in base])
    vs = model.init({"params": jax.random.PRNGKey(0)}, b0, train=False)
    out0 = np.asarray(model.apply(vs, b0, train=False))
    out1 = np.asarray(model.apply(vs, _pack([c for c, _ in flipped]),
                                  train=False))
    assert np.allclose(out0, out1, atol=1e-5)


def test_oriented_conv_equivariance_breaks_with_relu():
    base = make_flow_samples("default", seed=2)
    flipped = make_flow_samples("random", seed=2)
    model = EdgeOrient(num_input_features=1, num_classes=2, num_layers=2,
                       hidden=8, nonlinearity="relu")
    b0 = _pack([c for c, _ in base])
    vs = model.init({"params": jax.random.PRNGKey(0)}, b0, train=False)
    out0 = np.asarray(model.apply(vs, b0, train=False))
    out1 = np.asarray(model.apply(vs, _pack([c for c, _ in flipped]),
                                  train=False))
    assert not np.allclose(out0, out1, atol=1e-5)


def test_edge_orient_invariant_on_tile_plan_path():
    """Orientation invariance must also hold on the Pallas tile-plan path
    (add_tile_plans folds orientation weights into the plan mask) — and the
    plan path must agree with the fallback segment-sum path."""
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.ops import pallas_segment

    pallas_segment.set_interpret(True)
    try:
        base = make_flow_samples("default", seed=5)
        flipped = make_flow_samples("random", seed=5)
        model = EdgeOrient(num_input_features=1, num_classes=2, num_layers=2,
                           hidden=8, nonlinearity="id")
        b_plain = _pack([c for c, _ in base])
        b0 = add_tile_plans(b_plain, precision="exact")
        b1 = add_tile_plans(_pack([c for c, _ in flipped]),
                            precision="exact")
        vs = model.init({"params": jax.random.PRNGKey(0)}, b_plain,
                        train=False)
        out_plain = np.asarray(model.apply(vs, b_plain, train=False))
        out0 = np.asarray(model.apply(vs, b0, train=False))
        out1 = np.asarray(model.apply(vs, b1, train=False))
        assert np.allclose(out_plain, out0, atol=1e-4)
        assert np.allclose(out0, out1, atol=1e-4)
    finally:
        pallas_segment.set_interpret(False)


def test_edge_mpnn_runs():
    base = make_flow_samples("default", seed=3)
    model = EdgeMPNN(num_input_features=1, num_classes=2, num_layers=2,
                     hidden=8)
    b0 = _pack([c for c, _ in base])
    vs = model.init({"params": jax.random.PRNGKey(0)}, b0, train=False)
    out = model.apply(vs, b0, train=False)
    assert np.isfinite(np.asarray(out)).all()
