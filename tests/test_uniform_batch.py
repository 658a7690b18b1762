"""Shared-structure batched SpMM == per-edge fallback on uniform batches.

FLOW/OCEAN/ring-style datasets pack batches where every complex has
IDENTICAL structure; the uniform fast path runs each identity channel as
ONE structure-plan SpMM over [n_struct, B*F] features.  Outputs (and
gradients, via the custom VJP) must match the XLA segment-sum fallback.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwn_tpu.batch import add_uniform_tile_plans, pack_complexes
from cwn_tpu.models.orient import EdgeOrient
from cwn_tpu.mp import propagate
from cwn_tpu.ops import pallas_segment
from tests.test_orientation import make_flow_samples


def _uniform_batch(n=4):
    samples = make_flow_samples("default", seed=3, n=n)
    complexes = [c for c, _ in samples]
    batch = pack_complexes(complexes, max_dim=1, pad_multiple=16,
                           keep_top_upper=True)
    return add_uniform_tile_plans(batch, complexes[0], n,
                                  precision="exact"), complexes


def test_uniform_channel_matches_fallback():
    batch, complexes = _uniform_batch()
    buf = batch.dims[1]
    assert buf.uni_up_plan is not None and buf.uni_down_plan is not None
    n = buf.cell_mask.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    plain = buf.replace(uni_up_plan=None, uni_up_plan_t=None,
                        uni_down_plan=None, uni_down_plan_t=None,
                        uni_cells=None, uni_count=None)

    def run(b):
        # Identity messages; orientations ride the plan weights on the
        # uniform path and the explicit multiply on the fallback.
        up, down, _ = propagate(
            b, x,
            message_up=lambda xj, a: xj * b.up_orient[:, None],
            message_down=lambda xj, a: xj * b.down_orient[:, None],
            up_identity=True, down_identity=True)
        return up, down

    pallas_segment.set_interpret(True)
    try:
        up_u, down_u = run(buf)
    finally:
        pallas_segment.set_interpret(False)
    up_f, down_f = run(plain)
    assert np.allclose(np.asarray(up_u), np.asarray(up_f), atol=1e-5)
    assert np.allclose(np.asarray(down_u), np.asarray(down_f), atol=1e-5)


def test_edge_orient_uniform_forward_and_grad_match():
    batch, complexes = _uniform_batch()
    model = EdgeOrient(num_input_features=1, num_classes=2, num_layers=2,
                       hidden=8, nonlinearity="tanh")
    pallas_segment.set_interpret(True)
    try:
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
    finally:
        pallas_segment.set_interpret(False)

    def strip(b):
        dims = tuple(d.replace(uni_up_plan=None, uni_up_plan_t=None,
                               uni_down_plan=None, uni_down_plan_t=None,
                               uni_b_plan=None, uni_b_plan_t=None,
                               uni_cells=None, uni_count=None,
                               uni_b_src_cells=None) for d in b.dims)
        return b.replace(dims=dims)

    def loss(params, b):
        out = model.apply({"params": params}, b, train=False)
        return jnp.sum(out ** 2)

    plain = strip(batch)
    pallas_segment.set_interpret(True)
    try:
        l_u, g_u = jax.value_and_grad(loss)(variables["params"], batch)
    finally:
        pallas_segment.set_interpret(False)
    l_f, g_f = jax.value_and_grad(loss)(variables["params"], plain)

    assert np.allclose(float(l_u), float(l_f), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_loader_device_bank_matches_host_path():
    """With device_prefetch, uniform batches are formed by device-side
    gather from a staged bank; contents must equal the host template path
    batch-for-batch (same shuffle seed)."""
    from cwn_tpu.train.loader import ComplexLoader

    complexes = [c for c, _ in make_flow_samples("default", seed=6, n=10)]
    mk = lambda prefetch: ComplexLoader(
        complexes, batch_size=4, max_dim=1, shuffle=True, seed=3,
        pad_multiple=16, keep_top_upper=True, use_pallas=False,
        device_prefetch=prefetch)
    host = list(mk(False))
    dev = list(mk(True))
    assert len(host) == len(dev) == 3
    for hb, db in zip(host, dev):
        for k in range(2):
            hx, dx = hb.dims[k].x, db.dims[k].x
            if hx is None:
                assert dx is None
                continue
            assert np.allclose(np.asarray(dx), np.asarray(hx))
        assert np.allclose(np.asarray(db.y), np.asarray(hb.y))
        assert np.allclose(np.asarray(db.y_mask), np.asarray(hb.y_mask))


def test_edge_mpnn_invariant_uniform_matches_fallback():
    """Fully-invariant models (orient=False) now also take the kernel
    path: the signed plan weights are |.|'d at runtime (orientations are
    +-1), so EdgeMPNN on a uniform batch must match the plan-free
    fallback."""
    from cwn_tpu.models.orient import EdgeMPNN

    batch, _ = _uniform_batch()
    model = EdgeMPNN(num_input_features=1, num_classes=2, num_layers=2,
                     hidden=8)
    pallas_segment.set_interpret(True)
    try:
        variables = model.init({"params": jax.random.PRNGKey(2)}, batch,
                               train=False)
        out_k = model.apply(variables, batch, train=False)
    finally:
        pallas_segment.set_interpret(False)

    dims = tuple(d.replace(uni_up_plan=None, uni_up_plan_t=None,
                           uni_down_plan=None, uni_down_plan_t=None,
                           uni_b_plan=None, uni_b_plan_t=None,
                           uni_cells=None, uni_count=None,
                           uni_b_src_cells=None) for d in batch.dims)
    out_f = model.apply(variables, batch.replace(dims=dims), train=False)
    assert np.allclose(np.asarray(out_k), np.asarray(out_f), atol=1e-5)


def test_fused_device_put_equality():
    """fused_device_put (one byte-buffer upload + device unpack) must be
    leaf-for-leaf identical to plain jax.device_put, including the
    int64/f64 -> 32-bit coercions."""
    from cwn_tpu.lift import ring_2complex
    from cwn_tpu.train.loader import fused_device_put
    from tests.fixtures import all_test_graphs

    complexes = [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                               y=g.y, max_k=7)
                 for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    a = jax.device_put(batch)
    b = fused_device_put(batch)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, z in zip(la, lb):
        assert x.shape == z.shape and x.dtype == z.dtype
        assert np.array_equal(np.asarray(x), np.asarray(z))


def test_loader_attaches_uniform_plans():
    from cwn_tpu.train.loader import ComplexLoader

    complexes = [c for c, _ in make_flow_samples("default", seed=4, n=8)]
    loader = ComplexLoader(complexes, batch_size=4, max_dim=1, shuffle=True,
                           seed=0, pad_multiple=16, keep_top_upper=True,
                           use_pallas=True, device_prefetch=False)
    assert loader._is_uniform()
    b = next(iter(loader))
    d1 = b.dims[1]
    assert d1.uni_up_plan is not None
    assert d1.uni_count == 4
    # The per-edge block-diagonal plans are superseded (not built).
    assert d1.up_plan is None
