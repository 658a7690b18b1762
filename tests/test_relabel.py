"""RCM re-gauging: model outputs invariant, banded plans tighter."""
import copy

import jax
import numpy as np
import pytest

from cwn_tpu.data.datasets.flow import load_flow_dataset
from cwn_tpu.lift.relabel import rcm_perms, rcm_relabel
from cwn_tpu.models.orient import EdgeOrient
from cwn_tpu.train import ComplexLoader
from cwn_tpu.ops import pallas_segment


@pytest.fixture(autouse=True)
def _interpret():
    pallas_segment.set_interpret(True)
    yield
    pallas_segment.set_interpret(False)


@pytest.fixture(scope="module")
def flow():
    train, _ = load_flow_dataset(num_points=150, num_train=8, num_test=2,
                                 train_orientation="default",
                                 test_orientation="default", seed=3)
    return train


def _run(complexes, seed=0):
    loader = ComplexLoader(complexes, batch_size=4, max_dim=1, shuffle=True,
                           seed=7, pad_multiple=16, keep_top_upper=True,
                           use_pallas=True, device_prefetch=False)
    batch = next(iter(loader))
    model = EdgeOrient(num_input_features=complexes[0].cochains[1].x.shape[1],
                       num_classes=2, num_layers=2, hidden=8,
                       dropout_rate=0.0, nonlinearity="tanh",
                       readout="sum", fully_invar=False)
    vs = model.init({"params": jax.random.PRNGKey(seed)}, batch, train=False)
    return np.asarray(model.apply(vs, batch, train=False)), batch


def test_relabel_preserves_model_output(flow):
    orig = copy.deepcopy(flow)
    out_a, _ = _run(orig)          # loader relabels in place (use_pallas)
    relabeled = copy.deepcopy(flow)
    rcm_relabel(relabeled, max_dim=1)
    assert all(getattr(c, "_rcm_relabeled", False) for c in relabeled)
    out_b, _ = _run(relabeled)
    np.testing.assert_allclose(out_a, out_b, rtol=1e-4, atol=1e-4)


def test_relabel_idempotent(flow):
    cs = copy.deepcopy(flow)
    rcm_relabel(cs, max_dim=1)
    snap = copy.deepcopy(cs[0].cochains[1].upper_index)
    rcm_relabel(cs, max_dim=1)     # second call: no-op
    np.testing.assert_array_equal(cs[0].cochains[1].upper_index, snap)


def test_relabel_consistency_invariants(flow):
    cs = copy.deepcopy(flow)
    before = cs[0]
    rcm_relabel(cs, max_dim=1)
    after = cs[0]
    co = after.cochains[1]
    n = co.num_cells
    assert co.upper_index.max() < n and co.lower_index.max() < n
    # Multisets of (sorted edge endpoints in x-row space) are preserved:
    # the gauge moves rows and ids together, so gathering x by the new ids
    # gives the same multiset of feature pairs.
    def pair_sig(c):
        co1 = c.cochains[1]
        a = co1.x[co1.upper_index[0]].ravel()
        b = co1.x[co1.upper_index[1]].ravel()
        return np.sort(a + 1000.0 * b)
    np.testing.assert_allclose(pair_sig(before), pair_sig(after),
                               rtol=1e-6, atol=1e-6)


def test_relabel_tightens_banded_plans(flow):
    from cwn_tpu.ops.banded import build_banded_plan

    cs = copy.deepcopy(flow)
    co = cs[0].cochains[1]
    n = int(co.num_cells)

    def tiles(c):
        co1 = c.cochains[1]
        p = build_banded_plan(co1.upper_index[0], co1.upper_index[1],
                              np.asarray(co1.upper_orient, np.float32),
                              n, n, block=128, window=256, max_fill=10.0)
        return p.num_tiles

    t_before = tiles(cs[0])
    rcm_relabel(cs, max_dim=1)
    t_after = tiles(cs[0])
    assert t_after <= t_before
