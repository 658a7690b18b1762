"""Launch-consolidated plans (add_tile_plans(combine=True)) must be
bit-compatible with the per-channel kernel path: same forward, same
gradients.

The combined plans concatenate the fac_g/fac_o reductions, the per-dim
readout pooling, and the cross-dim boundary channels into single windowed
kernels (cwn_tpu.ops.tiles.concat_window_plans); PERF.md round 5 records
the measured outcome (within HBM-placement noise on the bench step), so
the default is combine=False and this test pins the correctness of the
opt-in path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cwn_tpu.batch import add_tile_plans, pack_complexes
from cwn_tpu.data.synthetic import synthetic_molecules
from cwn_tpu.lift import convert_graph_dataset_with_rings


@pytest.fixture(autouse=True)
def _interpret_mode():
    from cwn_tpu.ops import pallas_segment
    pallas_segment.set_interpret(True)
    yield
    pallas_segment.set_interpret(False)


@pytest.fixture(scope="module")
def batches():
    graphs = synthetic_molecules(16, seed=3, min_nodes=12, max_nodes=24)
    complexes, _, _ = convert_graph_dataset_with_rings(
        graphs, max_ring_size=8, init_edges=True, init_rings=False)
    base = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    return (add_tile_plans(base, combine=False),
            add_tile_plans(base, combine=True))


def test_combined_plans_built(batches):
    _, comb = batches
    assert comb.pool_all_plan is not None
    assert comb.b_all_plan is not None and comb.b_all_dims
    assert any(d.fac_go_plan is not None for d in comb.dims)


def test_combined_model_forward_and_grads_match(batches):
    from cwn_tpu.models.molec import EmbedSparseCIN

    plain, comb = batches
    model = EmbedSparseCIN(atom_types=8, bond_types=4, out_size=1,
                           num_layers=2, hidden=32, dropout_rate=0.0,
                           max_dim=2, use_coboundaries=True,
                           embed_edge=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, plain,
                           train=False)

    def loss(v, b):
        out = model.apply(v, b, train=False)
        return jnp.sum(out ** 2)

    l0, g0 = jax.value_and_grad(loss)(variables, plain)
    l1, g1 = jax.value_and_grad(loss)(variables, comb)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
