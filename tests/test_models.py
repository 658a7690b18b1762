"""Model-level tests: invariance properties, jit, train-mode finiteness."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwn_tpu.batch import pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.models import CINpp, SparseCIN
from tests.fixtures import all_test_graphs, house_graph


def lift(g, include_down_adj=False, max_k=7):
    return ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y,
                         max_k=max_k, include_down_adj=include_down_adj)


@pytest.mark.parametrize("model_cls,down_adj", [(SparseCIN, False), (CINpp, True)])
def test_forward_finite_and_jittable(model_cls, down_adj):
    complexes = [lift(g, include_down_adj=down_adj) for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    model = model_cls(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, max_dim=2, use_coboundaries=True)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(vs, batch, train=False)
    assert np.isfinite(np.asarray(out)).all()

    jit_out = jax.jit(lambda v, b: model.apply(v, b, train=False))(vs, batch)
    assert np.allclose(np.asarray(jit_out), np.asarray(out), atol=1e-5)

    out_tr, mutated = model.apply(
        vs, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out_tr)).all()
    assert "batch_stats" in mutated


def test_permutation_invariance():
    """Parity with /root/reference/mp/test_permutation.py:9-36."""
    rng = np.random.default_rng(0)
    g = house_graph()
    c = lift(g)
    model = SparseCIN(num_input_features=1, num_classes=4, num_layers=3,
                      hidden=16, max_dim=2, use_coboundaries=True,
                      jump_mode=None)
    b0 = pack_complexes([c], max_dim=2, pad_multiple=16)
    vs = model.init({"params": jax.random.PRNGKey(0)}, b0, train=False)
    base = np.asarray(model.apply(vs, b0, train=False))

    for _ in range(4):
        perm = rng.permutation(g.num_nodes)
        x_p = np.empty_like(g.x)
        x_p[perm] = g.x
        ei_p = perm[g.edge_index]
        cp = ring_2complex(x_p, ei_p, None, g.num_nodes, y=g.y, max_k=7)
        bp = pack_complexes([cp], max_dim=2, pad_multiple=16)
        out = np.asarray(model.apply(vs, bp, train=False))
        assert np.allclose(out, base, atol=1e-5)


def test_missing_two_cells_batchwide():
    """A batch whose complexes have no 2-cells at all still runs at max_dim=2
    (parity with /root/reference/mp/test_models.py:105)."""
    from tests.fixtures import colon_graph, fullstop_graph
    complexes = [lift(fullstop_graph()), lift(colon_graph())]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=8)
    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, max_dim=2)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(vs, batch, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_jump_mode_cat():
    complexes = [lift(g) for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, max_dim=2, jump_mode="cat")
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(vs, batch, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_readout_variants():
    complexes = [lift(g) for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    for readout, final_readout, drop_pos in [
            ("mean", "mean", "lin1"), ("sum", "sum", "final_readout"),
            ("sum", "mean", "lin2")]:
        model = SparseCIN(num_input_features=1, num_classes=2, num_layers=1,
                          hidden=8, max_dim=2, readout=readout,
                          final_readout=final_readout,
                          apply_dropout_before=drop_pos)
        vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
        out = model.apply(vs, batch, train=False)
        assert np.isfinite(np.asarray(out)).all()
