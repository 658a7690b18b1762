"""Factorized O(memberships) upper channel vs the pairwise oracle.

The ring up-adjacency of a molecular batch is all ordered pairs of edges
sharing a ring (O(r^2) per ring); mp.factorized_up_channel reproduces the
same sum from the membership list (O(r)).  These tests pin exact-term
equality through the full model, forward and backward.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cwn_tpu.batch import pack_complexes
from cwn_tpu.data.synthetic import synthetic_molecules
from cwn_tpu.lift import convert_graph_dataset_with_rings
from cwn_tpu.models.molec import EmbedSparseCIN
from cwn_tpu.mp import factorized_up_usable


def _mol_batch():
    graphs = synthetic_molecules(16, seed=3, min_nodes=12, max_nodes=24)
    complexes, _, _ = convert_graph_dataset_with_rings(
        graphs, max_ring_size=8, init_edges=True, init_rings=False)
    return pack_complexes(complexes, max_dim=2, pad_multiple=32)


def _strip_fac(batch):
    dims = tuple(dataclasses.replace(d, fac_src=None, fac_cob=None,
                                     fac_mask=None) for d in batch.dims)
    return dataclasses.replace(batch, dims=dims)


@pytest.fixture(scope="module")
def batch():
    return _mol_batch()


def test_fac_fields_present_and_eligible(batch):
    d1 = batch.dims[1]
    assert d1.fac_src is not None
    # member-sorted, mask-consistent with the coboundary-sorted original
    valid = d1.fac_mask != 0
    assert np.all(np.diff(d1.fac_src[valid]) >= 0)
    assert d1.fac_mask.sum() == batch.dims[2].b_mask.sum()
    assert factorized_up_usable(d1, batch.dims[2], jnp.zeros((4, 48)),
                                jnp.zeros((4, 48)))
    # dim 0 pairs ~= memberships: must NOT take the factorized path
    assert not factorized_up_usable(batch.dims[0], batch.dims[1],
                                    jnp.zeros((4, 48)), jnp.zeros((4, 48)))


def test_kernelized_channel_matches_pairwise(batch):
    """The MXU-kernel variant of the factorized channel (interpret mode)
    == the pairwise oracle, through the full model."""
    from cwn_tpu.batch import add_tile_plans
    from cwn_tpu.ops import pallas_segment

    pallas_segment.set_interpret(True)
    try:
        planned = add_tile_plans(batch, tile=128, window=128, block=128)
        d1 = planned.dims[1]
        assert d1.fac_s_plan is not None and d1.fac_g_plan is not None
        from cwn_tpu.mp import factorized_kernel_usable
        assert factorized_kernel_usable(
            d1, planned.dims[2], jnp.zeros((4, 48)), jnp.zeros((4, 48)))
        model = EmbedSparseCIN(atom_types=28, bond_types=4, out_size=1,
                               num_layers=2, hidden=48, dropout_rate=0.0,
                               max_dim=2, use_coboundaries=True,
                               embed_edge=True)
        vs = model.init({"params": jax.random.PRNGKey(0)}, planned,
                        train=False)
        out_k = model.apply(vs, planned, train=False)
        out_p = model.apply(vs, _strip_fac(batch), train=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_p),
                                   rtol=2e-3, atol=2e-3)
    finally:
        pallas_segment.set_interpret(False)


def test_model_forward_matches_pairwise(batch):
    model = EmbedSparseCIN(atom_types=28, bond_types=4, out_size=1,
                           num_layers=2, hidden=48, dropout_rate=0.0,
                           max_dim=2, use_coboundaries=True, embed_edge=True)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out_fac = model.apply(vs, batch, train=False)
    out_pair = model.apply(vs, _strip_fac(batch), train=False)
    np.testing.assert_allclose(np.asarray(out_fac), np.asarray(out_pair),
                               rtol=2e-4, atol=2e-5)


def test_model_grads_match_pairwise(batch):
    model = EmbedSparseCIN(atom_types=28, bond_types=4, out_size=1,
                           num_layers=1, hidden=48, dropout_rate=0.0,
                           max_dim=2, use_coboundaries=True, embed_edge=True)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    params, bs = vs["params"], vs["batch_stats"]

    def loss(p, b):
        out, _ = model.apply({"params": p, "batch_stats": bs}, b, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        return (out[:, 0] * b.y_mask).sum()

    from jax.flatten_util import ravel_pytree
    g_fac = jax.grad(loss)(params, batch)
    g_pair = jax.grad(loss)(params, _strip_fac(batch))
    flat_f, _ = ravel_pytree(g_fac)
    flat_p, _ = ravel_pytree(g_pair)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_p),
                               rtol=2e-3, atol=2e-4)
