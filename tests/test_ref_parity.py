"""TRUE reference parity: the oracle is the reference's own code.

The reference model stack under /root/reference executes on CPU torch
with ~nothing shimmed but its native kernels (tools/ref_shims: a
torch_scatter over torch.scatter_add, a typing-only SparseTensor, the
PyG Inspector/pooling helpers).  We load the SAME weights into cwn_tpu's
SparseCIN / CINpp and assert per-layer activation parity on batches of
lifted fixture graphs — reflection-driven torch engine vs explicit-
dataflow JAX engine (/root/reference/mp/models.py:194-253 include_partial
is the hook, as planned in SURVEY section 4)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from cwn_tpu.batch import pack_complexes
from cwn_tpu.lift import ring_2complex
from tests.fixtures import all_test_graphs
from tools.ref_parity import (load_reference, merge_params,
                              sparse_cin_params_from_ref, to_ref_complex)


@pytest.fixture(scope="module")
def ref_modules():
    return load_reference()


@pytest.fixture(scope="module")
def complexes():
    return [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                          y=np.array([i % 2]), max_k=7, init_rings=True)
            for i, g in enumerate(all_test_graphs())]


def _valid_rows(arr, mask):
    return np.asarray(arr)[np.asarray(mask) > 0]


def _run_pair(ref_modules, complexes, include_down, hidden=8, num_layers=2,
              graph_norm="bn", jump_mode=None):
    ref_complex, ref_models = ref_modules
    torch.manual_seed(11)

    ref_cls = ref_models.CINpp if include_down else ref_models.SparseCIN
    ref_model = ref_cls(num_input_features=1, num_classes=3,
                        num_layers=num_layers, hidden=hidden,
                        dropout_rate=0.0, max_dim=2, jump_mode=jump_mode,
                        nonlinearity="relu", readout="sum",
                        use_coboundaries=True, graph_norm=graph_norm)
    ref_model.eval()

    ref_batch = ref_complex.ComplexBatch.from_complex_list(
        [to_ref_complex(c, ref_complex) for c in complexes], max_dim=2)
    with torch.no_grad():
        ref_out, ref_res = ref_model.forward(ref_batch, include_partial=True)

    from cwn_tpu.models import CINpp, SparseCIN

    cls = CINpp if include_down else SparseCIN
    model = cls(num_input_features=1, num_classes=3, num_layers=num_layers,
                hidden=hidden, dropout_rate=0.0, max_dim=2,
                jump_mode=jump_mode, nonlinearity="relu", readout="sum",
                use_coboundaries=True, graph_norm=graph_norm,
                **({"ref_quirk_no_down_msg": True} if include_down else {}))
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    ref_params, ref_stats = sparse_cin_params_from_ref(
        ref_model, num_layers, 2, use_coboundaries=True,
        graph_norm=graph_norm, include_down=include_down)
    params = merge_params(variables["params"], ref_params)
    bstats = merge_params(variables.get("batch_stats", {}), ref_stats)

    out, res = model.apply({"params": params, "batch_stats": bstats}, batch,
                           train=False, include_partial=True)
    return ref_out, ref_res, out, res, batch


@pytest.mark.parametrize("include_down", [False, True],
                         ids=["sparse_cin", "cinpp_ref_quirk"])
def test_reference_activation_parity(ref_modules, complexes, include_down):
    ref_out, ref_res, out, res, batch = _run_pair(
        ref_modules, complexes, include_down)
    b = len(complexes)

    checked = 0
    for c in range(2):
        for k in range(3):
            key = f"layer{c}_{k}"
            ours = _valid_rows(res[key], batch.dims[k].cell_mask)
            ref = ref_res[key].detach().numpy()
            assert ours.shape == ref.shape, key
            np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4,
                                       err_msg=key)
            checked += 1
    for k in range(3):
        key = f"pool_{k}"
        np.testing.assert_allclose(np.asarray(res[key])[:b],
                                   ref_res[key].detach().numpy(),
                                   atol=2e-4, rtol=1e-4, err_msg=key)
        checked += 1
    np.testing.assert_allclose(np.asarray(out)[:b],
                               ref_out.detach().numpy(),
                               atol=2e-4, rtol=1e-4)
    assert checked == 9


def test_reference_parity_embed_sparse_cin_zinc(ref_modules):
    """The headline cwn-zinc-small model on real ZINC-SYNTH molecules:
    reference EmbedSparseCIN (embeddings + boundary-reduce ring init +
    CIN body, /root/reference/mp/molec_models.py:12-165) vs ours, same
    weights, per-layer activations."""
    ref_complex, _ = ref_modules
    import importlib

    ref_molec = importlib.import_module("mp.molec_models")
    from cwn_tpu.data.datasets import load_dataset

    ds = load_dataset("ZINC-SYNTH", max_dim=2, max_ring_size=18,
                      init_method="sum", use_edge_features=True, n_jobs=1)
    mols = ds.split("train")[:12]
    torch.manual_seed(5)
    ref_model = ref_molec.EmbedSparseCIN(
        atom_types=ds.num_node_type, bond_types=ds.num_edge_type,
        out_size=1, num_layers=2, hidden=16, dropout_rate=0.0, max_dim=2,
        nonlinearity="relu", readout="sum", final_readout="sum",
        apply_dropout_before="lin2", embed_edge=True,
        use_coboundaries=True, graph_norm="bn")
    ref_model.eval()
    ref_batch = ref_complex.ComplexBatch.from_complex_list(
        [to_ref_complex(c, ref_complex) for c in mols], max_dim=2)
    with torch.no_grad():
        ref_out, ref_res = ref_model.forward(ref_batch, include_partial=True)

    from cwn_tpu.models.molec import EmbedSparseCIN

    model = EmbedSparseCIN(
        atom_types=ds.num_node_type, bond_types=ds.num_edge_type,
        out_size=1, num_layers=2, hidden=16, dropout_rate=0.0, max_dim=2,
        nonlinearity="relu", readout="sum", final_readout="sum",
        apply_dropout_before="lin2", embed_edge=True,
        use_coboundaries=True, graph_norm="bn")
    batch = pack_complexes(mols, max_dim=2, pad_multiple=32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    ref_params, ref_stats = sparse_cin_params_from_ref(
        ref_model, 2, 2, use_coboundaries=True, graph_norm="bn")
    params = merge_params(variables["params"], ref_params)
    bstats = merge_params(variables.get("batch_stats", {}), ref_stats)
    out, res = model.apply({"params": params, "batch_stats": bstats}, batch,
                           train=False, include_partial=True)

    for c in range(2):
        for k in range(3):
            key = f"layer{c}_{k}"
            ours = _valid_rows(res[key], batch.dims[k].cell_mask)
            ref = ref_res[key].detach().numpy()
            assert ours.shape == ref.shape, key
            np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4,
                                       err_msg=key)
    np.testing.assert_allclose(np.asarray(out)[:len(mols)].reshape(-1),
                               ref_out.detach().numpy().reshape(-1),
                               atol=5e-4, rtol=1e-4)


def test_reference_parity_trained_bn_stats(ref_modules, complexes):
    """Also exercises non-trivial BN running stats: perturb the reference
    running mean/var, copy, and compare eval outputs."""
    ref_complex, ref_models = ref_modules
    torch.manual_seed(3)
    ref_model = ref_models.SparseCIN(
        num_input_features=1, num_classes=3, num_layers=2, hidden=8,
        dropout_rate=0.0, max_dim=2, nonlinearity="relu", readout="sum",
        use_coboundaries=True, graph_norm="bn")
    for mod in ref_model.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.normal_(0.0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    ref_model.eval()
    ref_batch = ref_complex.ComplexBatch.from_complex_list(
        [to_ref_complex(c, ref_complex) for c in complexes], max_dim=2)
    with torch.no_grad():
        ref_out = ref_model.forward(ref_batch)

    from cwn_tpu.models import SparseCIN

    model = SparseCIN(num_input_features=1, num_classes=3, num_layers=2,
                      hidden=8, dropout_rate=0.0, max_dim=2,
                      nonlinearity="relu", readout="sum",
                      use_coboundaries=True, graph_norm="bn")
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    ref_params, ref_stats = sparse_cin_params_from_ref(
        ref_model, 2, 2, use_coboundaries=True, graph_norm="bn")
    params = merge_params(variables["params"], ref_params)
    bstats = merge_params(variables.get("batch_stats", {}), ref_stats)
    out = model.apply({"params": params, "batch_stats": bstats}, batch,
                      train=False)
    np.testing.assert_allclose(np.asarray(out)[:len(complexes)],
                               ref_out.detach().numpy(), atol=2e-4,
                               rtol=1e-4)
