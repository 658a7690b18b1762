"""SR expressivity guards (parity: /root/reference/exp/test_sr.py:90-128).

1. Self-isomorphism: an untrained fp64 SparseCIN must embed every SR graph
   and a permuted copy within eps (else the isomorphism metric is invalid).
2. Magnitude guard: fp64 embeddings stay far below the scale where eps=0.01
   would drown in representation error.
3. Expressivity: the smallest family is fully distinguished (failure 0.0).
"""
import numpy as np
import jax
import pytest

from cwn_tpu.data.perm_utils import permute_graph
from cwn_tpu.exp.analysis import sr_embedding_magnitude
from cwn_tpu.exp.parser import get_parser
from cwn_tpu.exp.run_exp import main


pytestmark = pytest.mark.slow


def _sr_args(dataset):
    return get_parser().parse_args([
        "--dataset", dataset, "--model", "sparse_cin", "--untrained",
        "--task_type", "isomorphism", "--eval_metric", "isomorphism",
        "--nonlinearity", "elu", "--max_ring_size", "4", "--emb_dim", "16",
        "--num_layers", "3", "--batch_size", "8", "--use_coboundaries",
        "True", "--graph_norm", "id", "--seed", "7"])


def test_sr16622_zero_failure_and_magnitude():
    res = main(_sr_args("sr16622"))
    assert res["failure_rate"] == 0.0
    assert res["y_pred_mag"] < 5e8      # fp64 magnitude guard


def test_sr_self_isomorphism():
    """Permuted copies must embed identically (within eps) in fp64."""
    from cwn_tpu.batch import pack_complexes
    from cwn_tpu.data.datasets.sr import load_sr_graphs
    from cwn_tpu.lift import ring_2complex
    from cwn_tpu.models import SparseCIN

    jax.config.update("jax_enable_x64", True)
    try:
        graphs = load_sr_graphs("sr16622")
        rng = np.random.default_rng(0)
        model = SparseCIN(num_input_features=1, num_classes=16, num_layers=3,
                          hidden=16, max_dim=2, use_coboundaries=True,
                          nonlinearity="elu", graph_norm="id",
                          dropout_rate=0.0)
        vs = None
        for g in graphs:
            gp, _ = permute_graph(g, rng=rng)
            emb = []
            for gg in (g, gp):
                c = ring_2complex(gg.x, gg.edge_index, None, gg.num_nodes,
                                  max_k=4, init_edges=True, init_rings=True)
                b = pack_complexes([c], max_dim=2, pad_multiple=16,
                                   x_dtype=np.float64)
                if vs is None:
                    vs = model.init({"params": jax.random.PRNGKey(1)}, b,
                                    train=False)
                    vs = jax.tree.map(
                        lambda a: a.astype(np.float64)
                        if hasattr(a, "dtype") and np.issubdtype(a.dtype, np.floating)
                        else a, vs)
                emb.append(np.asarray(model.apply(vs, b, train=False))[0])
            dist = np.linalg.norm(emb[0] - emb[1])
            assert dist < 0.01, f"self-isomorphism violated: {dist}"
    finally:
        jax.config.update("jax_enable_x64", False)
