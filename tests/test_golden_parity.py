"""Golden activation parity for SparseCINCochainConv.

The round-1 VERDICT gate: consume `include_partial` with per-layer
activation fixtures.  Three independent implementations must agree on the
house+kite batch:

  1. the flax model (XLA fallback path),
  2. the flax model with Pallas tile plans attached (kernel path,
     interpret mode on CPU),
  3. a from-scratch numpy oracle of the reference conv semantics
     (/root/reference/mp/layers.py:154-214: fused up message
     relu(W [x_j ; up_attr] + b) -> segment sum, boundary identity ->
     segment sum, (1+eps) residuals, two update MLPs, combine),

and match the committed golden file (tests/golden/sparse_cin_parity.npz)
so refactors cannot silently change the math.
"""
import os

import numpy as np
import jax
import pytest

from cwn_tpu.batch import add_tile_plans, pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.models import SparseCIN
from tests.fixtures import house_graph, kite_graph

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sparse_cin_parity.npz")
HIDDEN = 32


def _batch():
    rng = np.random.default_rng(0)
    complexes = []
    for i, g in enumerate([house_graph(), kite_graph()]):
        x = rng.normal(size=(g.num_nodes, HIDDEN)).astype(np.float32)
        c = ring_2complex(x, g.edge_index, None, g.num_nodes,
                          y=np.array([i]), max_k=7)
        complexes.append(c)
    return pack_complexes(complexes, max_dim=2, pad_multiple=16)


def _model_and_params(batch):
    model = SparseCIN(num_input_features=HIDDEN, num_classes=2,
                      num_layers=1, hidden=HIDDEN, dropout_rate=0.0,
                      max_dim=2, use_coboundaries=True, graph_norm="id",
                      nonlinearity="relu")
    variables = model.init({"params": jax.random.PRNGKey(7)}, batch,
                           train=False)
    return model, variables


def _np(p):
    return np.asarray(p, np.float64)


def _oracle_layer(batch, params):
    """Numpy re-derivation of one SparseCINConv layer over all dims."""
    relu = lambda a: np.maximum(a, 0.0)
    # Missing dim features zero-fill (ring features are off), matching
    # SparseCIN.__call__'s input handling.
    xs = [_np(d.x) if d.x is not None
          else np.zeros((d.cell_mask.shape[0], HIDDEN))
          for d in batch.dims]
    out = []
    for k, buf in enumerate(batch.dims):
        p = params["conv0"][f"dim{k}"]
        x = xs[k]
        n = x.shape[0]

        # Up channel: fused message over valid edges.
        up = np.zeros_like(x)
        if buf.up_src.shape[0]:
            kmat, bias = _np(p["msg_up"]["kernel"]), _np(p["msg_up"]["bias"])
            x_up = xs[k + 1] if k + 1 < len(xs) else np.zeros_like(x)
            for e in range(buf.up_src.shape[0]):
                if buf.up_mask[e] == 0:
                    continue
                msg = relu(np.concatenate(
                    [x[buf.up_src[e]], x_up[buf.up_cob[e]]]) @ kmat + bias)
                up[buf.up_dst[e]] += msg

        # Boundary channel: identity messages from dim k-1 features.
        bnd = np.zeros_like(x)
        if k > 0 and buf.b_src.shape[0]:
            for e in range(buf.b_src.shape[0]):
                if buf.b_mask[e] == 0:
                    continue
                bnd[buf.b_dst[e]] += xs[k - 1][buf.b_src[e]]

        up = up + x      # (1 + eps1) x with eps1 = 0
        bnd = bnd + x    # (1 + eps2) x with eps2 = 0

        def mlp(v, q):
            v = relu(v @ _np(q["linear_0"]["kernel"]) + _np(q["linear_0"]["bias"]))
            v = relu(v @ _np(q["linear_1"]["kernel"]) + _np(q["linear_1"]["bias"]))
            return v

        u = mlp(up, p["update_up"])
        b = mlp(bnd, p["update_boundaries"])
        comb = relu(np.concatenate([u, b], axis=1) @ _np(p["combine"]["kernel"])
                    + _np(p["combine"]["bias"]))
        out.append(comb * _np(buf.cell_mask)[:, None])
    return out


def test_conv_layer_matches_numpy_oracle_and_golden():
    batch = _batch()
    model, variables = _model_and_params(batch)

    _, res = model.apply(variables, batch, train=False, include_partial=True)
    oracle = _oracle_layer(batch, variables["params"])

    got = {}
    for k in range(3):
        a = np.asarray(res[f"layer0_{k}"], np.float64)
        a = a * np.asarray(batch.dims[k].cell_mask)[:, None]
        assert np.allclose(a, oracle[k], atol=1e-4), f"dim {k} vs oracle"
        got[f"layer0_{k}"] = a.astype(np.float32)
    got["out"] = np.asarray(res["out"], np.float32)

    # Regression anchor: committed golden activations.
    assert os.path.exists(GOLDEN), \
        "golden file missing - run tools/gen_golden.py"
    z = np.load(GOLDEN)
    for key, val in got.items():
        assert np.allclose(z[key], val, atol=1e-5), f"golden drift: {key}"


def test_pallas_path_matches_xla_activations():
    from cwn_tpu.ops import pallas_segment as ps

    batch = _batch()
    model, variables = _model_and_params(batch)
    _, res_xla = model.apply(variables, batch, train=False,
                             include_partial=True)

    ps.set_interpret(True)
    try:
        planned = add_tile_plans(batch, precision="exact")
        _, res_pl = model.apply(variables, planned, train=False,
                                include_partial=True)
    finally:
        ps.set_interpret(False)

    for key in res_xla:
        a, b = np.asarray(res_xla[key]), np.asarray(res_pl[key])
        assert np.allclose(a, b, atol=5e-5), f"pallas/XLA drift: {key}"
