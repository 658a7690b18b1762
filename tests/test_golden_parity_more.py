"""Golden activation parity: CIN++ conv, OrientedConv, and the embed encoders.

Extends tests/test_golden_parity.py (SparseCINCochainConv) to the remaining
model families where silent math drift would be invisible:

  - CINppCochainConv in BOTH semantics: the paper's (real lower-adjacency
    messages, this repo's default) and the reference code's quirk mode
    (`ref_quirk_no_down_msg=True`, where the down message sum is
    structurally zero — /root/reference/mp/layers.py:167-168,243-248 +
    /root/reference/mp/cell_mp.py:376 — but the eps residual, update_down
    MLP and 3-way combine remain);
  - OrientedConv / EdgeOrient (/root/reference/mp/layers.py:430-470):
    orientation-signed segment sums + three bias-free linear updates;
  - EmbedVEWithReduce + OGB Atom/Bond encoders
    (/root/reference/mp/layers.py:490-593): per-column embedding sums and
    the boundary-reduce feature initialisation (ring features halved).

Each family is checked against a from-scratch numpy oracle AND a committed
golden file so refactors cannot silently change the math
(tools/gen_golden.py regenerates the goldens after INTENTIONAL changes).
"""
import os

import numpy as np
import jax
import pytest

from cwn_tpu.batch import pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.models.cin import CINpp
from cwn_tpu.models.encoders import (
    OGB_ATOM_FEATURE_DIMS, OGB_BOND_FEATURE_DIMS, EmbedVEWithReduce)
from cwn_tpu.models.orient import EdgeOrient
from tests.fixtures import house_graph, kite_graph
from tests.test_orientation import make_flow_samples, _pack as _pack_flow

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
HIDDEN = 32


def _np(p):
    return np.asarray(p, np.float64)


# ---------------------------------------------------------------------------
# CIN++ conv
# ---------------------------------------------------------------------------


def _cinpp_batch():
    rng = np.random.default_rng(3)
    complexes = []
    for i, g in enumerate([house_graph(), kite_graph()]):
        x = rng.normal(size=(g.num_nodes, HIDDEN)).astype(np.float32)
        c = ring_2complex(x, g.edge_index, None, g.num_nodes,
                          y=np.array([i]), max_k=7)
        complexes.append(c)
    return pack_complexes(complexes, max_dim=2, pad_multiple=16)


def _cinpp_model(quirk: bool):
    return CINpp(num_input_features=HIDDEN, num_classes=2, num_layers=1,
                 hidden=HIDDEN, dropout_rate=0.0, max_dim=2,
                 use_coboundaries=True, graph_norm="id",
                 nonlinearity="relu", ref_quirk_no_down_msg=quirk)


def _cinpp_oracle_layer(batch, params, quirk: bool):
    """Numpy re-derivation of one CINppConv layer over all dims."""
    relu = lambda a: np.maximum(a, 0.0)
    xs = [_np(d.x) if d.x is not None
          else np.zeros((d.cell_mask.shape[0], HIDDEN))
          for d in batch.dims]
    out = []
    for k, buf in enumerate(batch.dims):
        p = params["conv0"][f"dim{k}"]
        x = xs[k]

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

        down = np.zeros_like(x)
        if not quirk and buf.down_src.shape[0]:
            kmat, bias = (_np(p["msg_down"]["kernel"]),
                          _np(p["msg_down"]["bias"]))
            x_dn = xs[k - 1] if k > 0 else np.zeros_like(x)
            for e in range(buf.down_src.shape[0]):
                if buf.down_mask[e] == 0:
                    continue
                msg = relu(np.concatenate(
                    [x[buf.down_src[e]],
                     x_dn[buf.down_shared[e]]]) @ kmat + bias)
                down[buf.down_dst[e]] += msg

        bnd = np.zeros_like(x)
        if k > 0 and buf.b_src.shape[0]:
            for e in range(buf.b_src.shape[0]):
                if buf.b_mask[e] == 0:
                    continue
                bnd[buf.b_dst[e]] += xs[k - 1][buf.b_src[e]]

        up = up + x       # (1 + eps) residuals with eps = 0
        down = down + x
        bnd = bnd + x

        def mlp(v, q):
            v = relu(v @ _np(q["linear_0"]["kernel"])
                     + _np(q["linear_0"]["bias"]))
            v = relu(v @ _np(q["linear_1"]["kernel"])
                     + _np(q["linear_1"]["bias"]))
            return v

        u = mlp(up, p["update_up"])
        d = mlp(down, p["update_down"])
        b = mlp(bnd, p["update_boundaries"])
        comb = relu(np.concatenate([u, d, b], axis=1)
                    @ _np(p["combine"]["kernel"]) + _np(p["combine"]["bias"]))
        out.append(comb * _np(buf.cell_mask)[:, None])
    return out


@pytest.mark.parametrize("quirk", [False, True])
def test_cinpp_conv_matches_numpy_oracle_and_golden(quirk):
    batch = _cinpp_batch()
    model = _cinpp_model(quirk)
    variables = model.init({"params": jax.random.PRNGKey(11)}, batch,
                           train=False)
    _, res = model.apply(variables, batch, train=False, include_partial=True)
    oracle = _cinpp_oracle_layer(batch, variables["params"], quirk)

    mode = "quirk" if quirk else "paper"
    got = {}
    for k in range(3):
        a = np.asarray(res[f"layer0_{k}"], np.float64)
        a = a * np.asarray(batch.dims[k].cell_mask)[:, None]
        assert np.allclose(a, oracle[k], atol=1e-4), f"{mode} dim {k}"
        got[f"{mode}_layer0_{k}"] = a.astype(np.float32)
    got[f"{mode}_out"] = np.asarray(res["out"], np.float32)

    golden = os.path.join(GOLDEN_DIR, "cinpp_parity.npz")
    assert os.path.exists(golden), "run tools/gen_golden.py"
    z = np.load(golden)
    for key, val in got.items():
        assert np.allclose(z[key], val, atol=1e-5), f"golden drift: {key}"


def test_cinpp_modes_differ():
    """The two CIN++ semantics must NOT coincide on a fixture with real
    lower adjacency (otherwise the quirk switch is vacuous)."""
    batch = _cinpp_batch()
    model_p = _cinpp_model(False)
    variables = model_p.init({"params": jax.random.PRNGKey(11)}, batch,
                             train=False)
    out_p = np.asarray(model_p.apply(variables, batch, train=False))
    out_q = np.asarray(_cinpp_model(True).apply(variables, batch,
                                                train=False))
    assert not np.allclose(out_p, out_q, atol=1e-4)


# ---------------------------------------------------------------------------
# OrientedConv / EdgeOrient
# ---------------------------------------------------------------------------


def _orient_batch():
    return _pack_flow([c for c, _ in make_flow_samples("random", seed=13)])


def _orient_model():
    return EdgeOrient(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, nonlinearity="tanh")


def _orient_oracle(batch, params):
    """Numpy re-derivation of EdgeOrient: per layer
    tanh(W0 x + W1 segsum(orient * x[src] -> dst) + W2 segsum_down(...)),
    then |.| -> per-complex sum pool -> relu lin1 -> lin2."""
    buf = batch.dims[1]
    x = _np(buf.x)
    n = x.shape[0]
    for c in range(2):
        p = params[f"conv{c}"]
        up = np.zeros_like(x)
        for e in range(buf.up_src.shape[0]):
            if buf.up_mask[e] == 0:
                continue
            up[buf.up_dst[e]] += x[buf.up_src[e]] * buf.up_orient[e]
        down = np.zeros_like(x)
        for e in range(buf.down_src.shape[0]):
            if buf.down_mask[e] == 0:
                continue
            down[buf.down_dst[e]] += x[buf.down_src[e]] * buf.down_orient[e]
        x = np.tanh(x @ _np(p["update"]["kernel"])
                    + up @ _np(p["update_up"]["kernel"])
                    + down @ _np(p["update_down"]["kernel"]))
    cell = x.copy()
    x = np.abs(x) * _np(buf.cell_mask)[:, None]
    pooled = np.zeros((batch.batch_size, x.shape[1]))
    for i in range(n):
        b = int(buf.batch[i])
        if b < batch.batch_size:
            pooled[b] += x[i]
    h = np.maximum(pooled @ _np(params["lin1"]["kernel"])
                   + _np(params["lin1"]["bias"]), 0.0)
    out = h @ _np(params["lin2"]["kernel"]) + _np(params["lin2"]["bias"])
    return cell, out


def test_oriented_conv_matches_numpy_oracle_and_golden():
    batch = _orient_batch()
    model = _orient_model()
    variables = model.init({"params": jax.random.PRNGKey(5)}, batch,
                           train=False)
    out, cell = model.apply(variables, batch, train=False,
                            include_partial=True)
    cell_o, out_o = _orient_oracle(batch, variables["params"])

    cell = np.asarray(cell, np.float64) \
        * np.asarray(batch.dims[1].cell_mask)[:, None]
    cell_o = cell_o * np.asarray(batch.dims[1].cell_mask)[:, None]
    assert np.allclose(cell, cell_o, atol=1e-5)
    assert np.allclose(np.asarray(out, np.float64), out_o, atol=1e-5)

    golden = os.path.join(GOLDEN_DIR, "orient_parity.npz")
    assert os.path.exists(golden), "run tools/gen_golden.py"
    z = np.load(golden)
    assert np.allclose(z["cell"], cell.astype(np.float32), atol=1e-5)
    assert np.allclose(z["out"], np.asarray(out, np.float32), atol=1e-5)


# ---------------------------------------------------------------------------
# Embed encoders
# ---------------------------------------------------------------------------


def _embed_batch(ogb: bool):
    rng = np.random.default_rng(17)
    complexes = []
    for i, g in enumerate([house_graph(), kite_graph()]):
        if ogb:
            x = np.stack([rng.integers(0, d, size=g.num_nodes)
                          for d in OGB_ATOM_FEATURE_DIMS], axis=1)
        else:
            x = rng.integers(0, 5, size=(g.num_nodes, 1))
        n_dir = g.edge_index.shape[1]
        if ogb:
            ea = np.stack([rng.integers(0, d, size=n_dir)
                           for d in OGB_BOND_FEATURE_DIMS], axis=1)
        else:
            ea = rng.integers(0, 3, size=(n_dir, 1))
        # Symmetrise so both directions of each undirected edge agree.
        key = {}
        for j in range(n_dir):
            u, v = int(g.edge_index[0, j]), int(g.edge_index[1, j])
            k2 = (min(u, v), max(u, v))
            if k2 in key:
                ea[j] = ea[key[k2]]
            else:
                key[k2] = j
        c = ring_2complex(x, g.edge_index, ea, g.num_nodes,
                          y=np.array([i]), max_k=7)
        complexes.append(c)
    return pack_complexes(complexes, max_dim=2, pad_multiple=16,
                          x_dtype=np.int32)


def _embed_oracle(batch, params, ogb: bool):
    """Numpy re-derivation of EmbedVEWithReduce: embed vertices, embed (or
    boundary-reduce) edges, boundary-reduce rings / 2."""
    v_buf, e_buf, c_buf = batch.dims

    def table(q):
        return _np(q["embedding"])

    if ogb:
        vx = np.zeros((v_buf.x.shape[0], 8))
        for i in range(v_buf.x.shape[1]):
            vx += table(params["v_embed"][f"emb_{i}"])[v_buf.x[:, i]]
        ex_embed = np.zeros((e_buf.x.shape[0], 8))
        for i in range(e_buf.x.shape[1]):
            ex_embed += table(params["e_embed"][f"emb_{i}"])[e_buf.x[:, i]]
    else:
        vx = table(params["v_embed"])[v_buf.x[:, 0]]
        ex_embed = table(params["e_embed"])[e_buf.x[:, 0]]

    def breduce(src_feats, buf, n):
        out = np.zeros((n, src_feats.shape[1]))
        for e in range(buf.b_src.shape[0]):
            if buf.b_mask[e] == 0:
                continue
            out[buf.b_dst[e]] += src_feats[buf.b_src[e]]
        return out

    reduced_ex = breduce(vx, e_buf, e_buf.cell_mask.shape[0])
    cx = breduce(reduced_ex, c_buf, c_buf.cell_mask.shape[0]) / 2.0
    return vx, ex_embed, cx


@pytest.mark.parametrize("ogb", [False, True])
def test_embed_encoders_match_numpy_oracle_and_golden(ogb):
    batch = _embed_batch(ogb)
    enc = EmbedVEWithReduce(atom_types=8, bond_types=4, embed_dim=8,
                            embed_edge=True, ogb_encoders=ogb)
    variables = enc.init({"params": jax.random.PRNGKey(23)}, batch)
    xs = enc.apply(variables, batch)
    vx_o, ex_o, cx_o = _embed_oracle(batch, variables["params"], ogb)

    masks = [np.asarray(d.cell_mask)[:, None] for d in batch.dims]
    got = {
        "v": np.asarray(xs[0], np.float64) * masks[0],
        "e": np.asarray(xs[1], np.float64) * masks[1],
        "c": np.asarray(xs[2], np.float64) * masks[2],
    }
    assert np.allclose(got["v"], vx_o * masks[0], atol=1e-5)
    assert np.allclose(got["e"], ex_o * masks[1], atol=1e-5)
    assert np.allclose(got["c"], cx_o * masks[2], atol=1e-5)

    golden = os.path.join(GOLDEN_DIR,
                          f"embed_{'ogb' if ogb else 'zinc'}_parity.npz")
    assert os.path.exists(golden), "run tools/gen_golden.py"
    z = np.load(golden)
    for key, val in got.items():
        assert np.allclose(z[key], val.astype(np.float32), atol=1e-5), key
