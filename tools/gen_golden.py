"""Regenerate the committed golden activation files for the parity tests.

Run from the repo root after an INTENTIONAL semantics change (and say so in
the commit message):  python tools/gen_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from tests.test_golden_parity import (  # noqa: E402
    GOLDEN, _batch, _model_and_params)
from tests.test_golden_parity_more import (  # noqa: E402
    GOLDEN_DIR, _cinpp_batch, _cinpp_model, _embed_batch, _orient_batch,
    _orient_model)
from cwn_tpu.models.encoders import EmbedVEWithReduce  # noqa: E402


def _write(path, out):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    print(f"wrote {path}: " + ", ".join(
        f"{k} {v.shape}" for k, v in out.items()))


def sparse_cin():
    batch = _batch()
    model, variables = _model_and_params(batch)
    _, res = model.apply(variables, batch, train=False, include_partial=True)
    out = {}
    for k in range(3):
        a = np.asarray(res[f"layer0_{k}"], np.float32)
        out[f"layer0_{k}"] = a * np.asarray(batch.dims[k].cell_mask)[:, None]
    out["out"] = np.asarray(res["out"], np.float32)
    _write(GOLDEN, out)


def cinpp():
    batch = _cinpp_batch()
    out = {}
    for quirk in (False, True):
        mode = "quirk" if quirk else "paper"
        model = _cinpp_model(quirk)
        variables = model.init({"params": jax.random.PRNGKey(11)}, batch,
                               train=False)
        _, res = model.apply(variables, batch, train=False,
                             include_partial=True)
        for k in range(3):
            a = np.asarray(res[f"layer0_{k}"], np.float32)
            out[f"{mode}_layer0_{k}"] = \
                a * np.asarray(batch.dims[k].cell_mask)[:, None]
        out[f"{mode}_out"] = np.asarray(res["out"], np.float32)
    _write(os.path.join(GOLDEN_DIR, "cinpp_parity.npz"), out)


def orient():
    batch = _orient_batch()
    model = _orient_model()
    variables = model.init({"params": jax.random.PRNGKey(5)}, batch,
                           train=False)
    o, cell = model.apply(variables, batch, train=False,
                          include_partial=True)
    cell = np.asarray(cell, np.float32) \
        * np.asarray(batch.dims[1].cell_mask)[:, None]
    _write(os.path.join(GOLDEN_DIR, "orient_parity.npz"),
           {"cell": cell, "out": np.asarray(o, np.float32)})


def embed():
    for ogb in (False, True):
        batch = _embed_batch(ogb)
        enc = EmbedVEWithReduce(atom_types=8, bond_types=4, embed_dim=8,
                                embed_edge=True, ogb_encoders=ogb)
        variables = enc.init({"params": jax.random.PRNGKey(23)}, batch)
        xs = enc.apply(variables, batch)
        masks = [np.asarray(d.cell_mask)[:, None] for d in batch.dims]
        _write(os.path.join(
            GOLDEN_DIR, f"embed_{'ogb' if ogb else 'zinc'}_parity.npz"),
            {"v": np.asarray(xs[0], np.float32) * masks[0],
             "e": np.asarray(xs[1], np.float32) * masks[1],
             "c": np.asarray(xs[2], np.float32) * masks[2]})


if __name__ == "__main__":
    sparse_cin()
    cinpp()
    orient()
    embed()
