"""Regenerate the committed golden activation file for the parity tests.

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


def main():
    batch = _batch()
    model, variables = _model_and_params(batch)
    _, res = model.apply(variables, batch, train=False, include_partial=True)
    out = {}
    for k in range(3):
        a = np.asarray(res[f"layer0_{k}"], np.float32)
        out[f"layer0_{k}"] = a * np.asarray(batch.dims[k].cell_mask)[:, None]
    out["out"] = np.asarray(res["out"], np.float32)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **out)
    print(f"wrote {GOLDEN}: " + ", ".join(
        f"{k} {v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
