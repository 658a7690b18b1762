"""Dataset suite tests: loaders, splits, gating, evaluator metrics."""
import numpy as np
import pytest

from cwn_tpu.data.datasets import DatasetNotAvailable, load_dataset
from cwn_tpu.train.evaluator import Evaluator


def test_sr_bundled():
    ds = load_dataset("sr16622", max_ring_size=4)
    assert len(ds.complexes) == 2
    assert ds.task_type == "isomorphism"
    for c in ds.complexes:
        assert c.cochains[0].num_cells == 16
        assert c.cochains[1].num_cells == 48


def test_csl_generated_with_bundled_splits():
    ds = load_dataset("CSL", fold=1)
    assert len(ds.complexes) == 150
    assert len(ds.train_ids) == 90
    assert len(ds.val_ids) == 30 and len(ds.test_ids) == 30
    assert ds.num_classes == 10
    # Labels follow the canonical class order (idx // 15).
    for i in (0, 14, 15, 149):
        assert int(ds.complexes[i].y[0]) == i // 15


def test_ring_transfer_structure():
    ds = load_dataset("RING-TRANSFER", max_ring_size=12, train=20, test=5)
    c = ds.complexes[0]
    assert c.cochains[0].num_cells == 12
    assert c.cochains[1].num_cells == 12
    assert c.cochains[2].num_cells == 1        # whole cycle = one 2-cell
    assert c.cochains[0].mask.sum() == 1       # one target node


def test_ring_lookup_labels():
    ds = load_dataset("RING-LOOKUP", max_ring_size=8, train=10, test=5)
    assert ds.num_classes == 7
    for c in ds.complexes:
        assert 0 <= int(c.y[0]) < 7


def test_gated_datasets_raise():
    for name in ("ZINC", "ogbg-molhiv", "PROTEINS", "OCEAN", "PEPTIDES-F"):
        with pytest.raises(DatasetNotAvailable):
            load_dataset(name, use_edge_features=True)


def test_zinc_synth():
    ds = load_dataset("ZINC-SYNTH", use_edge_features=True,
                      n_train=30, n_val=10, n_test=10)
    assert ds.task_type == "regression" and ds.minimize
    assert ds.num_node_type == 28 and ds.num_edge_type == 4
    assert len(ds.train_ids) == 30


def test_evaluator_metrics():
    ev = Evaluator("accuracy")
    acc = ev.eval({"y_true": np.array([0, 1, 1]),
                   "y_pred": np.array([[2., 1.], [0., 3.], [1., 0.]])})
    assert abs(acc - 2 / 3) < 1e-9

    ev = Evaluator("mae")
    mae = ev.eval({"y_true": np.array([1.0, 2.0]),
                   "y_pred": np.array([1.5, 1.0])})
    assert abs(mae - 0.75) < 1e-9

    ev = Evaluator("ogbg-molhiv")
    auc = ev.eval({"y_true": np.array([[0.], [1.], [1.], [0.]]),
                   "y_pred": np.array([[0.1], [0.8], [0.6], [0.3]])})
    assert abs(auc - 1.0) < 1e-9

    ev = Evaluator("isomorphism")
    preds = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]], dtype=np.float64)
    rate = ev.eval({"y_pred": preds, "y_true": None})
    assert abs(rate - 1 / 3) < 1e-9  # one coincident pair of three


def test_flow_dataset_shapes():
    ds = load_dataset("FLOW", num_points=150, num_train=8, num_test=4)
    assert len(ds.complexes) == 12
    c = ds.complexes[0]
    co = c.cochains[1]
    assert co.upper_orient is not None and co.lower_orient is not None
    assert set(np.unique(co.upper_orient)).issubset({-1.0, 1.0})
    assert set(np.unique(co.x)).issubset({-1.0, 0.0, 1.0})


def test_ocean_synth_dataset():
    """OCEAN-SYNTH: drifters around an island through the ocean pipeline
    (sorted-set edge numbering, signed B1/B2, path->flow conversion)."""
    from cwn_tpu.data.datasets.ocean import load_ocean_synth_dataset
    from cwn_tpu.train.loader import _structures_identical

    train, test = load_ocean_synth_dataset(num_points=300, num_samples=30,
                                           test_orient="random", seed=3)
    assert len(train) == 24 and len(test) == 6
    co = train[0].cochains[1]
    assert co.upper_orient is not None and co.lower_orient is not None
    assert set(np.unique(co.x)).issubset({-1.0, 0.0, 1.0})
    # A trajectory traverses a connected chain of edges.
    assert (np.abs(co.x) > 0).sum() > 3
    ys = [int(c.y[0]) for c in train + test]
    assert 0 < sum(ys) < len(ys)
    # Default-orientation split shares one structure (uniform fast path);
    # random test orientations break it.
    assert _structures_identical(train, 1)
    assert not _structures_identical(test, 1)
