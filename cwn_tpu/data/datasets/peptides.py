"""Peptides-functional / Peptides-structural (LRGB, CIN++ experiments).

Parity: /root/reference/data/datasets/peptides_functional.py /
peptides_structural.py (ring lift k=8, OGB-style features, scaffold splits).
Downloads are gated offline: place graphs.npz (same layout as ogb.py) under
datasets/PEPTIDES-F/raw/ or datasets/PEPTIDES-S/raw/.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.datasets.ogb import _read_graphs_npz
from cwn_tpu.lift import convert_graph_dataset_with_rings


def load_peptides_dataset(name: str, max_ring_size: int = 8,
                          include_down_adj: bool = True,
                          root: Optional[str] = None,
                          n_jobs: int = 1) -> ComplexDatasetSpec:
    assert name in ("PEPTIDES-F", "PEPTIDES-S")
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, name, "raw", "graphs.npz")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            name,
            f"Export the LRGB peptides dataset to {raw} (same npz layout as "
            "the OGB loaders: x_cat/edge_index_cat/edge_attr_cat/y/"
            "node_ptr/edge_ptr/train_idx/val_idx/test_idx).")

    graphs, (train_ids, val_ids, test_ids) = _read_graphs_npz(raw)
    key = f"ring{max_ring_size}" + ("_down" if include_down_adj else "")

    def build():
        return convert_graph_dataset_with_rings(
            graphs, max_ring_size=max_ring_size,
            include_down_adj=include_down_adj, init_method="sum",
            init_edges=True, init_rings=False, n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift(name, key, build, root)
    n_tasks = int(np.asarray(graphs[0].y).reshape(-1).shape[0])
    functional = name == "PEPTIDES-F"
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=train_ids, val_ids=val_ids,
        test_ids=test_ids, max_dim=2, num_features=num_features,
        num_classes=n_tasks,
        task_type="bin_classification" if functional else "regression",
        eval_metric="ap" if functional else "mae",
        minimize=not functional)
