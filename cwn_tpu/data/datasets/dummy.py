"""Fixture-based dummy datasets for offline end-to-end smoke tests.

Parity: /root/reference/data/datasets/dummy.py (DummyDataset /
DummyMolecularDataset over the hand-built complexes).  Ours lifts the
fixture graphs with the real lift.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cwn_tpu.data.datasets.base import ComplexDatasetSpec
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import convert_graph_dataset_with_rings


def _fixture_graphs(molecular: bool):
    # Import here to avoid coupling the package to tests/ at import time.
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))), "tests"))
    from fixtures import all_test_graphs
    graphs = []
    for g in all_test_graphs():
        if molecular:
            # Scalar integer features + binary has-ring label.
            x = np.clip(np.asarray(g.x, np.int64), 0, 20)
            n_edges = g.edge_index.shape[1] // 2
            ea = np.zeros((g.edge_index.shape[1], 1), np.int64)
            graphs.append(Graph(x=x, edge_index=g.edge_index, y=g.y,
                                edge_attr=ea))
        else:
            graphs.append(g)
    return graphs


def load_dummy_dataset(molecular: bool = False, repeats: int = 4,
                       n_jobs: int = 1) -> ComplexDatasetSpec:
    graphs = _fixture_graphs(molecular) * repeats
    # Binary label: does the graph contain a ring?
    complexes, dim, num_features = convert_graph_dataset_with_rings(
        graphs, max_ring_size=7, include_down_adj=True, init_method="sum",
        init_edges=True, init_rings=False, n_jobs=n_jobs)
    for c in complexes:
        has_ring = 2 in c.cochains and c.cochains[2].num_cells > 0
        c.y = np.array([1 if has_ring else 0])
    n = len(complexes)
    ids = list(range(n))
    split = max(1, int(0.8 * n))
    return ComplexDatasetSpec(
        name="DUMMYM" if molecular else "DUMMY",
        complexes=complexes, train_ids=ids[:split], val_ids=ids[split:],
        test_ids=ids[split:], max_dim=2, num_features=num_features,
        num_classes=2, task_type="classification", eval_metric="accuracy",
        num_node_type=21, num_edge_type=1)
