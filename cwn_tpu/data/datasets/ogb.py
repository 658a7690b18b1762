"""OGB molecule datasets (ogbg-molhiv and friends).

Parity: /root/reference/data/datasets/ogb.py (ring lift k=6, edge features,
official scaffold splits, OGB eval metrics).  Downloads are gated offline:
the loader reads `datasets/<name>/raw/graphs.npz` (same packed layout as
zinc.py plus multi-column features and split index arrays) and explains how
to produce it when missing.  `MOLHIV-SYNTH` provides an offline stand-in
with OGB-shaped features.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import convert_graph_dataset_with_rings
from cwn_tpu.models.encoders import OGB_ATOM_FEATURE_DIMS, OGB_BOND_FEATURE_DIMS


def _read_graphs_npz(path: str):
    z = np.load(path)
    node_ptr, edge_ptr = z["node_ptr"], z["edge_ptr"]
    ys = z["y"]
    graphs = []
    for i in range(len(node_ptr) - 1):
        ns, ne = node_ptr[i], node_ptr[i + 1]
        es, ee = edge_ptr[i], edge_ptr[i + 1]
        graphs.append(Graph(
            x=z["x_cat"][ns:ne],
            edge_index=z["edge_index_cat"][:, es:ee] - ns
            if z["edge_index_cat"].size else np.zeros((2, 0), np.int64),
            edge_attr=z["edge_attr_cat"][es:ee],
            y=ys[i].astype(np.float64).reshape(1, -1)))
    splits = (z["train_idx"].tolist(), z["val_idx"].tolist(),
              z["test_idx"].tolist())
    return graphs, splits


def load_ogb_dataset(name: str = "ogbg-molhiv", max_ring_size: int = 6,
                     use_edge_features: bool = True,
                     include_down_adj: bool = False,
                     init_method: str = "sum", root: Optional[str] = None,
                     n_jobs: int = 1,
                     simple_features: bool = False) -> ComplexDatasetSpec:
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, name, "raw", "graphs.npz")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            name,
            f"Export the OGB dataset to {raw} with arrays x_cat [sum_n, 9], "
            "edge_index_cat [2, sum_e], edge_attr_cat [sum_e, 3], "
            "y [n_graphs, n_tasks], node_ptr/edge_ptr, "
            "train_idx/val_idx/test_idx (from ogb.graphproppred. "
            "PygGraphPropPredDataset + get_idx_split). "
            "For an offline stand-in use dataset MOLHIV-SYNTH.")

    graphs, (train_ids, val_ids, test_ids) = _read_graphs_npz(raw)
    if simple_features:
        for g in graphs:
            g.x = g.x[:, :2]
            if g.edge_attr is not None:
                g.edge_attr = g.edge_attr[:, :1]

    key = (f"ring{max_ring_size}_{init_method}"
           + ("_E" if use_edge_features else "")
           + ("_down" if include_down_adj else "")
           + ("_S" if simple_features else ""))

    def build():
        return convert_graph_dataset_with_rings(
            graphs, max_ring_size=max_ring_size,
            include_down_adj=include_down_adj, init_method=init_method,
            init_edges=use_edge_features, init_rings=False, n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift(name, key, build, root)
    n_tasks = int(np.asarray(graphs[0].y).reshape(-1).shape[0])
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=train_ids, val_ids=val_ids,
        test_ids=test_ids, max_dim=2, num_features=num_features,
        num_classes=n_tasks, task_type="bin_classification",
        eval_metric=name)


def load_molhiv_synth_dataset(n_train: int = 1000, n_val: int = 100,
                              n_test: int = 100, max_ring_size: int = 6,
                              root: Optional[str] = None,
                              n_jobs: int = 1) -> ComplexDatasetSpec:
    """OGB-shaped synthetic stand-in: 9-col atom / 3-col bond int features,
    binary label correlated with ring count."""
    rng = np.random.default_rng(0)
    total = n_train + n_val + n_test

    def make_graph():
        n = int(rng.integers(10, 25))
        edges = set()
        order = rng.permutation(n)
        for i in range(1, n):
            u, v = int(order[i]), int(order[rng.integers(0, i)])
            edges.add((min(u, v), max(u, v)))
        for _ in range(max(1, n // 5)):
            u, v = map(int, rng.integers(0, n, 2))
            if u != v:
                edges.add((min(u, v), max(u, v)))
        edges = sorted(edges)
        ei = np.array([[u for u, v in edges] + [v for u, v in edges],
                       [v for u, v in edges] + [u for u, v in edges]])
        x = np.stack([rng.integers(0, min(d, 8), n)
                      for d in OGB_ATOM_FEATURE_DIMS], axis=1)
        ea1 = np.stack([rng.integers(0, d, len(edges))
                        for d in OGB_BOND_FEATURE_DIMS], axis=1)
        ea = np.concatenate([ea1, ea1], axis=0)
        cyclo = len(edges) - n + 1
        y = np.array([[1.0 if cyclo > 3 else 0.0]])
        return Graph(x=x, edge_index=ei, edge_attr=ea, y=y)

    key = f"ring{max_ring_size}_n{total}"

    def build():
        graphs = [make_graph() for _ in range(total)]
        return convert_graph_dataset_with_rings(
            graphs, max_ring_size=max_ring_size, include_down_adj=False,
            init_method="sum", init_edges=True, init_rings=False,
            n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift("MOLHIV-SYNTH", key, build, root)
    return ComplexDatasetSpec(
        name="MOLHIV-SYNTH", complexes=complexes,
        train_ids=list(range(n_train)),
        val_ids=list(range(n_train, n_train + n_val)),
        test_ids=list(range(n_train + n_val, total)),
        max_dim=2, num_features=num_features, num_classes=1,
        task_type="bin_classification", eval_metric="ogbg-molhiv")
