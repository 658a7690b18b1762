"""CLUSTER node-classification dataset (legacy, gated).

Parity: /root/reference/data/datasets/cluster.py — a Benchmarking-GNNs SBM
dataset with node-level labels, lifted to clique complexes.  The download
is gated offline; place graphs.npz (ogb-style layout plus per-NODE y
concatenated as y_cat [sum_n]) under datasets/CLUSTER/raw/.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import convert_graph_dataset_with_cliques


def load_cluster_dataset(max_dim: int = 2, root: Optional[str] = None,
                         init_method: str = "sum") -> ComplexDatasetSpec:
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, "CLUSTER", "raw", "graphs.npz")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            "CLUSTER",
            f"Export the Benchmarking-GNNs CLUSTER dataset to {raw} with "
            "arrays x_cat, edge_index_cat, y_cat (per-node labels), "
            "node_ptr/edge_ptr, train_idx/val_idx/test_idx.")

    z = np.load(raw)
    node_ptr, edge_ptr = z["node_ptr"], z["edge_ptr"]
    graphs = []
    for i in range(len(node_ptr) - 1):
        ns, ne = node_ptr[i], node_ptr[i + 1]
        es, ee = edge_ptr[i], edge_ptr[i + 1]
        graphs.append(Graph(
            x=z["x_cat"][ns:ne],
            edge_index=z["edge_index_cat"][:, es:ee] - ns,
            y=z["y_cat"][ns:ne]))          # node labels

    key = f"clique{max_dim}_{init_method}"

    def build():
        return convert_graph_dataset_with_cliques(
            graphs, expansion_dim=max_dim, init_method=init_method)

    complexes, dim, num_features = cached_lift("CLUSTER", key, build, root)
    labels = np.concatenate([c.cochains[0].y for c in complexes])
    return ComplexDatasetSpec(
        name="CLUSTER", complexes=complexes,
        train_ids=z["train_idx"].tolist(), val_ids=z["val_idx"].tolist(),
        test_ids=z["test_idx"].tolist(), max_dim=min(dim, max_dim),
        num_features=num_features, num_classes=int(labels.max()) + 1,
        task_type="classification", eval_metric="accuracy")
