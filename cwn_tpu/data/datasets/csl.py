"""CSL: circular skip link graphs (10 classes x 15 copies, 41 nodes).

Parity: /root/reference/data/datasets/csl.py, which wraps the
Benchmarking-GNNs CSL dataset.  That dataset's 150 graphs are 15 permuted
copies of CSL(41, s) per skip s; since features are zero-initialised and the
models are permutation invariant, we generate the graphs deterministically
(a fixed-seed permutation per copy for faithfulness) and reuse the bundled
5-fold split files.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import convert_graph_dataset_with_rings

CSL_SKIPS = [2, 3, 4, 5, 6, 9, 11, 12, 13, 16]
CSL_N = 41
CSL_COPIES = 15


def csl_graph(skip: int, perm: Optional[np.ndarray] = None) -> Graph:
    n = CSL_N
    pairs = set()
    for i in range(n):
        pairs.add(tuple(sorted((i, (i + 1) % n))))
        pairs.add(tuple(sorted((i, (i + skip) % n))))
    pairs = sorted(pairs)
    if perm is not None:
        pairs = [tuple(sorted((int(perm[u]), int(perm[v])))) for u, v in pairs]
    src = [u for u, v in pairs] + [v for u, v in pairs]
    dst = [v for u, v in pairs] + [u for u, v in pairs]
    ei = np.array([src, dst])
    x = np.zeros((n, 1), np.int64)
    edge_attr = np.zeros((ei.shape[1], 1), np.int64)
    cls = CSL_SKIPS.index(skip)
    return Graph(x=x, edge_index=ei, y=np.array([cls]), edge_attr=edge_attr)


def csl_graphs():
    rng = np.random.default_rng(41)
    graphs = []
    for skip in CSL_SKIPS:
        for copy in range(CSL_COPIES):
            perm = None if copy == 0 else rng.permutation(CSL_N)
            graphs.append(csl_graph(skip, perm))
    return graphs


def load_csl_dataset(fold: int = 0, max_ring_size: int = 8,
                     include_down_adj: bool = False,
                     init_method: str = "sum",
                     root: Optional[str] = None,
                     n_jobs: int = 1) -> ComplexDatasetSpec:
    root = root or DEFAULT_ROOT
    key = f"ring{max_ring_size}_{init_method}" + \
        ("_down" if include_down_adj else "")

    def build():
        return convert_graph_dataset_with_rings(
            csl_graphs(), max_ring_size=max_ring_size,
            include_down_adj=include_down_adj, init_method=init_method,
            init_edges=True, init_rings=False, n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift("CSL", key, build, root)

    split_dir = os.path.join(root, "CSL", "splits")
    train_ids = np.loadtxt(os.path.join(split_dir, "CSL_train.txt"),
                           dtype=int, delimiter=",")[fold].tolist()
    val_ids = np.loadtxt(os.path.join(split_dir, "CSL_val.txt"),
                         dtype=int, delimiter=",")[fold].tolist()
    test_ids = np.loadtxt(os.path.join(split_dir, "CSL_test.txt"),
                          dtype=int, delimiter=",")[fold].tolist()
    assert len(train_ids) == 3 * len(test_ids)
    assert len(val_ids) == len(test_ids)

    return ComplexDatasetSpec(
        name="CSL", complexes=complexes, train_ids=train_ids, val_ids=val_ids,
        test_ids=test_ids, max_dim=2, num_features=num_features,
        num_classes=10, task_type="classification", eval_metric="accuracy",
        num_node_type=1, num_edge_type=1)
