"""ZINC molecular regression (12k subset / 250k full).

Parity: /root/reference/data/datasets/zinc.py (ring lift k=18, optional edge
features, splits 10000/1000/1000 for the subset).  The download is gated
offline: the loader reads graphs from `datasets/ZINC/raw/{split}.npz`
(arrays: x_cat, edge_index_cat, edge_attr_cat, y, node_ptr, edge_ptr) and
explains how to produce them when missing.  `ZINC-SYNTH` provides an
offline synthetic stand-in with the same shape/vocab/splits protocol.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.data.synthetic import synthetic_molecules
from cwn_tpu.lift import convert_graph_dataset_with_rings

ZINC_NUM_NODE_TYPE = 28
ZINC_NUM_EDGE_TYPE = 4


def _read_split_npz(path: str) -> List[Graph]:
    z = np.load(path)
    node_ptr, edge_ptr = z["node_ptr"], z["edge_ptr"]
    graphs = []
    for i in range(len(node_ptr) - 1):
        ns, ne = node_ptr[i], node_ptr[i + 1]
        es, ee = edge_ptr[i], edge_ptr[i + 1]
        graphs.append(Graph(
            x=z["x_cat"][ns:ne].reshape(-1, 1),
            edge_index=z["edge_index_cat"][:, es:ee] - ns
            if z["edge_index_cat"].size else np.zeros((2, 0), np.int64),
            edge_attr=z["edge_attr_cat"][es:ee].reshape(-1, 1),
            y=np.array([z["y"][i]], dtype=np.float64)))
    return graphs


def load_zinc_dataset(subset: bool = True, max_ring_size: int = 18,
                      use_edge_features: bool = True,
                      include_down_adj: bool = False,
                      init_method: str = "sum", root: Optional[str] = None,
                      n_jobs: int = 1) -> ComplexDatasetSpec:
    root = root or DEFAULT_ROOT
    name = "ZINC" if subset else "ZINC-FULL"
    raw_dir = os.path.join(root, name, "raw")
    splits = ["train", "val", "test"]
    paths = [os.path.join(raw_dir, f"{s}.npz") for s in splits]
    if not all(os.path.exists(p) for p in paths):
        raise DatasetNotAvailable(
            name,
            f"Export the benchmark ZINC splits to {raw_dir}/{{train,val,test}}.npz "
            "with arrays x_cat [sum_n], edge_index_cat [2, sum_e] (directed, "
            "node-offset absolute), edge_attr_cat [sum_e], y [n_graphs], "
            "node_ptr/edge_ptr prefix offsets. (From torch_geometric: "
            "ZINC(root, subset=True, split=s) then concatenate.) "
            "For an offline stand-in use dataset ZINC-SYNTH.")

    graphs, sizes = [], []
    for p in paths:
        gs = _read_split_npz(p)
        sizes.append(len(gs))
        graphs.extend(gs)

    key = f"ring{max_ring_size}_{init_method}" + \
        ("_E" if use_edge_features else "") + \
        ("_down" if include_down_adj else "")

    def build():
        return convert_graph_dataset_with_rings(
            graphs, max_ring_size=max_ring_size,
            include_down_adj=include_down_adj, init_method=init_method,
            init_edges=use_edge_features, init_rings=False, n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift(name, key, build, root)

    n_tr, n_va, n_te = sizes
    return ComplexDatasetSpec(
        name=name, complexes=complexes,
        train_ids=list(range(n_tr)),
        val_ids=list(range(n_tr, n_tr + n_va)),
        test_ids=list(range(n_tr + n_va, n_tr + n_va + n_te)),
        max_dim=2, num_features=num_features, num_classes=1,
        task_type="regression", eval_metric="mae", minimize=True,
        num_node_type=ZINC_NUM_NODE_TYPE, num_edge_type=ZINC_NUM_EDGE_TYPE)


def load_zinc_synth_dataset(n_train: int = 2000, n_val: int = 200,
                            n_test: int = 200, max_ring_size: int = 18,
                            use_edge_features: bool = True,
                            include_down_adj: bool = False,
                            init_method: str = "sum",
                            root: Optional[str] = None,
                            n_jobs: int = 1) -> ComplexDatasetSpec:
    """Synthetic ZINC-shaped dataset (offline stand-in, same protocol)."""
    total = n_train + n_val + n_test
    key = (f"ring{max_ring_size}_{init_method}_n{total}"
           + ("_E" if use_edge_features else "")
           + ("_down" if include_down_adj else ""))

    def build():
        graphs = synthetic_molecules(total, seed=0, min_nodes=10, max_nodes=30,
                                     atom_types=ZINC_NUM_NODE_TYPE,
                                     bond_types=ZINC_NUM_EDGE_TYPE)
        return convert_graph_dataset_with_rings(
            graphs, max_ring_size=max_ring_size,
            include_down_adj=include_down_adj, init_method=init_method,
            init_edges=use_edge_features, init_rings=False, n_jobs=n_jobs)

    complexes, dim, num_features = cached_lift("ZINC-SYNTH", key, build, root)
    return ComplexDatasetSpec(
        name="ZINC-SYNTH", complexes=complexes,
        train_ids=list(range(n_train)),
        val_ids=list(range(n_train, n_train + n_val)),
        test_ids=list(range(n_train + n_val, total)),
        max_dim=2, num_features=num_features, num_classes=1,
        task_type="regression", eval_metric="mae", minimize=True,
        num_node_type=ZINC_NUM_NODE_TYPE, num_edge_type=ZINC_NUM_EDGE_TYPE)
