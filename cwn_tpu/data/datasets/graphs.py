"""Plain-graph dataset path for the GIN baselines.

Parity: /root/reference/data/data_loading.py:198-258 (load_graph_dataset) —
the baselines consume plain graphs, not complexes.  A plain graph maps to a
dim-0-only "complex": vertices with the edge set as upper adjacency and no
shared coboundaries; pack batches with max_dim=0 and keep_top_upper=True.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from cwn_tpu.complex import Cochain, Complex
from cwn_tpu.data.datasets.base import ComplexDatasetSpec
from cwn_tpu.data.graph import Graph


def graph_to_complex(g: Graph) -> Complex:
    ei = np.asarray(g.edge_index)
    n = g.num_nodes
    cochain = Cochain(
        dim=0, x=g.x,
        upper_index=ei if ei.size else None,
        shared_coboundaries=np.zeros(ei.shape[1], np.int64) if ei.size else None,
        y=g.y if (g.y is not None
                  and np.asarray(g.y).reshape(-1).shape[0] == n) else None,
        mask=g.mask, num_cells=n, num_cells_up=0, num_cells_down=0)
    complex_y = None
    if g.y is not None and np.asarray(g.y).reshape(-1).shape[0] != n:
        complex_y = g.y
    return Complex(cochain, y=complex_y, dimension=0)


def load_synth_graph_dataset(num_graphs: int = 32,
                             seed: int = 0) -> ComplexDatasetSpec:
    """Synthetic plain-graph dataset (GRAPH-SYNTH) so the GIN baseline
    path is exercisable offline (the TU raw files are gated)."""
    from cwn_tpu.data.synthetic import synthetic_molecules
    graphs = synthetic_molecules(num_graphs, seed=seed)
    rng = np.random.default_rng(seed)
    out = []
    for g in graphs:
        x = np.asarray(g.x, np.float32).reshape(g.num_nodes, -1)
        y = np.array([int(rng.integers(0, 2))])
        out.append(Graph(x=x, edge_index=g.edge_index, y=y))
    complexes = [graph_to_complex(g) for g in out]
    n = len(complexes)
    split = max(1, int(0.8 * n))
    return ComplexDatasetSpec(
        name="GRAPH-SYNTH", complexes=complexes,
        train_ids=list(range(split)), val_ids=list(range(split, n)),
        test_ids=list(range(split, n)), max_dim=0,
        num_features=[complexes[0].cochains[0].x.shape[1]],
        num_classes=2, task_type="classification", eval_metric="accuracy")


def load_graph_dataset(name: str, fold: int = 0, seed: int = 0,
                       root: Optional[str] = None) -> ComplexDatasetSpec:
    """Plain-graph TU datasets for GIN baselines (gin/gin_jk models)."""
    from cwn_tpu.data.datasets.tu import (
        TU_DATASETS, get_fold_indices, parse_gin_txt)
    import os
    from cwn_tpu.data.datasets.base import DEFAULT_ROOT, DatasetNotAvailable
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, name, "raw", f"{name}.txt")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            name, f"Place the GIN-format file at {raw}.")
    graphs = parse_gin_txt(raw, TU_DATASETS[name])
    complexes = [graph_to_complex(g) for g in graphs]
    labels = [int(c.y[0]) for c in complexes]
    train_ids, test_ids = get_fold_indices(labels, seed, fold)
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=train_ids,
        val_ids=test_ids, test_ids=test_ids, max_dim=0,
        num_features=[graphs[0].x.shape[1]],
        num_classes=int(max(labels)) + 1,
        task_type="classification", eval_metric="accuracy")
