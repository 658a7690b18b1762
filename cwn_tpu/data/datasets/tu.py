"""TU graph-classification datasets (IMDB, REDDIT, PROTEINS, NCI, PTC, MUTAG).

Parity: /root/reference/data/datasets/tu.py + data/tu_utils.py.  The raw
file is the GIN-style text format ("<n_graphs>", then per graph "<n> <label>"
and per node "<tag> <deg> <neighbors...>").  Downloads are gated offline:
place `<NAME>.txt` under datasets/<NAME>/raw/ (plus optional
10fold_idx/train_idx-*.txt splits) and everything works.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from sklearn.model_selection import StratifiedKFold

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import (
    convert_graph_dataset_with_cliques, convert_graph_dataset_with_rings)

# degree_as_tag per dataset (/root/reference/data/data_loading.py usage).
TU_DATASETS = {
    "MUTAG": False, "PTC": False, "PROTEINS": False, "NCI1": False,
    "NCI109": False,
    "IMDBBINARY": True, "IMDBMULTI": True, "REDDITBINARY": True,
    "REDDITMULTI5K": True,
}


def parse_gin_txt(path: str, degree_as_tag: bool) -> List[Graph]:
    """Parse the GIN benchmark text format into Graph records with one-hot
    tag features (degree one-hots when degree_as_tag)."""
    raw = []
    with open(path) as f:
        n_g = int(f.readline().strip())
        for _ in range(n_g):
            n, label = map(int, f.readline().strip().split())
            tags = []
            edges = []
            for j in range(n):
                row = f.readline().strip().split()
                tag, deg = int(row[0]), int(row[1])
                tags.append(tag)
                for k in range(2, 2 + deg):
                    edges.append((j, int(row[k])))
            raw.append((n, label, tags, edges))

    # Re-map labels to 0..C-1 in first-appearance order (reference label_dict).
    label_map = {}
    for _, label, _, _ in raw:
        if label not in label_map:
            label_map[label] = len(label_map)

    if degree_as_tag:
        for i, (n, label, tags, edges) in enumerate(raw):
            deg = np.zeros(n, int)
            und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
            for u, v in und:
                deg[u] += 1
                deg[v] += 1
            raw[i] = (n, label, deg.tolist(), edges)

    all_tags = sorted({t for _, _, tags, _ in raw for t in tags})
    tag_index = {t: i for i, t in enumerate(all_tags)}

    graphs = []
    for n, label, tags, edges in raw:
        x = np.zeros((n, len(all_tags)), np.float32)
        x[np.arange(n), [tag_index[t] for t in tags]] = 1.0
        und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
        src = [u for u, v in und] + [v for u, v in und]
        dst = [v for u, v in und] + [u for u, v in und]
        ei = np.array([src, dst]) if und else np.zeros((2, 0), np.int64)
        graphs.append(Graph(x=x, edge_index=ei,
                            y=np.array([label_map[label]]), num_nodes=n))
    return graphs


def get_fold_indices(labels: List[int], seed: int, fold_idx: int,
                     root_splits: Optional[str] = None):
    """10-fold stratified split (reference data/tu_utils.py:229-242)."""
    if root_splits is not None and os.path.isdir(root_splits):
        train = np.loadtxt(os.path.join(
            root_splits, f"train_idx-{fold_idx + 1}.txt"), dtype=int)
        test = np.loadtxt(os.path.join(
            root_splits, f"test_idx-{fold_idx + 1}.txt"), dtype=int)
        return train.tolist(), test.tolist()
    skf = StratifiedKFold(n_splits=10, shuffle=True, random_state=seed)
    idx_list = list(skf.split(np.zeros(len(labels)), labels))
    train_idx, test_idx = idx_list[fold_idx]
    return train_idx.tolist(), test_idx.tolist()


def load_tu_dataset(name: str, fold: int = 0, seed: int = 0,
                    max_dim: int = 2, max_ring_size: Optional[int] = None,
                    include_down_adj: bool = False, init_method: str = "sum",
                    root: Optional[str] = None, n_jobs: int = 1
                    ) -> ComplexDatasetSpec:
    assert name in TU_DATASETS, f"Unknown TU dataset {name}"
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, name, "raw", f"{name}.txt")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            name,
            f"Place the GIN-format file at {raw} (from the powerful-gnns "
            f"benchmark data, e.g. github.com/weihua916/powerful-gnns).")

    graphs = parse_gin_txt(raw, TU_DATASETS[name])

    if max_ring_size is not None:
        key = f"ring{max_ring_size}_{init_method}" + \
            ("_down" if include_down_adj else "")

        def build():
            return convert_graph_dataset_with_rings(
                graphs, max_ring_size=max_ring_size,
                include_down_adj=include_down_adj, init_method=init_method,
                init_edges=True, init_rings=True, n_jobs=n_jobs)
    else:
        key = f"clique{max_dim}_{init_method}" + \
            ("_down" if include_down_adj else "")

        def build():
            return convert_graph_dataset_with_cliques(
                graphs, expansion_dim=max_dim,
                include_down_adj=include_down_adj, init_method=init_method)

    complexes, dim, num_features = cached_lift(name, key, build, root)

    labels = [int(c.y[0]) for c in complexes]
    split_dir = os.path.join(root, name, "raw", "10fold_idx")
    train_ids, test_ids = get_fold_indices(
        labels, seed, fold, split_dir if os.path.isdir(split_dir) else None)

    num_classes = int(max(labels)) + 1
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=train_ids,
        val_ids=test_ids, test_ids=test_ids, max_dim=min(dim, max_dim),
        num_features=num_features, num_classes=num_classes,
        task_type="classification", eval_metric="accuracy")
