"""Strongly-regular graph families (isomorphism expressivity benchmark).

Parity: /root/reference/data/datasets/sr.py + data/sr_utils.py.  Graph6
files are bundled in datasets/SR_graphs/raw.  Features are all-ones; ring
lifts initialise edge AND ring features from vertex sums (init_rings=True,
matching sr.py:92-96).
"""
from __future__ import annotations

import os
from typing import List, Optional

import networkx as nx
import numpy as np

from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, cached_lift)
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import (
    convert_graph_dataset_with_cliques, convert_graph_dataset_with_rings)

SR_FAMILIES = ["sr16622", "sr251256", "sr261034", "sr281264", "sr291467",
               "sr351668", "sr351899", "sr361446", "sr401224"]

# Per-family clique-expansion dims used by the MPSN experiments
# (/root/reference/exp/run_sr_exp.py:28-38).
SR_CLIQUE_DIMS = {"sr16622": 3, "sr251256": 4, "sr261034": 5, "sr281264": 5,
                  "sr291467": 6, "sr351668": 5, "sr351899": 6, "sr361446": 5,
                  "sr401224": 5}


def load_sr_graphs(name: str, root: Optional[str] = None) -> List[Graph]:
    root = root or DEFAULT_ROOT
    path = os.path.join(root, "SR_graphs", "raw", f"{name}.g6")
    nx_graphs = nx.read_graph6(path)
    if not isinstance(nx_graphs, list):
        nx_graphs = [nx_graphs]
    graphs = []
    for g in nx_graphs:
        n = g.number_of_nodes()
        pairs = list(g.edges())
        ei = np.array([[u for u, v in pairs] + [v for u, v in pairs],
                       [v for u, v in pairs] + [u for u, v in pairs]])
        graphs.append(Graph(x=np.ones((n, 1), np.float32), edge_index=ei))
    return graphs


def load_sr_dataset(name: str, max_ring_size: Optional[int] = None,
                    max_dim: int = 2, include_down_adj: bool = False,
                    init_method: str = "sum", root: Optional[str] = None,
                    n_jobs: int = 1) -> ComplexDatasetSpec:
    graphs = load_sr_graphs(name, root)

    if max_ring_size is not None:
        key = f"ring{max_ring_size}_{init_method}" + \
            ("_down" if include_down_adj else "")

        def build():
            return convert_graph_dataset_with_rings(
                graphs, max_ring_size=max_ring_size,
                include_down_adj=include_down_adj, init_method=init_method,
                init_edges=True, init_rings=True, n_jobs=n_jobs)
        complexes, dim, num_features = cached_lift(
            f"SR_graphs/{name}", key, build, root)
        eff_max_dim = max_dim
    else:
        key = f"clique{max_dim}_{init_method}" + \
            ("_down" if include_down_adj else "")

        def build():
            return convert_graph_dataset_with_cliques(
                graphs, expansion_dim=max_dim,
                include_down_adj=include_down_adj, init_method=init_method)
        complexes, dim, num_features = cached_lift(
            f"SR_graphs/{name}", key, build, root)
        eff_max_dim = dim

    ids = list(range(len(complexes)))
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=ids, val_ids=ids,
        test_ids=ids, max_dim=eff_max_dim, num_features=num_features,
        num_classes=16,  # embedding size used by the iso harness
        task_type="isomorphism", eval_metric="isomorphism")
