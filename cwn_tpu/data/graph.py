"""Plain-graph record used as input to the lifting stage.

A minimal numpy stand-in for the reference's torch_geometric `Data`
(node features, COO edge index, optional edge features and label).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Graph:
    x: np.ndarray                        # [num_nodes, F] (or [num_nodes])
    edge_index: np.ndarray               # [2, num_directed_edges]
    y: Optional[np.ndarray] = None       # [1] graph label or [num_nodes] node labels
    edge_attr: Optional[np.ndarray] = None  # [num_directed_edges, Fe]
    mask: Optional[np.ndarray] = None       # [num_nodes] bool readout mask
    num_nodes: Optional[int] = None

    def __post_init__(self):
        self.x = np.asarray(self.x)
        self.edge_index = np.asarray(self.edge_index, dtype=np.int64).reshape(2, -1)
        if self.y is not None:
            self.y = np.asarray(self.y)
        if self.edge_attr is not None:
            self.edge_attr = np.asarray(self.edge_attr)
        if self.mask is not None:
            self.mask = np.asarray(self.mask, dtype=bool)
        if self.num_nodes is None:
            self.num_nodes = int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])
