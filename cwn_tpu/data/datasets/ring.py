"""Synthetic long-range benchmarks: RING-TRANSFER and RING-LOOKUP.

Parity: /root/reference/data/datasets/ring_utils.py,
ringtransfer.py, ringlookup.py.  Graphs are single cycles; the target node
(vertex 0, marked by `mask`) must predict information held by distant
nodes.  The ring lift uses max_ring_size = nodes so the whole cycle becomes
one 2-cell, giving CWN a 2-hop shortcut.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cwn_tpu.data.datasets.base import ComplexDatasetSpec
from cwn_tpu.data.graph import Graph
from cwn_tpu.lift import convert_graph_dataset_with_rings


def _cycle_edge_index(nodes: int) -> np.ndarray:
    src, dst = [], []
    for i in range(nodes - 1):
        src += [i, i + 1]
        dst += [i + 1, i]
    src += [0, nodes - 1]
    dst += [nodes - 1, 0]
    return np.array([src, dst])


def generate_ring_transfer_graph(nodes: int, target_label: np.ndarray) -> Graph:
    opposite = nodes // 2
    x = np.ones((nodes, len(target_label)), np.float32)
    x[0, :] = 0.0
    x[opposite, :] = target_label
    mask = np.zeros(nodes, bool)
    mask[0] = True
    return Graph(x=x, edge_index=_cycle_edge_index(nodes),
                 y=np.array([int(np.argmax(target_label))]), mask=mask)


def generate_ring_transfer_dataset(nodes: int, classes: int = 5,
                                   samples: int = 10000):
    out = []
    per_class = samples // classes
    for i in range(samples):
        label = i // per_class
        onehot = np.zeros(classes, np.float32)
        onehot[min(label, classes - 1)] = 1.0
        out.append(generate_ring_transfer_graph(nodes, onehot))
    return out


def generate_ring_lookup_graph(nodes: int, rng: np.random.Generator) -> Graph:
    """Dictionary-lookup ring: node 0 holds a key; the matching node holds
    the value; predict the value class."""
    keys = np.arange(1, nodes)
    vals = rng.permutation(nodes - 1)
    # One-hot encodings (sklearn LabelBinarizer equivalent for >2 classes).
    oh_keys = np.eye(nodes - 1, dtype=np.float32)[keys - 1]
    oh_vals = np.eye(nodes - 1, dtype=np.float32)[vals]
    oh_all = np.concatenate([oh_keys, oh_vals], axis=-1)
    x = np.empty((nodes, oh_all.shape[1]), np.float32)
    x[1:, :] = oh_all
    key_idx = int(rng.integers(0, nodes - 1))
    val = int(vals[key_idx])
    x[0, :] = 0.0
    x[0, :oh_keys.shape[1]] = oh_keys[key_idx]
    mask = np.zeros(nodes, bool)
    mask[0] = True
    return Graph(x=x, edge_index=_cycle_edge_index(nodes),
                 y=np.array([val]), mask=mask)


def generate_ring_lookup_dataset(nodes: int, samples: int = 10000, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [generate_ring_lookup_graph(nodes, rng) for _ in range(samples)]


def _lift_and_spec(name, graphs, nodes, train, test, num_classes, task,
                   n_jobs=1) -> ComplexDatasetSpec:
    complexes, dim, num_features = convert_graph_dataset_with_rings(
        graphs, max_ring_size=nodes, include_down_adj=False,
        init_method="sum", init_edges=True, init_rings=False, n_jobs=n_jobs)
    train_ids = list(range(train))
    val_ids = list(range(train, train + test))
    return ComplexDatasetSpec(
        name=name, complexes=complexes, train_ids=train_ids, val_ids=val_ids,
        test_ids=val_ids, max_dim=2, num_features=num_features,
        num_classes=num_classes, task_type=task, eval_metric="accuracy")


def load_ring_transfer_dataset(nodes: int = 10, train: int = 5000,
                               test: int = 500, classes: int = 5,
                               n_jobs: int = 1) -> ComplexDatasetSpec:
    graphs = (generate_ring_transfer_dataset(nodes, classes, train)
              + generate_ring_transfer_dataset(nodes, classes, test))
    return _lift_and_spec("RING-TRANSFER", graphs, nodes, train, test,
                          classes, "classification", n_jobs)


def load_ring_lookup_dataset(nodes: int = 10, train: int = 5000,
                             test: int = 500, n_jobs: int = 1
                             ) -> ComplexDatasetSpec:
    graphs = (generate_ring_lookup_dataset(nodes, train, seed=0)
              + generate_ring_lookup_dataset(nodes, test, seed=1))
    return _lift_and_spec("RING-LOOKUP", graphs, nodes, train, test,
                          nodes - 1, "classification", n_jobs)
