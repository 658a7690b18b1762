"""OCEAN drifters: real buoy trajectories around Madagascar.

Parity: /root/reference/data/datasets/ocean.py + ocean_utils.py.  The raw
data is a .jld2 (HDF5) file of drifter trajectories; gated offline.  Place
`dataBuoys.jld2` under datasets/OCEAN/raw/ and the loader reproduces the
reference pipeline: hex-grid simplicial complex, signed B1/B2, trajectory
1-cochains with +-1 orientations.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from cwn_tpu.complex import Cochain, Complex
from cwn_tpu.data.datasets.base import (
    ComplexDatasetSpec, DEFAULT_ROOT, DatasetNotAvailable, cached_lift)
from cwn_tpu.data.datasets.flow import (
    extract_adj_from_boundary, get_orient_matrix, build_flow_cochain)


def load_ocean_dataset(train_orient: str = "default",
                       test_orient: str = "default",
                       root: Optional[str] = None, seed: int = 0):
    root = root or DEFAULT_ROOT
    raw = os.path.join(root, "OCEAN", "raw", "dataBuoys.jld2")
    if not os.path.exists(raw):
        raise DatasetNotAvailable(
            "OCEAN",
            f"Place dataBuoys.jld2 at {raw} (from the MPSN reference repo / "
            "github.com/nglaze00/SCoNe_GCN ocean data).")

    import h5py
    rng = np.random.default_rng(seed)
    with h5py.File(raw, "r") as f:
        # Elementary structures (following the reference ocean_utils.py).
        face_arr = np.array(f[f["elist"][1]]).T - 1   # triangles (0-based)
        edge_arr = np.array(f[f["elist"][0]]).T - 1   # edges
        traj_nodes = [
            [int(v) - 1 for v in np.array(f[f[f["TrajPathsNodes"][i]][j]])
             .reshape(-1)]
            if np.array(f[f[f["TrajPathsNodes"][i]][j]]).size > 1
            else [int(np.array(f[f[f["TrajPathsNodes"][i]][j]])) - 1]
            for i in range(len(f["TrajPathsNodes"]))
            for j in range(len(f[f["TrajPathsNodes"][i]]))
        ]
        labels = np.array(f["TrajLabels"], dtype=int).reshape(-1) - 1

    n_nodes = int(max(edge_arr.max(), face_arr.max())) + 1
    edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in edge_arr})
    tuple_to_edge = {e: i for i, e in enumerate(edges)}
    n_edges = len(edges)

    B1 = np.zeros((n_nodes, n_edges))
    for (a, b), e in tuple_to_edge.items():
        B1[a, e] = -1.0
        B1[b, e] = 1.0
    tris = sorted({tuple(sorted(map(int, t))) for t in face_arr})
    B2 = np.zeros((n_edges, len(tris)))
    for i, tri in enumerate(tris):
        cyc = [(tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])]
        for n1, n2 in cyc:
            orient = 1.0 if n1 < n2 else -1.0
            B2[tuple_to_edge[(min(n1, n2), max(n1, n2))], i] = orient

    def flow_from_path(path):
        x = np.zeros((n_edges, 1))
        for a, b in zip(path[:-1], path[1:]):
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            if key not in tuple_to_edge:
                continue
            x[tuple_to_edge[key], 0] = 1.0 if a < b else -1.0
        return x

    samples = []
    for path, label in zip(traj_nodes, labels):
        samples.append((flow_from_path(path), int(label)))

    rng.shuffle(samples)
    n_test = max(1, len(samples) // 5)
    train, test = samples[:-n_test], samples[-n_test:]

    def build(split, orientation):
        out = []
        for x, cls in split:
            T2 = get_orient_matrix(n_edges, orientation, rng)
            out.append(build_flow_cochain(B1, B2, T2, x, cls))
        return out

    return build(train, train_orient), build(test, test_orient)


def load_ocean_dataset_spec(train_orient: str = "default",
                            test_orient: str = "default",
                            root: Optional[str] = None,
                            seed: int = 0) -> ComplexDatasetSpec:
    key = f"{train_orient}_{test_orient}_s{seed}"

    def build():
        return load_ocean_dataset(train_orient, test_orient, root, seed)

    train, test = cached_lift("OCEAN", key, build, root)
    complexes = train + test
    return ComplexDatasetSpec(
        name="OCEAN", complexes=complexes,
        train_ids=list(range(len(train))),
        val_ids=list(range(len(train), len(complexes))),
        test_ids=list(range(len(train), len(complexes))),
        max_dim=1, num_features=[0, 1], num_classes=2,
        task_type="classification", eval_metric="accuracy")
