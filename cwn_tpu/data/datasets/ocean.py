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


def build_ocean_arrays(edge_arr, face_arr):
    """The ocean pipeline's structural stage: sorted-set edge numbering,
    signed B1 [n_nodes, n_edges], B2 [n_edges, n_tris] with the cyclic
    per-triangle orientation convention
    (/root/reference/data/datasets/ocean_utils.py:77-172 semantics)."""
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
    return tuple_to_edge, B1, B2


def flow_from_path(path, tuple_to_edge, n_edges):
    """Node path -> signed edge flow (+1 along ascending node ids)."""
    x = np.zeros((n_edges, 1))
    for a, b in zip(path[:-1], path[1:]):
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key not in tuple_to_edge:
            continue
        x[tuple_to_edge[key], 0] = 1.0 if a < b else -1.0
    return x


def _build_splits(samples, rng, train_orient, test_orient, B1, B2):
    n_edges = B1.shape[1]
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

    tuple_to_edge, B1, B2 = build_ocean_arrays(edge_arr, face_arr)
    samples = [(flow_from_path(path, tuple_to_edge, B1.shape[1]), int(label))
               for path, label in zip(traj_nodes, labels)]
    return _build_splits(samples, rng, train_orient, test_orient, B1, B2)


# ---------------------------------------------------------------------------
# OCEAN-SYNTH: synthetic drifters on an annulus ("island") triangulation
# through the SAME pipeline stages as the real buoy data (structural arrays
# from build_ocean_arrays, node paths -> signed flows via flow_from_path,
# orientation matrices + cochain assembly via the flow utilities).
# ---------------------------------------------------------------------------


def _annulus_triangulation(num_points: int, rng):
    """Delaunay triangulation of a disk with a central island removed."""
    from scipy.spatial import Delaunay

    pts = rng.uniform(-1.0, 1.0, size=(num_points * 2, 2))
    r = np.linalg.norm(pts, axis=1)
    pts = pts[(r <= 1.0) & (r >= 0.05)][:num_points]
    tri = Delaunay(pts)
    triangles = tri.simplices
    hole = 0.45
    # Drop triangles with a vertex on the island or spanning it (centroid
    # inside), then drop orphaned vertices and reindex.
    keep = []
    for t in triangles:
        if np.all(np.linalg.norm(pts[t], axis=1) > hole) and \
                np.linalg.norm(pts[t].mean(axis=0)) > hole:
            keep.append(t)
    triangles = np.array(keep)
    used = np.unique(triangles)
    remap = -np.ones(len(pts), np.int64)
    remap[used] = np.arange(len(used))
    return pts[used], remap[triangles]


def _walk_around_island(points, adj, start_v, waypoints, rng, max_steps=400):
    """Greedy-with-noise walk visiting waypoint positions in order
    (the drifter analogue of the flow generator's checkpointed walk)."""
    path = [start_v]
    explored = set()
    v = start_v
    wp = list(waypoints)
    for _ in range(max_steps):
        if not wp:
            return path
        explored.add(v)
        target = wp[0]
        if np.linalg.norm(points[v] - target) < 0.25:
            wp.pop(0)
            continue
        nv = [u for u in adj[v] if u not in explored]
        if not nv:
            return None
        nv = np.array(nv)
        if rng.uniform() < 0.1:
            v = int(nv[rng.integers(len(nv))])
        else:
            dist = np.sum((points[nv] - target[None, :]) ** 2, axis=-1)
            v = int(nv[np.argmin(dist)])
        path.append(v)
    return None


def load_ocean_synth_dataset(num_points: int = 350, num_samples: int = 250,
                             train_orient: str = "default",
                             test_orient: str = "default", seed: int = 0):
    """Synthetic drifter trajectories circling an island, labelled by
    direction (0 = clockwise, 1 = counter-clockwise) — the task structure
    of the Madagascar buoy dataset, generated on an annulus and run
    through the ocean pipeline's own stages."""
    rng = np.random.default_rng(seed)
    points, triangles = _annulus_triangulation(num_points, rng)
    import itertools

    edge_arr = np.array(sorted({(min(a, b), max(a, b)) for t in triangles
                                for a, b in itertools.combinations(t, 2)}))
    tuple_to_edge, B1, B2 = build_ocean_arrays(edge_arr, triangles)
    adj = {}
    for a, b in edge_arr:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))

    ang = np.arctan2(points[:, 1], points[:, 0])
    west = np.nonzero(np.abs(np.abs(ang) - np.pi) < 0.5)[0]

    def waypoints(ccw):
        r = 0.75
        angles = [np.pi / 2, 0.0, -np.pi / 2] if ccw else \
            [-np.pi / 2, 0.0, np.pi / 2]
        return [r * np.array([np.cos(a), np.sin(a)]) for a in angles]

    samples = []
    per_class = num_samples // 2
    for i in range(num_samples):
        cls = min(i // per_class, 1)
        for _attempt in range(200):
            start = int(rng.choice(west))
            path = _walk_around_island(points, adj, start,
                                       waypoints(ccw=bool(cls)), rng)
            if path is not None and len(path) > 3:
                break
        else:
            raise RuntimeError("could not generate an ocean-synth drifter")
        samples.append((flow_from_path(path, tuple_to_edge, B1.shape[1]),
                        cls))
    return _build_splits(samples, rng, train_orient, test_orient, B1, B2)


def load_ocean_synth_dataset_spec(train_orient: str = "default",
                                  test_orient: str = "default",
                                  root: Optional[str] = None,
                                  seed: int = 0) -> ComplexDatasetSpec:
    key = f"{train_orient}_{test_orient}_s{seed}"

    def build():
        return load_ocean_synth_dataset(train_orient=train_orient,
                                        test_orient=test_orient, seed=seed)

    train, test = cached_lift("OCEAN-SYNTH", key, build, root)
    complexes = train + test
    return ComplexDatasetSpec(
        name="OCEAN-SYNTH", complexes=complexes,
        train_ids=list(range(len(train))),
        val_ids=list(range(len(train), len(complexes))),
        test_ids=list(range(len(train), len(complexes))),
        max_dim=1, num_features=[0, 1], num_classes=2,
        task_type="classification", eval_metric="accuracy")


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
