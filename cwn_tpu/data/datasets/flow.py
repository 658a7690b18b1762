"""FLOW: synthetic trajectory classification on oriented 1-cochains.

Parity: /root/reference/data/datasets/flow.py + flow_utils.py.  A Delaunay
triangulation over random points with two rectangular holes; trajectories
are random walks steered around one of the holes; each sample is a signed
edge flow (a 1-cochain) with upper/lower adjacency carrying +-1 relative
orientations from the signed incidence matrices B1 (nodes x edges) and B2
(edges x triangles).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.spatial import Delaunay

from cwn_tpu.complex import Cochain, Complex
from cwn_tpu.data.datasets.base import ComplexDatasetSpec, cached_lift


def is_inside_rect(x, rect) -> bool:
    return rect[0, 0] <= x[0] <= rect[1, 0] and rect[0, 1] <= x[1] <= rect[1, 1]


def _create_hole(points, triangles, hole):
    kept, removed = [], set()
    for i, tri in enumerate(triangles):
        if any(is_inside_rect(points[v], hole) for v in tri):
            removed.update(v for v in tri if is_inside_rect(points[v], hole))
        else:
            kept.append(i)
    triangles = triangles[np.array(kept)]
    for v in range(len(points)):
        if np.sum(triangles == v) == 0:
            removed.add(v)
    points = np.delete(points, sorted(removed), axis=0)
    for v in sorted(removed, reverse=True):
        triangles[triangles >= v] -= 1
    return points, triangles


def _triangulation_tables(points, triangles):
    """Edge ids in first-encounter order over triangles (matches the
    reference's edge numbering, flow_utils.py:65-90)."""
    tuple_to_edge = {}
    adj = {}
    for tri in triangles:
        import itertools
        for v1, v2 in itertools.combinations(tri, 2):
            key = (min(v1, v2), max(v1, v2))
            if key not in tuple_to_edge:
                tuple_to_edge[key] = len(tuple_to_edge)
            adj.setdefault(int(v1), set()).add(int(v2))
            adj.setdefault(int(v2), set()).add(int(v1))
    return tuple_to_edge, adj


def extract_boundary_matrices(points, triangles):
    """Signed incidence B1 [n_nodes, n_edges], B2 [n_edges, n_tris]."""
    tuple_to_edge, _ = _triangulation_tables(points, triangles)
    n_nodes, n_edges = len(points), len(tuple_to_edge)
    B1 = np.zeros((n_nodes, n_edges))
    for (a, b), e in tuple_to_edge.items():
        B1[a, e] = -1.0
        B1[b, e] = 1.0

    B2 = np.zeros((n_edges, len(triangles)))
    for i, tri in enumerate(triangles):
        for j in range(3):
            n1, n2 = tri[j], tri[(j + 1) % 3]
            orient = 1.0 if n1 < n2 else -1.0
            B2[tuple_to_edge[(min(n1, n2), max(n1, n2))], i] = orient
    return B1, B2


def extract_adj_from_boundary(B) -> Tuple[np.ndarray, np.ndarray]:
    """Adjacency (both directions) + +-1 orientations from Bt B sign pattern
    (flow_utils.py:199-230), vectorised."""
    A = B.T @ B
    np.fill_diagonal(A, 0)
    ii, jj = np.nonzero(A)
    sel = ii > jj
    ii, jj = ii[sel], jj[sel]
    s = np.sign(A[ii, jj]).astype(np.float64)
    src = np.concatenate([ii, jj])
    dst = np.concatenate([jj, ii])
    orient = np.concatenate([s, s])
    index = (np.stack([src, dst]).astype(np.int64)
             if len(src) else np.zeros((2, 0), np.int64))
    return index, orient


def _sample_in_rect(points, rect, rng):
    cand = [i for i in range(len(points)) if is_inside_rect(points[i], rect)]
    return int(rng.choice(cand))


def generate_trajectory(points, adj, tuple_to_edge, start_rect, end_rect,
                        ckpt_rect, rng) -> np.ndarray:
    """Greedy-with-noise random walk toward checkpoint then endpoint; signed
    flow on traversed edges (flow_utils.py:140-195)."""
    n_edges = len(tuple_to_edge)
    for _attempt in range(100):
        x = np.zeros((n_edges, 1))
        v = _sample_in_rect(points, start_rect, rng)
        end_v = _sample_in_rect(points, end_rect, rng)
        ckpt_v = _sample_in_rect(points, ckpt_rect, rng)
        end_p, ckpt_p = points[end_v], points[ckpt_v]
        path = [v]
        explored = set()
        ok = True
        while v != end_v:
            explored.add(v)
            if v == ckpt_v:
                pass
            nv = np.array([u for u in adj[v] if u not in explored])
            if len(nv) == 0:
                ok = False
                break
            target = end_p if ckpt_v in explored or v == ckpt_v else ckpt_p
            dist = np.sum((points[nv] - target[None, :]) ** 2, axis=-1)
            if rng.uniform() < 0.1:
                v = int(nv[rng.integers(len(nv))])
            else:
                v = int(nv[np.argmin(dist)])
            path.append(v)
            a, b = path[-2], path[-1]
            if a < b:
                x[tuple_to_edge[(a, b)], 0] = 1.0
            else:
                x[tuple_to_edge[(b, a)], 0] = -1.0
        if ok:
            return x
    raise RuntimeError("could not generate a trajectory")


def get_orient_matrix(size: int, orientation: str, rng) -> np.ndarray:
    if orientation == "default":
        return np.identity(size)
    if orientation == "random":
        return np.diag(2 * rng.integers(0, 2, size=size) - 1).astype(float)
    raise ValueError(f"Unsupported orientation {orientation}")


def build_flow_cochain(B1, B2, T2, x, class_id) -> Complex:
    """1-cochain wrapped as a Complex (empty dim 0) for uniform batching.

    Orientation flips conjugate the adjacency signs: with T2 = diag(s),
    A' = T2 Bt B T2 so orient'(i,j) = s_i s_j orient(i,j) — the structural
    extraction runs once per triangulation and is cached on (id(B1), id(B2)).
    """
    key = (id(B1), id(B2))
    cached = _ADJ_CACHE.get(key)
    if cached is None:
        lower_index, lower_orient = extract_adj_from_boundary(B1)
        upper_index, upper_orient = extract_adj_from_boundary(B2.T)
        cached = (lower_index, lower_orient, upper_index, upper_orient)
        _ADJ_CACHE[key] = cached
    lower_index, lower_orient, upper_index, upper_orient = cached

    s = np.diag(T2).astype(np.float64)
    lo = lower_orient * s[lower_index[0]] * s[lower_index[1]] \
        if lower_index.size else lower_orient
    uo = upper_orient * s[upper_index[0]] * s[upper_index[1]] \
        if upper_index.size else upper_orient
    x = s[:, None] * x

    edge_cochain = Cochain(
        dim=1, x=x.astype(np.float32), upper_index=upper_index,
        lower_index=lower_index,
        shared_coboundaries=np.zeros(upper_index.shape[1], np.int64),
        shared_boundaries=np.zeros(lower_index.shape[1], np.int64),
        upper_orient=uo, lower_orient=lo,
        num_cells=x.shape[0])
    v_cochain = Cochain(dim=0, num_cells=0)
    return Complex(v_cochain, edge_cochain, y=np.array([class_id]),
                   dimension=1)


_ADJ_CACHE: dict = {}


def load_flow_dataset(num_points: int = 1000, num_train: int = 1000,
                      num_test: int = 200, train_orientation: str = "default",
                      test_orientation: str = "default", seed: int = 1234):
    rng = np.random.default_rng(seed)
    points = rng.uniform(-0.05, 1.05, size=(num_points, 2))
    tri = Delaunay(points)
    triangles = tri.simplices
    points, triangles = _create_hole(points, triangles,
                                     np.array([[0.2, 0.2], [0.4, 0.4]]))
    points, triangles = _create_hole(points, triangles,
                                     np.array([[0.6, 0.6], [0.8, 0.8]]))
    assert np.min(triangles) == 0 and np.max(triangles) == len(points) - 1

    tuple_to_edge, adj = _triangulation_tables(points, triangles)
    B1, B2 = extract_boundary_matrices(points, triangles)
    n_edges = B1.shape[1]

    start_rect = np.array([[0.0, 0.8], [0.2, 1.0]])
    end_rect = np.array([[0.8, 0.0], [1.0, 0.2]])
    ckpts = [np.array([[0.0, 0.0], [0.2, 0.2]]),
             np.array([[0.8, 0.8], [1.0, 1.0]])]

    def make(n, orientation):
        samples = []
        per_class = n // 2
        for i in range(n):
            cls = min(i // per_class, 1)
            x = generate_trajectory(points, adj, tuple_to_edge, start_rect,
                                    end_rect, ckpts[cls], rng)
            T2 = get_orient_matrix(n_edges, orientation, rng)
            samples.append(build_flow_cochain(B1, B2, T2, x, cls))
        return samples

    return make(num_train, train_orientation), make(num_test, test_orientation)


def load_flow_dataset_spec(num_points: int = 1000, num_train: int = 1000,
                           num_test: int = 200,
                           train_orient: str = "default",
                           test_orient: str = "default",
                           root: Optional[str] = None,
                           seed: int = 1234) -> ComplexDatasetSpec:
    key = (f"p{num_points}_tr{num_train}_te{num_test}"
           f"_{train_orient}_{test_orient}_s{seed}")

    def build():
        return load_flow_dataset(num_points, num_train, num_test,
                                 train_orient, test_orient, seed)

    train, test = cached_lift("FLOW", key, build, root)
    complexes = train + test
    return ComplexDatasetSpec(
        name="FLOW", complexes=complexes,
        train_ids=list(range(len(train))),
        val_ids=list(range(len(train), len(complexes))),
        test_ids=list(range(len(train), len(complexes))),
        max_dim=1, num_features=[0, 1], num_classes=2,
        task_type="classification", eval_metric="accuracy")
