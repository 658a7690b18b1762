"""Builders for tiny raw dataset files in each gated loader's on-disk format.

Every gated loader (ZINC/OGB/TU/PEPTIDES/CLUSTER/OCEAN) expects a specific
raw layout that normally comes from `tools/export_datasets.py` run in an
environment with egress.  These builders write miniature files in exactly
those layouts so the parsing + lift + packing + training path of every
loader is exercised offline (the reference tests its parsers offline the
same way, e.g. /root/reference/data/test_tu_utils.py).
"""
from __future__ import annotations

import os

import numpy as np


def _tiny_molecules(rng, n_graphs, node_vocab, edge_vocab):
    """Small ring+tail molecules; returns per-graph (x, und_edges, ea_und).

    node_vocab/edge_vocab: int (single scalar column) or a per-column
    vocab-size list (OGB-style multi-column integer features)."""
    nv = [node_vocab] if np.isscalar(node_vocab) else list(node_vocab)
    ev = [edge_vocab] if np.isscalar(edge_vocab) else list(edge_vocab)
    out = []
    for _ in range(n_graphs):
        ring = int(rng.integers(3, 7))
        tail = int(rng.integers(0, 3))
        n = ring + tail
        und = [(i, (i + 1) % ring) for i in range(ring)]
        for t in range(tail):
            und.append((int(rng.integers(0, ring + t)), ring + t))
        und = sorted((min(u, v), max(u, v)) for u, v in und)
        x = np.stack([rng.integers(0, d, n) for d in nv], axis=1)
        ea = np.stack([rng.integers(0, d, len(und)) for d in ev], axis=1)
        out.append((x, und, ea))
    return out


def _pack_cat(graphs, ys, with_splits=False, y_cat=None):
    """Concatenate per-graph arrays into the shared npz layout."""
    xs, eis, eas, nptr, eptr = [], [], [], [0], [0]
    base = 0
    for x, und, ea in graphs:
        n = len(x)
        src = np.array([u for u, v in und] + [v for u, v in und], np.int64)
        dst = np.array([v for u, v in und] + [u for u, v in und], np.int64)
        xs.append(x)
        eis.append(np.stack([src, dst]) + base)      # absolute node ids
        eas.append(np.concatenate([ea, ea], axis=0))
        base += n
        nptr.append(base)
        eptr.append(eptr[-1] + 2 * len(und))
    data = dict(
        x_cat=np.concatenate(xs),
        edge_index_cat=(np.concatenate(eis, axis=1) if eis
                        else np.zeros((2, 0), np.int64)),
        edge_attr_cat=np.concatenate(eas),
        y=np.asarray(ys),
        node_ptr=np.asarray(nptr), edge_ptr=np.asarray(eptr))
    if y_cat is not None:
        data["y_cat"] = np.asarray(y_cat)
    if with_splits:
        n = len(ys)
        idx = np.arange(n)
        data["train_idx"] = idx[: int(0.6 * n)]
        data["val_idx"] = idx[int(0.6 * n): int(0.8 * n)]
        data["test_idx"] = idx[int(0.8 * n):]
    return data


def write_zinc_fixture(root: str, sizes=(8, 4, 4)) -> None:
    """datasets/ZINC/raw/{train,val,test}.npz in the zinc.py layout."""
    rng = np.random.default_rng(0)
    raw = os.path.join(root, "ZINC", "raw")
    os.makedirs(raw, exist_ok=True)
    for split, n in zip(("train", "val", "test"), sizes):
        graphs = _tiny_molecules(rng, n, node_vocab=28, edge_vocab=4)
        ys = rng.normal(size=n)
        data = _pack_cat(graphs, ys)
        data["x_cat"] = data["x_cat"].reshape(-1)        # scalar atom types
        data["edge_attr_cat"] = data["edge_attr_cat"].reshape(-1)
        np.savez(os.path.join(raw, f"{split}.npz"), **data)


def write_ogb_fixture(root: str, name: str = "ogbg-molhiv",
                      n: int = 12, n_tasks: int = 1) -> None:
    """datasets/<name>/raw/graphs.npz in the ogb.py layout."""
    rng = np.random.default_rng(1)
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    from cwn_tpu.models.encoders import (
        OGB_ATOM_FEATURE_DIMS, OGB_BOND_FEATURE_DIMS)
    graphs = _tiny_molecules(rng, n, node_vocab=OGB_ATOM_FEATURE_DIMS,
                             edge_vocab=OGB_BOND_FEATURE_DIMS)
    # Alternate labels so every split sees both classes (ROC-AUC needs it).
    ys = np.stack([np.arange(n) % 2] * n_tasks, axis=1).astype(np.float64)
    np.savez(os.path.join(raw, "graphs.npz"),
             **_pack_cat(graphs, ys, with_splits=True))


def write_peptides_fixture(root: str, name: str = "PEPTIDES-F",
                           n: int = 12, n_tasks: int = 3) -> None:
    rng = np.random.default_rng(2)
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    from cwn_tpu.models.encoders import (
        OGB_ATOM_FEATURE_DIMS, OGB_BOND_FEATURE_DIMS)
    graphs = _tiny_molecules(rng, n, node_vocab=OGB_ATOM_FEATURE_DIMS,
                             edge_vocab=OGB_BOND_FEATURE_DIMS)
    if name == "PEPTIDES-F":
        ys = (rng.uniform(size=(n, n_tasks)) > 0.5).astype(np.float64)
        ys[::2, 0] = 1.0
        ys[1::2, 0] = 0.0
    else:
        ys = rng.normal(size=(n, n_tasks))
    np.savez(os.path.join(raw, "graphs.npz"),
             **_pack_cat(graphs, ys, with_splits=True))


def write_cluster_fixture(root: str, n: int = 6) -> None:
    """datasets/CLUSTER/raw/graphs.npz with per-node labels (y_cat)."""
    rng = np.random.default_rng(3)
    raw = os.path.join(root, "CLUSTER", "raw")
    os.makedirs(raw, exist_ok=True)
    graphs = _tiny_molecules(rng, n, node_vocab=6, edge_vocab=1)
    y_cat = np.concatenate(
        [rng.integers(0, 3, len(x)) for x, _, _ in graphs])
    data = _pack_cat(graphs, np.zeros(n), with_splits=True, y_cat=y_cat)
    np.savez(os.path.join(raw, "graphs.npz"), **data)


def write_tu_fixture(root: str, name: str = "MUTAG", n: int = 24) -> None:
    """datasets/<name>/raw/<name>.txt in the GIN benchmark text format."""
    rng = np.random.default_rng(4)
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    lines = [str(n)]
    for i in range(n):
        ring = int(rng.integers(3, 6))
        label = i % 2            # 12 per class -> 10-fold stratify works
        nn = ring
        adj = [[] for _ in range(nn)]
        for u in range(ring):
            v = (u + 1) % ring
            adj[u].append(v)
            adj[v].append(u)
        lines.append(f"{nn} {label}")
        for v in range(nn):
            tag = int(rng.integers(0, 3))
            lines.append(f"{tag} {len(adj[v])} " +
                         " ".join(str(u) for u in adj[v]))
    with open(os.path.join(raw, f"{name}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def write_ocean_fixture(root: str, n_traj: int = 10) -> None:
    """datasets/OCEAN/raw/dataBuoys.jld2: a miniature HDF5 file with the
    same reference-traversal structure the ocean.py loader walks
    (elist object refs, TrajPathsNodes nested refs, 1-based ids)."""
    import h5py

    rng = np.random.default_rng(5)
    raw = os.path.join(root, "OCEAN", "raw")
    os.makedirs(raw, exist_ok=True)

    # 3x3 triangulated grid: nodes 0..8, squares split into 2 triangles.
    def nid(r, c):
        return 3 * r + c

    tris = []
    for r in range(2):
        for c in range(2):
            a, b, cc, d = nid(r, c), nid(r, c + 1), nid(r + 1, c), nid(r + 1, c + 1)
            tris.append((a, b, cc))
            tris.append((b, d, cc))
    edges = sorted({(min(u, v), max(u, v))
                    for t in tris
                    for u, v in [(t[0], t[1]), (t[1], t[2]), (t[0], t[2])]})
    adj = {v: set() for v in range(9)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    paths, labels = [], []
    for i in range(n_traj):
        v = int(rng.integers(0, 9))
        path = [v]
        for _ in range(6):
            v = int(rng.choice(sorted(adj[v])))
            path.append(v)
        paths.append([p + 1 for p in path])          # 1-based
        labels.append(i % 2 + 1)                     # 1-based labels

    with h5py.File(os.path.join(raw, "dataBuoys.jld2"), "w") as f:
        edge_arr = np.array(edges, np.int64).T + 1    # [2, E], 1-based
        face_arr = np.array(tris, np.int64).T + 1     # [3, T]
        e_ds = f.create_dataset("_edges", data=edge_arr)
        t_ds = f.create_dataset("_faces", data=face_arr)
        elist = f.create_dataset("elist", (2,), dtype=h5py.ref_dtype)
        elist[0], elist[1] = e_ds.ref, t_ds.ref

        # TrajPathsNodes: refs to per-trajectory groups of path refs
        # (2 trajectories per group to exercise the nested walk).
        group_refs = []
        for gi in range(0, n_traj, 2):
            prefs = []
            for j, path in enumerate(paths[gi:gi + 2]):
                ds = f.create_dataset(f"_path_{gi}_{j}",
                                      data=np.array(path, np.int64))
                prefs.append(ds.ref)
            g = f.create_dataset(f"_pgroup_{gi}", (len(prefs),),
                                 dtype=h5py.ref_dtype)
            for j, rf in enumerate(prefs):
                g[j] = rf
            group_refs.append(g.ref)
        tp = f.create_dataset("TrajPathsNodes", (len(group_refs),),
                              dtype=h5py.ref_dtype)
        for i, rf in enumerate(group_refs):
            tp[i] = rf
        f.create_dataset("TrajLabels", data=np.array(labels, np.int64))
