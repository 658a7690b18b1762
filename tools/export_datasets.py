"""Export real benchmark datasets into the raw layouts the gated loaders read.

Run this in an environment WITH network egress and the exporter deps
installed (torch_geometric for ZINC/CLUSTER, ogb for the OGB sets, the LRGB
package or torch_geometric>=2.3 for peptides); then copy the produced
`datasets/` tree next to this repo (or point CWN_TPU_DATA at it).

Layouts (one npz per split or per dataset — see the matching loader):

  ZINC    datasets/ZINC/raw/{train,val,test}.npz
          x_cat [sum_n] int, edge_index_cat [2, sum_e] (directed, absolute
          node ids), edge_attr_cat [sum_e] int, y [n_graphs] float,
          node_ptr/edge_ptr prefix offsets.        (cwn_tpu/data/datasets/zinc.py)
  OGB     datasets/<name>/raw/graphs.npz
          x_cat [sum_n, 9], edge_attr_cat [sum_e, 3], y [n_graphs, n_tasks],
          + train_idx/val_idx/test_idx.            (cwn_tpu/data/datasets/ogb.py)
  PEPTIDES-F/S  same layout as OGB.                (.../peptides.py)
  CLUSTER datasets/CLUSTER/raw/graphs.npz with per-node y_cat [sum_n].
  TU      datasets/<NAME>/raw/<NAME>.txt — download the GIN-format text
          files directly (github.com/weihua916/powerful-gnns dataset.zip).
  OCEAN   datasets/OCEAN/raw/dataBuoys.jld2 — download from the SCoNe repo
          (github.com/nglaze00/SCoNe_GCN, ocean_drifters_data/).

Usage:
  python tools/export_datasets.py ZINC [--root datasets]
  python tools/export_datasets.py ogbg-molhiv
  python tools/export_datasets.py CLUSTER
  python tools/export_datasets.py PEPTIDES-F
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _pack(graphs, ys, out_path, splits=None, y_cat=None):
    xs, eis, eas, nptr, eptr = [], [], [], [0], [0]
    base = 0
    for x, ei, ea in graphs:
        xs.append(np.asarray(x))
        eis.append(np.asarray(ei) + base)
        eas.append(np.asarray(ea))
        base += len(x)
        nptr.append(base)
        eptr.append(eptr[-1] + np.asarray(ei).shape[1])
    data = dict(x_cat=np.concatenate(xs),
                edge_index_cat=np.concatenate(eis, axis=1),
                edge_attr_cat=np.concatenate(eas),
                y=np.asarray(ys),
                node_ptr=np.asarray(nptr), edge_ptr=np.asarray(eptr))
    if splits is not None:
        data.update(train_idx=np.asarray(splits[0]),
                    val_idx=np.asarray(splits[1]),
                    test_idx=np.asarray(splits[2]))
    if y_cat is not None:
        data["y_cat"] = np.asarray(y_cat)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **data)
    print(f"wrote {out_path}: {len(nptr) - 1} graphs")


def _from_pyg(d):
    ea = d.edge_attr
    if ea is None:
        ea = np.zeros((d.edge_index.shape[1], 1), np.int64)
    return (d.x.numpy(), d.edge_index.numpy(), np.asarray(ea))


def export_zinc(root, subset=True):
    from torch_geometric.datasets import ZINC

    name = "ZINC" if subset else "ZINC-FULL"
    for split in ("train", "val", "test"):
        ds = ZINC(os.path.join(root, "_pyg_zinc"), subset=subset,
                  split=split)
        graphs, ys = [], []
        for d in ds:
            x, ei, ea = _from_pyg(d)
            graphs.append((x.reshape(-1), ei, np.asarray(ea).reshape(-1)))
            ys.append(float(d.y))
        _pack(graphs, ys, os.path.join(root, name, "raw", f"{split}.npz"))


def export_ogb(root, name):
    from ogb.graphproppred import PygGraphPropPredDataset

    ds = PygGraphPropPredDataset(name, root=os.path.join(root, "_ogb"))
    idx = ds.get_idx_split()
    graphs, ys = [], []
    for d in ds:
        graphs.append(_from_pyg(d))
        ys.append(d.y.numpy().reshape(-1))
    _pack(graphs, np.stack(ys),
          os.path.join(root, name, "raw", "graphs.npz"),
          splits=(idx["train"].numpy(), idx["valid"].numpy(),
                  idx["test"].numpy()))


def export_peptides(root, name):
    from torch_geometric.datasets import LRGBDataset

    key = ("Peptides-func" if name == "PEPTIDES-F" else "Peptides-struct")
    graphs, ys = [], []
    sizes = []
    for split in ("train", "val", "test"):
        ds = LRGBDataset(os.path.join(root, "_lrgb"), key, split=split)
        sizes.append(len(ds))
        for d in ds:
            graphs.append(_from_pyg(d))
            ys.append(d.y.numpy().reshape(-1))
    n_tr, n_va, n_te = sizes
    _pack(graphs, np.stack(ys),
          os.path.join(root, name, "raw", "graphs.npz"),
          splits=(np.arange(n_tr), np.arange(n_tr, n_tr + n_va),
                  np.arange(n_tr + n_va, n_tr + n_va + n_te)))


def export_cluster(root):
    from torch_geometric.datasets import GNNBenchmarkDataset

    graphs, y_cat, sizes = [], [], []
    for split in ("train", "val", "test"):
        ds = GNNBenchmarkDataset(os.path.join(root, "_gnnbench"), "CLUSTER",
                                 split=split)
        sizes.append(len(ds))
        for d in ds:
            x = d.x.numpy()
            ei = d.edge_index.numpy()
            graphs.append((x, ei, np.zeros((ei.shape[1], 1), np.int64)))
            y_cat.append(d.y.numpy().reshape(-1))
    n_tr, n_va, n_te = sizes
    n = n_tr + n_va + n_te
    _pack(graphs, np.zeros(n),
          os.path.join(root, "CLUSTER", "raw", "graphs.npz"),
          splits=(np.arange(n_tr), np.arange(n_tr, n_tr + n_va),
                  np.arange(n_tr + n_va, n)),
          y_cat=np.concatenate(y_cat))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset")
    p.add_argument("--root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets"))
    args = p.parse_args()
    name = args.dataset
    if name in ("ZINC", "ZINC-FULL"):
        export_zinc(args.root, subset=(name == "ZINC"))
    elif name.startswith("ogbg-"):
        export_ogb(args.root, name)
    elif name in ("PEPTIDES-F", "PEPTIDES-S"):
        export_peptides(args.root, name)
    elif name == "CLUSTER":
        export_cluster(args.root)
    else:
        raise SystemExit(f"no exporter for {name} (TU/OCEAN are direct "
                         "downloads — see module docstring)")


if __name__ == "__main__":
    main()
