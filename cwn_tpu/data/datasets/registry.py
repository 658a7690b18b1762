"""String-keyed dataset factory.

Parity: /root/reference/data/data_loading.py:113-195 (load_dataset).
"""
from __future__ import annotations

from typing import Optional

from cwn_tpu.data.datasets.base import ComplexDatasetSpec


def load_dataset(name: str, fold: Optional[int] = None, seed: int = 0,
                 max_dim: int = 2, max_ring_size: Optional[int] = None,
                 include_down_adj: bool = False, init_method: str = "sum",
                 use_edge_features: bool = False,
                 simple_features: bool = False,
                 n_jobs: int = 1, root: Optional[str] = None,
                 **kwargs) -> ComplexDatasetSpec:
    name_u = name.upper()

    if name_u in ("ZINC", "ZINC-FULL"):
        from cwn_tpu.data.datasets.zinc import load_zinc_dataset
        return load_zinc_dataset(subset=(name_u == "ZINC"),
                                 max_ring_size=max_ring_size or 18,
                                 use_edge_features=use_edge_features,
                                 include_down_adj=include_down_adj,
                                 init_method=init_method, root=root,
                                 n_jobs=n_jobs)
    if name_u == "ZINC-SYNTH":
        from cwn_tpu.data.datasets.zinc import load_zinc_synth_dataset
        return load_zinc_synth_dataset(max_ring_size=max_ring_size or 18,
                                       use_edge_features=use_edge_features,
                                       include_down_adj=include_down_adj,
                                       init_method=init_method, root=root,
                                       n_jobs=n_jobs, **kwargs)
    if name.startswith("ogbg-mol"):
        from cwn_tpu.data.datasets.ogb import load_ogb_dataset
        return load_ogb_dataset(name, max_ring_size=max_ring_size or 6,
                                use_edge_features=use_edge_features,
                                include_down_adj=include_down_adj,
                                init_method=init_method, root=root,
                                n_jobs=n_jobs, simple_features=simple_features)
    if name_u == "MOLHIV-SYNTH":
        from cwn_tpu.data.datasets.ogb import load_molhiv_synth_dataset
        return load_molhiv_synth_dataset(max_ring_size=max_ring_size or 6,
                                         root=root, n_jobs=n_jobs, **kwargs)
    if name_u.startswith("SR"):
        from cwn_tpu.data.datasets.sr import load_sr_dataset
        return load_sr_dataset(name.lower(), max_ring_size=max_ring_size,
                               max_dim=max_dim,
                               include_down_adj=include_down_adj,
                               init_method=init_method, root=root,
                               n_jobs=n_jobs)
    if name_u == "CSL":
        from cwn_tpu.data.datasets.csl import load_csl_dataset
        return load_csl_dataset(fold=fold or 0,
                                max_ring_size=max_ring_size or 8,
                                include_down_adj=include_down_adj,
                                init_method=init_method, root=root,
                                n_jobs=n_jobs)
    if name_u in ("RING-TRANSFER", "RING-LOOKUP"):
        from cwn_tpu.data.datasets.ring import (
            load_ring_lookup_dataset, load_ring_transfer_dataset)
        nodes = max_ring_size or 10
        if name_u == "RING-TRANSFER":
            return load_ring_transfer_dataset(nodes=nodes, n_jobs=n_jobs,
                                              **kwargs)
        return load_ring_lookup_dataset(nodes=nodes, n_jobs=n_jobs, **kwargs)
    if name_u in ("DUMMY", "DUMMYM"):
        from cwn_tpu.data.datasets.dummy import load_dummy_dataset
        return load_dummy_dataset(molecular=(name_u == "DUMMYM"),
                                  n_jobs=n_jobs)
    if name_u in ("IMDBBINARY", "IMDBMULTI", "REDDITBINARY", "REDDITMULTI5K",
                  "PROTEINS", "NCI1", "NCI109", "PTC", "MUTAG"):
        from cwn_tpu.data.datasets.tu import load_tu_dataset
        return load_tu_dataset(name_u, fold=fold or 0, seed=seed,
                               max_dim=max_dim, max_ring_size=max_ring_size,
                               include_down_adj=include_down_adj,
                               init_method=init_method, root=root,
                               n_jobs=n_jobs)
    if name_u == "CLUSTER":
        from cwn_tpu.data.datasets.cluster import load_cluster_dataset
        return load_cluster_dataset(max_dim=max_dim, root=root,
                                    init_method=init_method)
    if name_u == "FLOW":
        from cwn_tpu.data.datasets.flow import load_flow_dataset_spec
        return load_flow_dataset_spec(root=root, **kwargs)
    if name_u == "OCEAN":
        from cwn_tpu.data.datasets.ocean import load_ocean_dataset_spec
        return load_ocean_dataset_spec(root=root, **kwargs)
    if name_u == "OCEAN-SYNTH":
        from cwn_tpu.data.datasets.ocean import load_ocean_synth_dataset_spec
        return load_ocean_synth_dataset_spec(root=root, **kwargs)
    if name_u in ("PEPTIDES-F", "PEPTIDES-S"):
        from cwn_tpu.data.datasets.peptides import load_peptides_dataset
        return load_peptides_dataset(name_u, max_ring_size=max_ring_size or 8,
                                     include_down_adj=include_down_adj,
                                     root=root, n_jobs=n_jobs)

    raise ValueError(f"Unknown dataset {name}")
