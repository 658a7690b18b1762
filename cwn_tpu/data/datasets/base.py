"""Dataset plumbing: the spec record, cache layout, data roots."""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Dict, List, Optional, Sequence

from cwn_tpu.complex import Complex

# Data root: bundled raw files + processed caches live here.
DEFAULT_ROOT = os.environ.get(
    "CWN_TPU_DATA",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))), "datasets"))


class DatasetNotAvailable(RuntimeError):
    """Raised when a dataset needs files this offline environment lacks."""

    def __init__(self, name: str, instructions: str):
        super().__init__(
            f"Dataset '{name}' requires data that is not available offline.\n"
            f"{instructions}")


@dataclasses.dataclass
class ComplexDatasetSpec:
    """A fully-lifted dataset plus task metadata (what run_exp needs)."""

    name: str
    complexes: List[Complex]
    train_ids: Sequence[int]
    val_ids: Sequence[int]
    test_ids: Sequence[int]
    max_dim: int
    num_features: List[int]
    num_classes: int
    task_type: str = "classification"       # classification / bin_classification /
                                            # regression / mse_regression / isomorphism
    eval_metric: str = "accuracy"
    minimize: bool = False
    num_node_type: Optional[int] = None     # embed models (atom vocab)
    num_edge_type: Optional[int] = None     # embed models (bond vocab)

    def split(self, which: str) -> List[Complex]:
        ids = {"train": self.train_ids, "val": self.val_ids,
               "test": self.test_ids}[which]
        return [self.complexes[i] for i in ids]


def cache_path(name: str, key: str, root: Optional[str] = None) -> str:
    root = root or DEFAULT_ROOT
    d = os.path.join(root, name, "processed")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{key}.pkl")


def cached_lift(name: str, key: str, build_fn, root: Optional[str] = None):
    """Processed-complex caching, mirroring the reference's processed dirs
    (/root/reference/data/datasets/dataset.py:117-134 skip-if-exists)."""
    path = cache_path(name, key, root)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    out = build_fn()
    with open(path, "wb") as f:
        pickle.dump(out, f)
    return out
