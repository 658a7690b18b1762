"""Hyperparameter grid search driven by a YAML spec.

Parity: /root/reference/exp/run_tu_tuning.py + tuning_configurations/
template.yml — a cartesian grid over flag values, shardable across workers
via `--paraid` (worker i runs grid points with index % num_shards == i).
"""
from __future__ import annotations

import copy
import itertools
import json
import os
from typing import Dict, List

import numpy as np

from cwn_tpu.exp.parser import get_parser
from cwn_tpu.exp.run_exp import main


def grid_points(grid: Dict[str, List]) -> List[Dict]:
    keys = sorted(grid.keys())
    out = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        out.append(dict(zip(keys, combo)))
    return out


def run_tuning(base_args: List[str], grid: Dict[str, List],
               paraid: int = 0, num_shards: int = 1,
               result_file: str = "tuning_results.json") -> List[Dict]:
    """Run the grid points assigned to this shard; returns their results."""
    parser = get_parser()
    points = grid_points(grid)
    results = []
    for i, point in enumerate(points):
        if i % num_shards != paraid:
            continue
        args_list = copy.copy(base_args)
        for k, v in point.items():
            args_list += [f"--{k}", str(v)]
        curves = main(parser.parse_args(args_list))
        results.append({"point": point,
                        "best_val": curves.get("best_val"),
                        "test_at_best": curves.get("test_at_best")})
        print(f"grid[{i}] {point}: val={curves.get('best_val')}")
    if result_file:
        with open(result_file, "w") as f:
            json.dump(results, f, indent=1)
    return results


def load_yaml_grid(path: str) -> Dict[str, List]:
    """Minimal YAML subset reader for grid files (avoids a yaml dep).

    Supports both inline `key: [a, b, c]` lists and the reference
    template's block form (`key:` followed by `- value` lines —
    /root/reference/exp/tuning_configurations/template.yml), plus scalar
    entries like `dataset: NCI109` (returned as 1-element lists)."""
    grid: Dict[str, List] = {}
    current = None
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].rstrip()
            if not line.strip():
                continue
            stripped = line.strip()
            if stripped.startswith("- ") or stripped == "-":
                if current is None:
                    continue
                grid[current].append(_coerce(stripped[1:].strip()))
                continue
            if ":" not in stripped:
                continue
            key, val = stripped.split(":", 1)
            key, val = key.strip(), val.strip()
            if val.startswith("[") and val.endswith("]"):
                items = [v.strip() for v in val[1:-1].split(",") if v.strip()]
                grid[key] = [_coerce(v) for v in items]
                current = None
            elif val:
                grid[key] = [_coerce(val)]
                current = None
            else:
                grid[key] = []
                current = key
    return grid


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v.strip("'\"")
