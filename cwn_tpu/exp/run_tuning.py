"""TU hyper-parameter tuning CLI.

Parity: /root/reference/exp/run_tu_tuning.py — a YAML grid
(tuning_configurations/template.yml format) is expanded to a cartesian
product; worker `--idx` runs grid points with index % 8 == idx % 8 (the
reference shards over its 8 GPUs); each point is a full 10-fold TU run.

Usage:
  python -m cwn_tpu.exp.run_tuning --conf grid.yml --code mytune --idx 0
"""
from __future__ import annotations

import argparse
import copy
import os

from cwn_tpu.exp.tuning import grid_points, load_yaml_grid
from cwn_tpu.exp.wrappers import run_tu_exp

MAX_DEVICES = 8  # reference shard modulus (run_tu_tuning.py:10)


def main(argv=None):
    parser = argparse.ArgumentParser(description="CWN-TPU tuning.")
    parser.add_argument("--conf", type=str, required=True,
                        help="path to yaml grid configuration")
    parser.add_argument("--code", type=str, default="tuning",
                        help="tuning run name")
    parser.add_argument("--idx", type=int, default=0,
                        help="worker shard index")
    t_args = parser.parse_args(argv)

    conf = load_yaml_grid(t_args.conf)
    dataset = conf.pop("dataset")[0]
    points = grid_points(conf)

    # NOTE: like the reference, tuning runs the standard folds (the
    # reference's get_tune_idx_split raises NotImplementedError,
    # /root/reference/data/datasets/tu.py:123-129, and run_tu_tuning
    # does not pass --tune either).
    base_args = [
        "--task_type", "classification",
        "--eval_metric", "accuracy",
        "--dataset", str(dataset),
        "--result_folder",
        os.path.join(os.getcwd(), "exp_results",
                     f"{dataset}_tuning_{t_args.code}"),
    ]

    results = []
    for h, point in enumerate(points):
        if h % MAX_DEVICES != (t_args.idx % MAX_DEVICES):
            continue
        args = copy.copy(base_args) + ["--exp_name", str(h)]
        for name, value in point.items():
            args += [f"--{name}", f"{value}"]
        results.append((h, point, run_tu_exp(args)))
    return results


if __name__ == "__main__":
    main()
