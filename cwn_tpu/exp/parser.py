"""CLI flag surface (argparse-compatible with the reference).

Parity: /root/reference/exp/parser.py:8-187 (get_parser + validate_args).
"""
from __future__ import annotations

import argparse
import os
import time


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="CWN-TPU experiment.")
    parser.add_argument("--seed", type=int, default=43)
    parser.add_argument("--start_seed", type=int, default=0)
    parser.add_argument("--stop_seed", type=int, default=9)
    parser.add_argument("--device", type=int, default=0)
    parser.add_argument("--model", type=str, default="sparse_cin")
    parser.add_argument("--use_coboundaries", type=str, default="False")
    parser.add_argument("--include_down_adj", action="store_true")
    parser.add_argument("--indrop_rate", type=float, default=0.0)
    parser.add_argument("--drop_rate", type=float, default=0.0)
    parser.add_argument("--drop_position", type=str, default="lin2")
    parser.add_argument("--nonlinearity", type=str, default="relu")
    parser.add_argument("--readout", type=str, default="sum")
    parser.add_argument("--final_readout", type=str, default="sum")
    parser.add_argument("--readout_dims", type=int, nargs="+", default=(0, 1, 2))
    parser.add_argument("--jump_mode", type=str, default=None)
    parser.add_argument("--graph_norm", type=str, default="bn",
                        choices=["bn", "ln", "id"])
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--lr_scheduler", type=str, default="StepLR")
    parser.add_argument("--lr_scheduler_decay_steps", type=int, default=50)
    parser.add_argument("--lr_scheduler_decay_rate", type=float, default=0.5)
    parser.add_argument("--lr_scheduler_patience", type=float, default=10)
    parser.add_argument("--lr_scheduler_min", type=float, default=0.00001)
    parser.add_argument("--num_layers", type=int, default=5)
    parser.add_argument("--emb_dim", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--num_workers", type=int, default=0,
                        help="accepted for reference-script compatibility; "
                             "packing is in-process (the device-prefetch "
                             "loader overlaps H2D with compute instead)")
    parser.add_argument("--dataset", type=str, default="PROTEINS")
    parser.add_argument("--task_type", type=str, default="classification")
    parser.add_argument("--eval_metric", type=str, default="accuracy")
    parser.add_argument("--iso_eps", type=float, default=0.01)
    parser.add_argument("--minimize", action="store_true")
    parser.add_argument("--max_dim", type=int, default=2)
    parser.add_argument("--max_ring_size", type=int, default=None)
    parser.add_argument("--result_folder", type=str,
                        default=os.path.join(os.getcwd(), "exp_results"))
    parser.add_argument("--exp_name", type=str, default=str(time.time()))
    parser.add_argument("--dump_curves", action="store_true")
    parser.add_argument("--curves_json", type=str, default=None,
                        help="write the curves/results dict to this JSON "
                             "path (the run_isolated subprocess channel)")
    parser.add_argument("--untrained", action="store_true")
    parser.add_argument("--fold", type=int, default=None)
    parser.add_argument("--folds", type=int, default=None)
    parser.add_argument("--init_method", type=str, default="sum")
    parser.add_argument("--train_eval_period", type=int, default=10)
    parser.add_argument("--tune", action="store_true")
    parser.add_argument("--flow_points", type=int, default=400)
    parser.add_argument("--flow_classes", type=int, default=3)
    parser.add_argument("--train_orient", type=str, default="default")
    parser.add_argument("--test_orient", type=str, default="default")
    parser.add_argument("--fully_orient_invar", action="store_true")
    parser.add_argument("--use_edge_features", action="store_true")
    parser.add_argument("--simple_features", action="store_true")
    parser.add_argument("--early_stop", action="store_true")
    parser.add_argument("--paraid", type=int, default=0)
    parser.add_argument("--preproc_jobs", type=int, default=2)
    # TPU-specific additions (not in the reference).
    parser.add_argument("--pad_multiple", type=int, default=128)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="data-parallel devices (mesh size)")
    parser.add_argument("--use_pallas", type=str, default="auto",
                        choices=["auto", "true", "false"],
                        help="fused Pallas kernels for the hot adjacency "
                             "channels; 'auto' enables them on the TPU "
                             "backend (fp32 training only)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of a few train "
                             "steps to this directory")
    parser.add_argument("--train_eps", type=str, default="False")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="save train state every --checkpoint_period "
                             "epochs and resume from the latest checkpoint")
    parser.add_argument("--checkpoint_period", type=int, default=10)
    return parser


def validate_args(args):
    """Dataset-specific invariant checks
    (parity: /root/reference/exp/parser.py:120-187)."""
    name = args.dataset.upper()
    if name in ("ZINC", "ZINC-FULL", "ZINC-SYNTH"):
        assert args.model.startswith("embed")
        if args.model in ("embed_cin++", "embed_cin_pp"):
            assert args.include_down_adj
        assert args.eval_metric == "mae"
        assert args.task_type == "regression"
        assert args.minimize
        assert args.lr_scheduler == "ReduceLROnPlateau"
        assert not args.simple_features
    if name == "CSL":
        assert args.model == "embed_sparse_cin"
        assert args.task_type == "classification"
        assert not args.minimize
        assert args.lr_scheduler == "ReduceLROnPlateau"
        assert args.eval_metric == "accuracy"
        assert args.fold is not None or args.folds is not None
        assert not args.simple_features
        assert args.graph_norm == "ln"
    if name in ("RING-TRANSFER", "RING-LOOKUP"):
        assert args.model in ("ring_sparse_cin", "ring_gin")
        assert args.task_type == "classification"
        assert not args.minimize
        assert args.lr_scheduler in (None, "None")
        assert args.eval_metric == "accuracy"
        assert args.fold is None
        assert not args.simple_features
        if args.max_ring_size is not None:
            assert args.max_ring_size > 3
        if args.model == "ring_sparse_cin":
            assert args.graph_norm == "id"
        if args.model == "ring_gin":
            assert args.graph_norm == "bn"
    if name.startswith("SR"):
        assert args.model in ("sparse_cin", "mp_agnostic")
        assert args.untrained
        assert args.task_type == "isomorphism"
        assert args.eval_metric == "isomorphism"
        assert args.nonlinearity == "elu"
        assert args.jump_mode is None
        assert args.drop_rate == 0.0
        assert args.readout == "sum"
        assert args.final_readout == "sum"
        assert not args.simple_features
    if args.dataset.startswith("ogbg-mol") or name == "MOLHIV-SYNTH":
        if args.dataset.lower() in ("ogbg-molesol", "ogbg-molfreesolv",
                                    "ogbg-mollipo"):
            assert args.task_type == "mse_regression"
            assert args.minimize
        else:
            assert args.task_type == "bin_classification"
            assert not args.minimize
        assert args.jump_mode is None
    if name in ("FLOW", "OCEAN", "OCEAN-SYNTH"):
        assert args.model in ("edge_orient", "edge_mpnn")
        assert args.nonlinearity in ("id", "tanh") or args.fully_orient_invar
        assert args.eval_metric == "accuracy"
        assert args.task_type == "classification"
        assert args.jump_mode is None
        assert args.drop_rate == 0.0
        assert not args.untrained
        assert not args.simple_features
        assert not args.minimize
        assert args.train_orient in ("default", "random")
        assert args.test_orient in ("default", "random")
