"""Single-run experiment pipeline.

Parity: /root/reference/exp/run_exp.py:19-477 — seeding, fp64 switch for
isomorphism, dataset + loaders, model dispatch, Adam + scheduler, epoch
loop with train/val/test curves, ReduceLROnPlateau early stop, best-epoch
selection by validation, results dump.

TPU notes: the isomorphism (SR) path runs in float64 on the CPU backend
(TPUs have no native fp64); everything else runs on the default backend.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional

import numpy as np

from cwn_tpu.data.datasets import load_dataset
from cwn_tpu.train import ComplexLoader, Trainer, TrainConfig
from cwn_tpu.train.evaluator import Evaluator


def _str2bool(s):
    if isinstance(s, bool):
        return s
    return str(s).lower() in ("true", "1", "yes")


def build_model(args, dataset):
    """Model dispatch (parity: /root/reference/exp/run_exp.py:112-328)."""
    name = args.model
    use_cob = _str2bool(args.use_coboundaries)
    train_eps = _str2bool(getattr(args, "train_eps", False))
    num_feat = dataset.num_features[0] if dataset.num_features else 1
    readout_dims = tuple(args.readout_dims)
    out_size = dataset.num_classes

    common = dict(num_layers=args.num_layers, hidden=args.emb_dim,
                  dropout_rate=args.drop_rate, nonlinearity=args.nonlinearity,
                  readout=args.readout)

    if name == "cin0":
        from cwn_tpu.models.baselines import CIN0
        return CIN0(num_input_features=num_feat, num_classes=out_size,
                    max_dim=args.max_dim, jump_mode=args.jump_mode, **common)
    if name == "edge_cin0":
        from cwn_tpu.models.baselines import EdgeCIN0
        return EdgeCIN0(num_input_features=num_feat, num_classes=out_size,
                        jump_mode=args.jump_mode, **common)
    if name == "sparse_cin" or name == "cin":
        from cwn_tpu.models import SparseCIN
        return SparseCIN(num_input_features=num_feat, num_classes=out_size,
                         max_dim=args.max_dim, jump_mode=args.jump_mode,
                         train_eps=train_eps, use_coboundaries=use_cob,
                         readout_dims=readout_dims,
                         final_readout=args.final_readout,
                         apply_dropout_before=args.drop_position,
                         graph_norm=args.graph_norm, **common)
    if name in ("cin++", "cin_pp", "cinpp"):
        from cwn_tpu.models import CINpp
        return CINpp(num_input_features=num_feat, num_classes=out_size,
                     max_dim=args.max_dim, jump_mode=args.jump_mode,
                     train_eps=train_eps, use_coboundaries=use_cob,
                     readout_dims=readout_dims,
                     final_readout=args.final_readout,
                     apply_dropout_before=args.drop_position,
                     graph_norm=args.graph_norm, **common)
    if name == "dummy":
        from cwn_tpu.models.baselines import Dummy
        return Dummy(num_input_features=num_feat, num_classes=out_size,
                     num_layers=args.num_layers, max_dim=args.max_dim,
                     readout=args.readout)
    if name == "mp_agnostic":
        from cwn_tpu.models.baselines import MessagePassingAgnostic
        return MessagePassingAgnostic(
            num_input_features=num_feat, num_classes=out_size,
            hidden=args.emb_dim, dropout_rate=args.drop_rate,
            max_dim=args.max_dim, nonlinearity=args.nonlinearity,
            readout=args.readout)
    if name in ("embed_sparse_cin", "embed_cin++", "embed_cin_pp",
                "embed_sparse_cin_no_rings"):
        from cwn_tpu.models.molec import (
            EmbedCINpp, EmbedSparseCIN, EmbedSparseCINNoRings)
        cls = {"embed_sparse_cin": EmbedSparseCIN,
               "embed_cin++": EmbedCINpp, "embed_cin_pp": EmbedCINpp,
               "embed_sparse_cin_no_rings": EmbedSparseCINNoRings}[name]
        kw = dict(atom_types=dataset.num_node_type or 100,
                  bond_types=dataset.num_edge_type or 10,
                  out_size=out_size, num_layers=args.num_layers,
                  hidden=args.emb_dim, dropout_rate=args.drop_rate,
                  nonlinearity=args.nonlinearity, readout=args.readout,
                  train_eps=train_eps,
                  final_readout=args.final_readout,
                  apply_dropout_before=args.drop_position,
                  embed_edge=args.use_edge_features,
                  use_coboundaries=use_cob, graph_norm=args.graph_norm)
        if cls is not EmbedSparseCINNoRings:
            kw.update(max_dim=args.max_dim, jump_mode=args.jump_mode,
                      readout_dims=readout_dims)
        return cls(**kw)
    if name in ("ogb_embed_sparse_cin", "ogb_embed_cin++", "ogb_embed_cin_pp"):
        from cwn_tpu.models.molec import OGBEmbedCINpp, OGBEmbedSparseCIN
        cls = OGBEmbedSparseCIN if name == "ogb_embed_sparse_cin" \
            else OGBEmbedCINpp
        return cls(atom_types=0, bond_types=0, out_size=out_size,
                   num_layers=args.num_layers, hidden=args.emb_dim,
                   dropout_rate=args.drop_rate,
                   in_dropout_rate=args.indrop_rate,
                   max_dim=args.max_dim, jump_mode=args.jump_mode,
                   nonlinearity=args.nonlinearity, readout=args.readout,
                   train_eps=train_eps, readout_dims=readout_dims,
                   final_readout=args.final_readout,
                   apply_dropout_before=args.drop_position,
                   embed_edge=args.use_edge_features,
                   use_coboundaries=use_cob, graph_norm=args.graph_norm)
    if name == "embed_gin":
        from cwn_tpu.models.molec import EmbedGIN
        return EmbedGIN(atom_types=dataset.num_node_type or 100,
                        bond_types=dataset.num_edge_type or 10,
                        out_size=out_size, num_layers=args.num_layers,
                        hidden=args.emb_dim, dropout_rate=args.drop_rate,
                        nonlinearity=args.nonlinearity, readout=args.readout,
                        train_eps=train_eps,
                        apply_dropout_before=args.drop_position,
                        embed_edge=args.use_edge_features)
    if name in ("edge_orient", "edge_mpnn"):
        from cwn_tpu.models.orient import EdgeMPNN, EdgeOrient
        cls = EdgeOrient if name == "edge_orient" else EdgeMPNN
        return cls(num_input_features=dataset.num_features[1],
                   num_classes=out_size, num_layers=args.num_layers,
                   hidden=args.emb_dim, dropout_rate=args.drop_rate,
                   nonlinearity=args.nonlinearity, readout=args.readout,
                   fully_invar=args.fully_orient_invar)
    if name == "ring_sparse_cin":
        from cwn_tpu.models.ring_exp import RingSparseCIN
        return RingSparseCIN(num_input_features=num_feat,
                             num_classes=out_size,
                             num_layers=args.num_layers, hidden=args.emb_dim,
                             max_dim=args.max_dim,
                             nonlinearity=args.nonlinearity,
                             train_eps=train_eps, use_coboundaries=use_cob,
                             graph_norm=args.graph_norm)
    if name == "ring_gin":
        from cwn_tpu.models.ring_exp import RingGIN
        return RingGIN(num_features=num_feat, num_layers=args.num_layers,
                       hidden=args.emb_dim, num_classes=out_size,
                       nonlinearity=args.nonlinearity,
                       graph_norm=args.graph_norm)
    if name in ("gin", "gin0", "gin_jk", "gin0_jk"):
        from cwn_tpu.models.graph import GIN
        return GIN(num_features=num_feat, num_layers=args.num_layers,
                   hidden=args.emb_dim, num_classes=out_size,
                   readout=args.readout, dropout_rate=args.drop_rate,
                   nonlinearity=args.nonlinearity,
                   train_eps=(name in ("gin", "gin_jk")),
                   jump_mode="cat" if name.endswith("_jk") else None)
    raise ValueError(f"Unknown model {args.model}")


def main(args) -> Dict:
    """Run one experiment; returns the curves/results dict."""
    import jax

    # Persistent compilation cache: TPU compiles go through a remote
    # helper and can take minutes cold; repeat runs (multi-seed wrappers,
    # resumed experiments) must hit the on-disk cache.
    cache_dir = os.environ.get(
        "CWN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    np.random.seed(args.seed)

    # --device -1 pins to the CPU backend (small experiments where TPU
    # dispatch latency dominates); >=0 keeps the default backend.
    if args.device < 0:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    if args.task_type == "isomorphism":
        # fp64 on CPU: TPUs have no native double precision and the SR
        # expressivity protocol requires it (reference run_exp.py:41-43).
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        x_dtype = np.float64
    else:
        x_dtype = np.float32

    gin_family = args.model in ("gin", "gin0", "gin_jk", "gin0_jk")
    from cwn_tpu.data.datasets.tu import TU_DATASETS
    if gin_family and args.dataset.upper() == "GRAPH-SYNTH":
        from cwn_tpu.data.datasets.graphs import load_synth_graph_dataset
        dataset = load_synth_graph_dataset(seed=0)
    elif gin_family and args.dataset.upper() in TU_DATASETS:
        # GIN baselines consume plain graphs (parity:
        # /root/reference/data/data_loading.py:198-258).
        from cwn_tpu.data.datasets.graphs import load_graph_dataset
        dataset = load_graph_dataset(args.dataset.upper(),
                                     fold=args.fold or 0, seed=0)
    else:
        # Orientation protocol flags reach the trajectory loaders
        # (parity: /root/reference/exp/run_exp.py:79-84 — flow_points /
        # train_orient / test_orient; flow_classes is parsed but unused by
        # the reference's FlowDataset too).
        extra = {}
        if args.dataset.upper() == "FLOW":
            extra = dict(num_points=args.flow_points,
                         train_orient=args.train_orient,
                         test_orient=args.test_orient)
        elif args.dataset.upper() in ("OCEAN", "OCEAN-SYNTH"):
            extra = dict(train_orient=args.train_orient,
                         test_orient=args.test_orient)
        dataset = load_dataset(
            args.dataset, fold=args.fold, seed=0, max_dim=args.max_dim,
            max_ring_size=args.max_ring_size,
            include_down_adj=args.include_down_adj,
            init_method=args.init_method,
            use_edge_features=args.use_edge_features,
            simple_features=getattr(args, "simple_features", False),
            n_jobs=args.preproc_jobs, **extra)

    # Pallas fast path: the default on TPU (the reference's fused
    # torch-scatter path is likewise its default, /root/reference/mp/
    # cell_mp.py:423-479); fp64 isomorphism runs keep the XLA oracle.
    use_pallas = getattr(args, "use_pallas", "auto")
    if use_pallas == "auto":
        use_pallas = (jax.default_backend() == "tpu"
                      and args.task_type != "isomorphism"
                      and args.device >= 0)
    else:
        use_pallas = use_pallas == "true"

    n_devices = max(1, int(getattr(args, "n_devices", 1)))

    if getattr(args, "tune", False):
        # Parity note: the reference's tune split raises NotImplementedError
        # (/root/reference/data/datasets/tu.py:123-129); run_tu_tuning uses
        # the standard folds, and so do we.
        print("NOTE: --tune runs on the standard split "
              "(reference tune split is unimplemented)")

    keep_top = args.model in ("edge_orient", "edge_mpnn") or \
        (gin_family and dataset.max_dim == 0)
    mk_loader = lambda split, shuffle, shards=1: ComplexLoader(
        dataset.split(split), batch_size=args.batch_size,
        max_dim=dataset.max_dim, shuffle=shuffle, seed=args.seed,
        pad_multiple=args.pad_multiple, keep_top_upper=keep_top,
        x_dtype=x_dtype, use_pallas=use_pallas, n_shards=shards)
    train_loader = mk_loader("train", True, n_devices)
    val_loader = mk_loader("val", False)
    test_loader = mk_loader("test", False)

    model = build_model(args, dataset)

    cfg = TrainConfig(
        task_type=dataset.task_type if args.task_type != "isomorphism"
        else "classification",
        eval_metric=dataset.eval_metric, lr=args.lr,
        lr_scheduler=args.lr_scheduler,
        lr_scheduler_decay_steps=args.lr_scheduler_decay_steps,
        lr_scheduler_decay_rate=args.lr_scheduler_decay_rate,
        lr_scheduler_patience=int(args.lr_scheduler_patience),
        lr_scheduler_min=args.lr_scheduler_min,
        minimize=dataset.minimize or args.minimize,
        early_stop=args.early_stop, seed=args.seed, iso_eps=args.iso_eps)

    example = next(iter(train_loader))
    trainer = Trainer(model, cfg, example, n_devices=n_devices)

    # Parameter table (parity: /root/reference/exp/run_exp.py:330-340).
    print(trainer.param_table())

    if args.task_type == "isomorphism":
        # Cast everything to fp64 and evaluate untrained embeddings.
        import jax.numpy as jnp
        trainer.params = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, trainer.params)
        trainer.batch_stats = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, trainer.batch_stats)
        trainer._build_steps()
        loader = mk_loader("test", False)
        y_pred, _ = trainer.predict(loader)
        assert y_pred.dtype == np.float64
        ev = Evaluator("isomorphism", eps=args.iso_eps)
        failure = ev.eval({"y_pred": y_pred, "y_true": None})
        result = {"failure_rate": failure, "y_pred_mag": float(np.abs(y_pred).max())}
        print(f"[{args.dataset}] isomorphism failure rate: {failure:.4f}")
        return result

    curves = {"train": [], "val": [], "test": [], "train_loss": [],
              "params": trainer.count_params()}

    # Checkpoint/resume (the reference has no persistence; SURVEY section 5.4).
    ckpt = None
    start_epoch = 0
    if getattr(args, "checkpoint_dir", None):
        from cwn_tpu.utils.checkpoint import CheckpointManager
        ckpt = CheckpointManager(args.checkpoint_dir)
        restored = ckpt.restore(trainer)
        if restored is not None:
            meta = ckpt.restore_meta(restored)
            curves.update({
                k: [np.nan if x is None else x for x in v]
                for k, v in meta.get("curves", {}).items()})
            start_epoch = restored + 1
            print(f"Resumed from checkpoint at epoch {restored}")

    # Optional jax.profiler trace of the first post-compile train steps.
    if getattr(args, "profile_dir", None):
        from cwn_tpu.utils.profiling import trace
        warm = iter(train_loader)
        trainer.train_batch(next(warm))   # compile outside the trace
        with trace(args.profile_dir):
            for _ in range(3):
                try:
                    trainer.train_batch(next(warm))
                except StopIteration:
                    break

    best_val = -np.inf if not cfg.minimize else np.inf
    for epoch in range(start_epoch,
                       args.epochs if not args.untrained else 0):
        t0 = time.time()
        losses = trainer.train_epoch(train_loader)
        val = trainer.evaluate(val_loader)
        # Trajectory datasets expose the same split as val AND test
        # (parity: the reference's FLOW/OCEAN do too) — don't pay the
        # second eval pass for an identical number.
        if list(dataset.val_ids) == list(dataset.test_ids):
            test = dict(val)
        else:
            test = trainer.evaluate(test_loader)
        if (epoch + 1) % args.train_eval_period == 0:
            tr_metric = trainer.evaluate(mk_loader("train", False))["metric"]
        else:
            tr_metric = np.nan
        curves["train"].append(tr_metric)
        curves["val"].append(val["metric"])
        curves["test"].append(test["metric"])
        curves["train_loss"].append(float(np.mean(losses)) if losses else np.nan)
        trainer.scheduler.step(val["metric"])
        st = trainer.step_timer.summary()
        print(f"epoch {epoch:3d}: loss={curves['train_loss'][-1]:.4f} "
              f"val={val['metric']:.4f} test={test['metric']:.4f} "
              f"lr={trainer.lr:.2e} "
              f"(step p50 {1e3 * st.get('p50_s', float('nan')):.1f}ms, "
              f"{time.time() - t0:.1f}s)")
        if ckpt is not None and (epoch + 1) % args.checkpoint_period == 0:
            # NaN is not valid JSON: ship curve gaps as None.
            ckpt.save(epoch, trainer, extra={"curves": {
                k: [None if (isinstance(x, float) and np.isnan(x)) else x
                    for x in v]
                for k, v in curves.items() if isinstance(v, list)}})
        if trainer.should_early_stop():
            print("Early stop: minimum LR reached")
            break

    if curves["val"]:
        vals = np.array(curves["val"])
        best_epoch = int(np.argmin(vals) if cfg.minimize else np.argmax(vals))
        curves["best_epoch"] = best_epoch
        curves["best_val"] = float(vals[best_epoch])
        curves["test_at_best"] = float(curves["test"][best_epoch])
        curves["last_train"] = curves["train"][-1]
        curves["last_val"] = float(vals[-1])
        print(f"best epoch {best_epoch}: val={curves['best_val']:.4f} "
              f"test={curves['test_at_best']:.4f}")

    if args.dump_curves:
        os.makedirs(args.result_folder, exist_ok=True)
        out = os.path.join(args.result_folder,
                           f"{args.dataset}-{args.exp_name}")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "curves.pkl"), "wb") as f:
            pickle.dump(curves, f)
        with open(os.path.join(out, "results.txt"), "w") as f:
            for k in ("best_epoch", "best_val", "test_at_best", "params"):
                if k in curves:
                    f.write(f"{k}: {curves[k]}\n")
    return curves


if __name__ == "__main__":
    from cwn_tpu.exp.parser import get_parser, validate_args
    args = get_parser().parse_args()
    validate_args(args)
    result = main(args)
    if getattr(args, "curves_json", None):
        # Subprocess channel for run_isolated: numpy scalars -> python,
        # NaN survives the round trip (Python json reads the NaN literal).
        import json
        with open(args.curves_json, "w") as f:
            json.dump(result, f, default=float)
