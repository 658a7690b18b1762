"""Decompose the ZINC-SYNTH per-step wall time: host pack, upload,
dispatch, sync.  Round-4 lever 1 (VERDICT: 45ms p50 vs 3.15ms compute).
"""
import time

import jax
import numpy as np

from cwn_tpu.data.datasets import load_dataset
from cwn_tpu.train import ComplexLoader, Trainer, TrainConfig
from cwn_tpu.exp.run_exp import build_model
from cwn_tpu.exp.parser import get_parser, validate_args


def main():
    p = get_parser()
    args = p.parse_args([
        "--dataset", "ZINC-SYNTH", "--model", "embed_sparse_cin",
        "--epochs", "1", "--batch_size", "128", "--drop_rate", "0.0",
        "--emb_dim", "48", "--max_dim", "2", "--lr", "0.001",
        "--graph_norm", "bn", "--num_layers", "2", "--readout", "sum",
        "--max_ring_size", "18", "--task_type", "regression",
        "--eval_metric", "mae", "--minimize", "--use_coboundaries", "True",
        "--use_edge_features", "--use_pallas", "false",
        "--lr_scheduler", "ReduceLROnPlateau",
        "--exp_name", "profile", "--seed", "0"])
    validate_args(args)
    dataset = load_dataset(args.dataset, max_dim=2, max_ring_size=18,
                           init_method="sum", use_edge_features=True,
                           n_jobs=4)
    loader = ComplexLoader(dataset.split("train"), batch_size=128,
                           max_dim=2, shuffle=True, seed=0,
                           use_pallas=False)
    model = build_model(args, dataset)
    cfg = TrainConfig(task_type="regression", eval_metric="mae",
                      lr=0.001, minimize=True, seed=0)
    batches_iter = loader._iter_host()
    first = next(batches_iter)
    from cwn_tpu.train.loader import fused_device_put
    example = fused_device_put(first)
    trainer = Trainer(model, cfg, example)

    # warm up compile on the example shape
    trainer.train_batch(example)
    jax.block_until_ready(trainer.params)

    # Now decompose 30 steps.
    t_pack, t_put, t_disp, t_sync = [], [], [], []
    sizes = []
    n = 0
    for _ in range(3):
        it = loader._iter_host()
        for host_batch in it:
            t0 = time.perf_counter()        # (pack happened inside iter)
            dev_batch = fused_device_put(host_batch)
            t1 = time.perf_counter()
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            out = trainer._train_step(trainer.params, trainer.batch_stats,
                                      trainer.opt_state, dev_batch, step_rng,
                                      np.float32(0.001))
            trainer.params, trainer.batch_stats, trainer.opt_state, loss = out
            t2 = time.perf_counter()
            loss = float(loss)
            t3 = time.perf_counter()
            t_put.append(t1 - t0)
            t_disp.append(t2 - t1)
            t_sync.append(t3 - t2)
            leaves = jax.tree_util.tree_leaves(host_batch)
            sizes.append(sum(l.nbytes for l in leaves
                             if isinstance(l, np.ndarray)))
            n += 1
            if n >= 30:
                break
        if n >= 30:
            break

    # host pack time alone:
    idx = np.arange(len(loader.complexes))[:128]
    cs = [loader.complexes[i] for i in idx]
    tp = time.perf_counter()
    for _ in range(5):
        b = loader._pack_one(cs)
    t_pack_one = (time.perf_counter() - tp) / 5

    def s(v):
        v = np.array(v) * 1e3
        return f"p50={np.percentile(v,50):.1f}ms mean={v.mean():.1f}ms"

    print("batch nbytes (host leaves):", np.mean(sizes) / 1e6, "MB")
    print("pack_one (host):", t_pack_one * 1e3, "ms")
    print("fused_device_put:", s(t_put))
    print("dispatch:", s(t_disp))
    print("float(loss) sync:", s(t_sync))
    print("total:", s(np.array(t_put) + np.array(t_disp) + np.array(t_sync)))


if __name__ == "__main__":
    main()
