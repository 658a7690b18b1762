"""Trained reference comparator on ZINC-SYNTH (BASELINE.md's parity
north star, VERDICT r4 missing #4).

Trains the ACTUAL reference model — /root/reference/mp/molec_models.py:12
``EmbedSparseCIN`` running the reference's own train/eval loop
(/root/reference/exp/train_utils.py:16-144) and scheduler semantics
(/root/reference/exp/run_exp.py:343-408) on CPU torch via the dependency
shims (tools/ref_shims) — on the SAME ZINC-SYNTH splits our recorded runs
use (exp_results/cinpp_zinc_synth.json: emb 48, 2 layers, ring 18, bs 128,
<=200 epochs, ReduceLROnPlateau patience 20 + early stop at min lr).

The output JSON gives reference-vs-ours test MAE under identical configs:
the activation-parity suite (tests/test_ref_parity.py) already pins that
both stacks compute the same function of the same weights; this pins that
both stacks *train* to the same quality.

Usage: python exp_runs/ref_zinc_train.py [epochs] [seed ...]
Resumable: completed seeds are cached in the JSON.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "exp_results", "ref_zinc_train.json")


def run_one(seed: int, epochs: int):
    import torch

    # Leave a core for the concurrently-running TPU queue's host side.
    torch.set_num_threads(max(1, (os.cpu_count() or 2) - 1))

    sys.path.insert(0, os.path.join(HERE, "tools"))
    from ref_parity import load_reference, to_ref_complex
    ref_complex, _ = load_reference()
    import importlib
    ref_molec = importlib.import_module("mp.molec_models")
    ref_train_utils = importlib.import_module("exp.train_utils")

    class _Loader:
        """Minimal stand-in for the reference DataLoader/Collater
        (/root/reference/data/data_loading.py:44-110): shuffled chunks
        collated with ComplexBatch.from_complex_list.  The real class
        pulls in the reference's full dataset zoo (gudhi/graph-tool
        imports) which the shims deliberately don't cover."""

        def __init__(self, complexes, batch_size, shuffle, max_dim):
            self.cs, self.bs = complexes, batch_size
            self.shuffle, self.max_dim = shuffle, max_dim

        def __iter__(self):
            idx = np.arange(len(self.cs))
            if self.shuffle:
                idx = torch.randperm(len(self.cs)).numpy()
            for s in range(0, len(idx), self.bs):
                chunk = [self.cs[i] for i in idx[s:s + self.bs]]
                yield ref_complex.ComplexBatch.from_complex_list(
                    chunk, max_dim=self.max_dim)

        def __len__(self):
            return (len(self.cs) + self.bs - 1) // self.bs

    from cwn_tpu.data.datasets import load_dataset
    ds = load_dataset("ZINC-SYNTH", max_dim=2, max_ring_size=18,
                      init_method="sum", use_edge_features=True, n_jobs=2)

    # Reference seeding (/root/reference/exp/run_exp.py:34-38).
    np.random.seed(seed)
    torch.manual_seed(seed)

    loaders = {}
    for split, shuffle in (("train", True), ("val", False), ("test", False)):
        cs = [to_ref_complex(c, ref_complex) for c in ds.split(split)]
        loaders[split] = _Loader(cs, batch_size=128, shuffle=shuffle,
                                 max_dim=2)

    model = ref_molec.EmbedSparseCIN(
        atom_types=ds.num_node_type, bond_types=ds.num_edge_type,
        out_size=1, num_layers=2, hidden=48, dropout_rate=0.0, max_dim=2,
        jump_mode=None, nonlinearity="relu", readout="sum",
        final_readout="sum", apply_dropout_before="lin2", embed_edge=True,
        use_coboundaries=True, graph_norm="bn")
    device = torch.device("cpu")
    model.to(device)

    optimizer = torch.optim.Adam(model.parameters(), lr=0.001)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="min", factor=0.5, patience=20)
    evaluator = ref_train_utils.Evaluator("mae")

    valid_curve, test_curve = [], []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        losses = ref_train_utils.train(model, device, loaders["train"],
                                       optimizer, "regression")
        valid_perf, _ = ref_train_utils.eval(model, device, loaders["val"],
                                             evaluator, "regression")
        test_perf, _ = ref_train_utils.eval(model, device, loaders["test"],
                                            evaluator, "regression")
        valid_curve.append(valid_perf)
        test_curve.append(test_perf)
        print(f"[ref-zinc s{seed}] epoch {epoch:3d}: "
              f"loss={float(np.mean(losses)):.4f} val={valid_perf:.4f} "
              f"test={test_perf:.4f} "
              f"lr={optimizer.param_groups[0]['lr']:.2e} "
              f"({time.time() - t0:.1f}s)", flush=True)
        scheduler.step(valid_perf)
        # Strict-inequality early stop (/root/reference/exp/run_exp.py:405).
        if optimizer.param_groups[0]["lr"] < 1e-5:
            print("Early stop: minimum learning rate reached", flush=True)
            break

    best_epoch = int(np.argmin(valid_curve))
    return {"best_epoch": best_epoch,
            "best_val": float(valid_curve[best_epoch]),
            "test_at_best": float(test_curve[best_epoch]),
            "epochs_run": len(valid_curve)}


def run(epochs: int, seeds):
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("runs", {})
    for seed in seeds:
        k = f"s{seed}"
        if k in results:
            print(f"{k}: cached")
            continue
        results[k] = run_one(seed, epochs)
        print(f"[ref-zinc] {k}: {results[k]}", flush=True)
        _dump(results, epochs)
    _dump(results, epochs)
    print("[ref-zinc] COMPLETE")


def _dump(results, epochs):
    maes = [v["test_at_best"] for v in results.values()]
    ours = None
    ours_path = os.path.join(HERE, "exp_results", "cinpp_zinc_synth.json")
    if os.path.exists(ours_path):
        with open(ours_path) as f:
            ours = json.load(f)["mean_test_mae"].get("embed_sparse_cin")
    with open(OUT, "w") as f:
        json.dump({
            "note": "REFERENCE EmbedSparseCIN (torch CPU via shims, its own "
                    "train/eval loop) on ZINC-SYNTH, cwn-zinc-small config "
                    f"(emb 48, 2 layers, ring 18, bs 128, <={epochs} epochs, "
                    "ReduceLROnPlateau p20 + early stop); test MAE at best "
                    "val.  Comparator for cinpp_zinc_synth.json.",
            "ref_mean_test_mae": float(np.mean(maes)),
            "ref_std_test_mae": float(np.std(maes)),
            "ours_mean_test_mae_embed_sparse_cin": ours,
            "runs": results}, f, indent=1)


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]
    run(epochs, seeds)
