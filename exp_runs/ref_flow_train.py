"""FLOW `id` diagnosis (VERDICT r4 weak #5): train the REFERENCE
EdgeOrient on the SAME synthetic FLOW data our runs use.

Our edge_orient id lands at 87.7% +/- 1.0 (exp_results/flow_id.json) vs
the ~95-100% band BASELINE.md records from the MPSN paper for id/tanh.
Two hypotheses: (a) synthetic-data artifact (the paper's band is for ITS
Delaunay/hole geometry and trajectory generator) — then the shimmed
reference lands ~88% here too; (b) a bug on our side — then it hits 95+.

Config: mpsn-flow.sh (/root/reference/exp/scripts/mpsn-flow.sh — 4 layers,
emb 64, bs 64, 100 epochs, StepLR decay 20 x0.5, test_orient random),
model /root/reference/mp/models.py:476, the reference's own train/eval
loop via exp.train_utils.

Usage: python exp_runs/ref_flow_train.py [nonlinearity] [seed ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(nonlinearity: str, seed: int, epochs: int = 100):
    import torch
    torch.set_num_threads(int(os.environ.get(
        "CWN_REF_THREADS", max(1, (os.cpu_count() or 2) - 1))))

    sys.path.insert(0, os.path.join(HERE, "tools"))
    from ref_parity import load_reference, to_ref_complex
    ref_complex, ref_models = load_reference()
    import importlib
    ref_train_utils = importlib.import_module("exp.train_utils")

    from cwn_tpu.data.datasets import load_dataset
    ds = load_dataset("FLOW", max_dim=2, num_points=1000,
                      train_orient="default", test_orient="random", n_jobs=2)

    np.random.seed(seed)
    torch.manual_seed(seed)

    def mk_loader(split, shuffle):
        # FLOW batches are dim-1 CochainBatches in the reference
        # (/root/reference/data/data_loading.py:58-59); the trajectory
        # label rides the cochain's y.
        def to_ref_cochain(c):
            co = c.cochains[1]

            def t(a, dt):
                return None if a is None else \
                    torch.as_tensor(np.asarray(a)).to(dt)

            rc = ref_complex.Cochain(
                dim=1, x=t(co.x, torch.float32),
                upper_index=t(co.upper_index, torch.long),
                lower_index=t(co.lower_index, torch.long),
                shared_coboundaries=t(co.shared_coboundaries, torch.long),
                shared_boundaries=t(co.shared_boundaries, torch.long),
                upper_orient=t(co.upper_orient, torch.float32),
                lower_orient=t(co.lower_orient, torch.float32),
                y=torch.as_tensor(np.asarray(c.y).reshape(-1)))
            # Batching offsets need the neighbour-dim counts
            # (/root/reference/data/complex.py:148-169 __inc__).
            rc.num_cells_down = int(c.cochains[0].num_cells or 0)
            up = c.cochains.get(2)
            if up is not None and (up.num_cells or 0):
                rc.num_cells_up = int(up.num_cells)
            return rc

        cs = [to_ref_cochain(c) for c in ds.split(split)]

        class L:
            def __iter__(self):
                idx = (torch.randperm(len(cs)).numpy() if shuffle
                       else np.arange(len(cs)))
                for s in range(0, len(idx), 64):
                    yield ref_complex.CochainBatch.from_cochain_list(
                        [cs[i] for i in idx[s:s + 64]])

            def __len__(self):
                return (len(cs) + 63) // 64
        return L()

    train_loader = mk_loader("train", True)
    test_loader = mk_loader("test", False)

    model = ref_models.EdgeOrient(
        num_input_features=1, num_classes=2, num_layers=4, hidden=64,
        dropout_rate=0.0, nonlinearity=nonlinearity, readout="sum",
        fully_invar=False)
    device = torch.device("cpu")
    model.to(device)
    optimizer = torch.optim.Adam(model.parameters(), lr=0.001)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 20, gamma=0.5)
    evaluator = ref_train_utils.Evaluator("accuracy")

    curve = []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        losses = ref_train_utils.train(model, device, train_loader,
                                       optimizer, "classification")
        perf, _ = ref_train_utils.eval(model, device, test_loader,
                                       evaluator, "classification")
        curve.append(perf)
        scheduler.step()
        print(f"[ref-flow-{nonlinearity} s{seed}] epoch {epoch:3d}: "
              f"loss={float(np.mean(losses)):.4f} test={perf:.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)
    best = int(np.argmax(curve))
    return {"best_epoch": best, "best_test": float(curve[best]),
            "last_test": float(curve[-1])}


def run(nonlinearity: str, seeds, epochs=100):
    out = os.path.join(HERE, "exp_results",
                       f"ref_flow_{nonlinearity}.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("runs", {})
    for seed in seeds:
        k = f"s{seed}"
        if k in results:
            print(f"{k}: cached")
            continue
        results[k] = run_one(nonlinearity, seed, epochs)
        print(f"[ref-flow-{nonlinearity}] {k}: {results[k]}", flush=True)
        bests = [v["best_test"] for v in results.values()]
        with open(out, "w") as f:
            json.dump({
                "note": f"REFERENCE EdgeOrient {nonlinearity} (torch CPU "
                        "via shims, its own train/eval loop) on OUR "
                        "synthetic FLOW data, mpsn-flow.sh config; best "
                        "test accuracy per seed.  Comparator for "
                        f"flow_{nonlinearity}.json.",
                "ref_mean_best_test": float(np.mean(bests)),
                "ref_std_best_test": float(np.std(bests)),
                "runs": results}, f, indent=1)
    print(f"[ref-flow-{nonlinearity}] COMPLETE ({len(results)} seeds)")


if __name__ == "__main__":
    nl = sys.argv[1] if len(sys.argv) > 1 else "id"
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]
    run(nl, seeds)
