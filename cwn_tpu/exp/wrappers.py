"""Multi-run wrappers: seeds, folds, SR families, ring sizes.

Parity: /root/reference/exp/run_mol_exp.py, run_sr_exp.py, run_tu_exp.py,
run_ring_exp.py.

Every run executes in a fresh subprocess via ``run_isolated`` (see
cwn_tpu/exp/isolate.py): round 4 measured ~20 GB of host RSS growth per
completed in-process run, which OOM-killed every multi-seed task at seed
3+.  A failed run is logged and skipped — the remaining seeds still
execute and the summary reports the failure count instead of dying with
the process.  Set CWN_INPROC=1 to run in-process (tests), which clears
the jit/device caches between runs instead.
"""
from __future__ import annotations

import copy
from typing import Dict, List, Optional

import numpy as np

from cwn_tpu.exp.isolate import RunFailed, run_isolated
from cwn_tpu.exp.parser import get_parser

RING_SIZES = list(range(10, 32, 2))

SR_FAMILIES = ["sr16622", "sr251256", "sr261034", "sr281264", "sr291467",
               "sr351668", "sr351899", "sr361446", "sr401224"]
# Per-family clique-complex dimension for the MPSN SR protocol
# (/root/reference/exp/run_sr_exp.py:28-38 __max_dim__, in family order).
SR_CLIQUE_DIMS = {"sr16622": 3, "sr251256": 4, "sr261034": 3, "sr281264": 6,
                  "sr291467": 4, "sr351668": 4, "sr351899": 6, "sr361446": 3,
                  "sr401224": 3}


def _try_run(argv: List[str], failures: List[str], tag: str) -> Optional[Dict]:
    try:
        return run_isolated(argv, tag=tag)
    except RunFailed as e:
        print(f"[wrapper] run FAILED (rc={e.rc}): {tag} — continuing")
        failures.append(tag)
        return None


def run_mol_exp(passed_args: List[str]) -> Dict:
    """Multi-seed (and multi-fold for CSL) aggregation at best-val epoch
    (parity: run_mol_exp.py:12-99)."""
    parser = get_parser()
    args = parser.parse_args(copy.copy(passed_args))
    results = []
    failures: List[str] = []
    folds = list(range(args.folds)) if args.folds else [None]
    for seed in range(args.start_seed, args.stop_seed + 1):
        for fold in folds:
            extra = ["--seed", str(seed)]
            if fold is not None:
                extra += ["--fold", str(fold)]
            curves = _try_run(copy.copy(passed_args) + extra, failures,
                              f"seed {seed} fold {fold}")
            if curves is not None:
                results.append(curves)
    test_at_best = [r["test_at_best"] for r in results]
    last_vals = [r["last_val"] for r in results]
    summary = {
        "test_at_best_mean": float(np.mean(test_at_best)),
        "test_at_best_std": float(np.std(test_at_best)),
        "last_val_mean": float(np.mean(last_vals)),
        "runs": len(results),
        "failed_runs": failures,
    }
    print(f"=== {args.dataset} {args.model}: "
          f"test@best {summary['test_at_best_mean']:.4f} "
          f"+/- {summary['test_at_best_std']:.4f} over {len(results)} runs"
          + (f" ({len(failures)} FAILED)" if failures else ""))
    return summary


def run_sr_exp(passed_args: List[str],
               families: Optional[List[str]] = None) -> Dict:
    """Per-family isomorphism failure-rate stats over seeds
    (parity: run_sr_exp.py:40-103)."""
    parser = get_parser()
    args = parser.parse_args(copy.copy(passed_args))
    families = families or SR_FAMILIES
    table = {}
    failures: List[str] = []
    for family in families:
        rates = []
        for seed in range(args.start_seed, args.stop_seed + 1):
            extra = ["--dataset", family, "--seed", str(seed)]
            if args.max_ring_size is None:
                max_dim = SR_CLIQUE_DIMS[family]
                extra += ["--max_dim", str(max_dim)]
            else:
                max_dim = 2
            # Read out over ALL complex dims — the reference wrapper
            # overrides the (0,1,2) default with range(max_dim+1)
            # (/root/reference/exp/run_sr_exp.py:77-80); without the
            # higher-dim readouts the clique families at dim>2 lose
            # distinguishing power (observed: 5-8% failure vs ~0).
            extra += ["--readout_dims"] + [str(i) for i in range(max_dim + 1)]
            res = _try_run(copy.copy(passed_args) + extra, failures,
                           f"{family} seed {seed}")
            if res is not None:
                rates.append(res["failure_rate"])
        if not rates:
            table[family] = {"failed": True}
            continue
        table[family] = {"mean": float(np.mean(rates)),
                         "min": float(np.min(rates)),
                         "max": float(np.max(rates))}
        print(f"{family}: failure {table[family]['mean']:.4f} "
              f"[{table[family]['min']:.4f}, {table[family]['max']:.4f}]")
    if failures:
        table["failed_runs"] = failures
    return table


def run_tu_exp(passed_args: List[str]) -> Dict:
    """10-fold cross-validation with best shared epoch on the mean val curve
    (parity: run_tu_exp.py:21-62)."""
    parser = get_parser()
    args = parser.parse_args(copy.copy(passed_args))
    fold_curves = []
    failures: List[str] = []
    for fold in range(10):
        curves = _try_run(copy.copy(passed_args) + ["--fold", str(fold)],
                          failures, f"fold {fold}")
        if curves is not None:
            fold_curves.append(curves["val"])
    min_len = min(len(c) for c in fold_curves)
    val_matrix = np.array([c[:min_len] for c in fold_curves])
    mean_curve = val_matrix.mean(axis=0)
    best_epoch = int(np.argmax(mean_curve))
    summary = {
        "best_epoch": best_epoch,
        "acc_mean": float(mean_curve[best_epoch]),
        "acc_std": float(val_matrix[:, best_epoch].std()),
        "failed_runs": failures,
    }
    print(f"=== {args.dataset}: {summary['acc_mean']:.4f} "
          f"+/- {summary['acc_std']:.4f} at epoch {best_epoch}")
    return summary


def run_ring_exp(passed_args: List[str]) -> Dict:
    """Ring sizes 10..30 as pseudo-folds; CIN uses 3 layers, GIN k/2
    (parity: run_ring_exp.py:10-44)."""
    parser = get_parser()
    args = parser.parse_args(copy.copy(passed_args))
    assert args.max_ring_size is None
    results = {}
    failures: List[str] = []
    for size in RING_SIZES:
        num_layers = 3 if args.model == "ring_sparse_cin" else size // 2
        accs = []
        for seed in range(args.start_seed, args.stop_seed + 1):
            curves = _try_run(
                copy.copy(passed_args)
                + ["--max_ring_size", str(size),
                   "--num_layers", str(num_layers), "--seed", str(seed)],
                failures, f"size {size} seed {seed}")
            if curves is not None:
                accs.append(curves["last_val"])
        if not accs:
            results[size] = {"failed": True}
            continue
        results[size] = {"mean": float(np.mean(accs)),
                         "std": float(np.std(accs))}
        print(f"ring size {size}: {results[size]['mean']:.4f} "
              f"+/- {results[size]['std']:.4f}")
    if failures:
        results["failed_runs"] = failures
    return results
