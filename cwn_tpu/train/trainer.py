"""The trainer: jitted steps, loss functions, LR schedulers, early stop.

Parity targets:
  /root/reference/exp/train_utils.py:16-144 (train/eval loops, loss per
  task type, NaN-target masking, BN small-batch skip)
  /root/reference/exp/run_exp.py:343-427 (Adam, StepLR /
  ReduceLROnPlateau, early stop at min LR, best-epoch selection)

The schedulers run in Python outside jit (control flow on eval metrics);
the LR reaches the compiled step through optax.inject_hyperparams.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.train.evaluator import Evaluator


# ---------------------------------------------------------------------------
# Loss functions (sum + weight so the mean is computed over valid entries).
# ---------------------------------------------------------------------------


def _classification_loss(logits, y, y_mask):
    y = y.astype(jnp.int32).reshape(-1)
    ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    return (ls * y_mask).sum(), y_mask.sum()


def _bin_classification_loss(logits, y, y_mask):
    y = y.astype(logits.dtype)
    if y.ndim == 1:
        y = y[:, None]
    valid = jnp.isfinite(y) * y_mask[:, None]
    y_safe = jnp.where(jnp.isfinite(y), y, 0.0)
    ls = optax.sigmoid_binary_cross_entropy(logits, y_safe)
    return (ls * valid).sum(), valid.sum()


def _regression_loss(pred, y, y_mask):
    y = y.astype(pred.dtype).reshape(pred.shape)
    valid = jnp.isfinite(y) * (y_mask[:, None] if y.ndim > 1 else y_mask)
    y_safe = jnp.where(jnp.isfinite(y), y, 0.0)
    ls = jnp.abs(pred - y_safe)
    return (ls * valid).sum(), valid.sum()


def _mse_regression_loss(pred, y, y_mask):
    y = y.astype(pred.dtype).reshape(pred.shape)
    valid = jnp.isfinite(y) * (y_mask[:, None] if y.ndim > 1 else y_mask)
    y_safe = jnp.where(jnp.isfinite(y), y, 0.0)
    ls = jnp.square(pred - y_safe)
    return (ls * valid).sum(), valid.sum()


LOSSES = {
    "classification": _classification_loss,
    "bin_classification": _bin_classification_loss,
    "regression": _regression_loss,
    "mse_regression": _mse_regression_loss,
}


# ---------------------------------------------------------------------------
# LR schedulers (host-side state machines, reference semantics).
# ---------------------------------------------------------------------------


class StepLR:
    def __init__(self, lr: float, decay_steps: int, decay_rate: float):
        self.base_lr = lr
        self.decay_steps = decay_steps
        self.decay_rate = decay_rate
        self.epoch = 0

    @property
    def lr(self) -> float:
        return self.base_lr * (self.decay_rate ** (self.epoch // self.decay_steps))

    def step(self, metric: Optional[float] = None):
        self.epoch += 1


class ReduceLROnPlateau:
    """Torch-semantics plateau scheduler (mode from `minimize`).

    Includes torch's default relative improvement threshold (1e-4,
    threshold_mode='rel'): a metric must beat best by a relative margin
    to reset patience — without it, infinitesimal improvements kept the
    LR high for tens of extra epochs vs the reference's schedule."""

    def __init__(self, lr: float, mode: str = "min", factor: float = 0.5,
                 patience: int = 10, min_lr: float = 1e-5,
                 threshold: float = 1e-4):
        self._lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.num_bad = 0

    @property
    def lr(self) -> float:
        return self._lr

    def _is_better(self, m: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return m < self.best * (1.0 - self.threshold)
        return m > self.best * (1.0 + self.threshold)

    def step(self, metric: Optional[float] = None):
        if metric is None:
            return
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self._lr = max(self._lr * self.factor, self.min_lr)
                self.num_bad = 0


class NoScheduler:
    def __init__(self, lr: float):
        self.lr = lr

    def step(self, metric: Optional[float] = None):
        pass


def make_scheduler(name: Optional[str], lr: float, *, decay_steps=50,
                   decay_rate=0.5, patience=10, min_lr=1e-5, minimize=False):
    if name == "StepLR":
        return StepLR(lr, decay_steps, decay_rate)
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(lr, "min" if minimize else "max",
                                 decay_rate, patience, min_lr)
    if name in (None, "None"):
        return NoScheduler(lr)
    raise NotImplementedError(f"Scheduler {name} is not currently supported")


def _fetch_all(arrs: List) -> List:
    """Fetch a mixed list of device/host arrays with one device->host
    transfer per distinct (shape, dtype) group: device entries are
    jnp.stack'ed per group and pulled in a single np.asarray (each
    separate small fetch costs a full ~60 ms round trip over the
    tunneled chip)."""
    groups: Dict = {}
    for i, a in enumerate(arrs):
        if a is None or isinstance(a, np.ndarray):
            continue
        sig = (tuple(a.shape), str(a.dtype))
        groups.setdefault(sig, []).append(i)
    out = list(arrs)
    for idcs in groups.values():
        stacked = np.asarray(jnp.stack([arrs[i] for i in idcs]))
        for j, i in enumerate(idcs):
            out[i] = stacked[j]
    return [None if a is None else np.asarray(a) for a in out]


def _fetch_lists(*lists: List) -> List[List]:
    """Fetch several lists of device/host arrays in ONE device->host
    transfer: every device entry is flattened to f32 and concatenated,
    one np.asarray pulls the lot, and the pieces are re-split host-side.
    Each small fetch is a full ~30 ms round trip over the tunneled chip,
    so an eval pass (outputs + masks + labels across ragged batch shapes)
    collapses from ~6-8 round trips to 1."""
    # 64-bit payloads (the fp64 SR isomorphism path) must not transit
    # f32; group-fetch those lists losslessly instead.
    if any(a is not None and not isinstance(a, np.ndarray)
           and np.dtype(str(a.dtype)).itemsize > 4
           for arrs in lists for a in arrs):
        return [_fetch_all(arrs) for arrs in lists]
    pieces, slots = [], []
    size = 0
    for li, arrs in enumerate(lists):
        for i, a in enumerate(arrs):
            if a is None or isinstance(a, np.ndarray):
                continue
            n = int(np.prod(a.shape))
            pieces.append(jnp.ravel(a).astype(jnp.float32))
            slots.append((li, i, size, n, tuple(a.shape), a.dtype))
            size += n
    out = [list(arrs) for arrs in lists]
    if pieces:
        flat = np.asarray(jnp.concatenate(pieces))
        for li, i, off, n, shape, dtype in slots:
            # f32 transit is exact for model outputs (already f32), masks,
            # and integer labels (|label| << 2^24); restore the dtype.
            out[li][i] = flat[off:off + n].reshape(shape).astype(
                np.dtype(str(dtype)))
    for li, arrs in enumerate(out):
        out[li] = [None if a is None else np.asarray(a) for a in arrs]
    return out


# ---------------------------------------------------------------------------
# Trainer.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainConfig:
    task_type: str = "classification"
    eval_metric: str = "accuracy"
    lr: float = 0.001
    lr_scheduler: Optional[str] = "StepLR"
    lr_scheduler_decay_steps: int = 50
    lr_scheduler_decay_rate: float = 0.5
    lr_scheduler_patience: int = 10
    lr_scheduler_min: float = 1e-5
    minimize: bool = False
    early_stop: bool = False
    seed: int = 43
    iso_eps: float = 0.01


class Trainer:
    """Owns model variables + optimizer + schedulers; runs epochs.

    n_devices > 1 switches the train step to the data-parallel shard_map
    path (cwn_tpu.parallel.step) over a ('data',) mesh: the loader then
    must yield stacked per-device batches (ComplexLoader(n_shards=n)).
    Eval stays single-device (parameters are replicated)."""

    def __init__(self, model, config: TrainConfig, example_batch: ComplexBatch,
                 n_devices: int = 1):
        from cwn_tpu.utils.profiling import StepTimer

        self.model = model
        self.config = config
        self.n_devices = max(1, n_devices)
        self.step_timer = StepTimer(warmup=2)
        self.rng = jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(self.rng)
        if self.n_devices > 1:
            # The example is a stacked shard batch; init on one shard.
            example_batch = jax.tree.map(lambda a: a[0], example_batch)
        variables = model.init({"params": init_rng}, example_batch, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=config.lr)
        self.opt_state = self.tx.init(self.params)
        self.scheduler = make_scheduler(
            config.lr_scheduler, config.lr,
            decay_steps=config.lr_scheduler_decay_steps,
            decay_rate=config.lr_scheduler_decay_rate,
            patience=config.lr_scheduler_patience,
            min_lr=config.lr_scheduler_min, minimize=config.minimize)
        self.evaluator = Evaluator(config.eval_metric, eps=config.iso_eps)
        self.loss_fn = LOSSES[config.task_type] \
            if config.task_type != "isomorphism" else None
        # Steps per dispatch on the scanned epoch paths.  8 amortizes the
        # per-dispatch tunnel round trip (~1.2 ms/step, measured in
        # tools/probe_dispatch_floor.py) to noise while keeping compiles
        # and the remainder-program count small.
        self.unroll = max(1, int(os.environ.get("CWN_STEP_UNROLL", "8")))
        self._banked_jits = {}
        self._build_steps()

    # -- jitted functions -------------------------------------------------
    def _build_steps(self):
        model, loss_fn = self.model, self.loss_fn
        self._banked_jits = {}

        if self.n_devices > 1 and loss_fn is not None:
            from cwn_tpu.parallel import make_dp_train_step, make_mesh
            devices = jax.devices()
            if len(devices) < self.n_devices:
                devices = jax.devices("cpu")
            mesh = make_mesh(self.n_devices, devices=devices)
            self._train_step = make_dp_train_step(
                model, self.tx, mesh, loss_fn, inject_lr=True)
        else:
            self._train_step = self._single_device_step()

        @jax.jit
        def eval_step(params, batch_stats, batch):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               batch, train=False)

        self._eval_step = eval_step

    def _step_core(self):
        """The un-jitted single train step (params, bs, opt, batch, rng, lr)
        -> (params, bs, opt, loss); shared by the per-batch jit and the
        epoch-scan jit."""
        model, loss_fn, tx = self.model, self.loss_fn, self.tx

        def train_step(params, batch_stats, opt_state, batch, rng, lr):
            def loss_of(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                s, w = loss_fn(out, batch.y, batch.y_mask)
                return s / jnp.maximum(w, 1.0), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        return train_step

    def _single_device_step(self):
        # Donate the carried state: XLA then aliases params/opt-state
        # buffers across steps instead of copying them (the copy costs
        # ~3x the compute on small models).
        return functools.partial(jax.jit, donate_argnums=(0, 1, 2))(
            self._step_core())

    def _build_megastep(self, make_batch, k: int):
        """A jit that runs ``k`` optimizer steps in ONE dispatch: each
        sub-step forms its batch INSIDE the jit from device-resident epoch
        data (``make_batch(data, i)``), the carried state threads through
        unrolled sub-steps, and the k losses come back stacked.

        Why unroll instead of lax.scan: on this runtime the identical
        step program runs ~3x slower inside a while loop (measured
        18.8 vs 6.5 ms/step on the ZINC step, scan unroll makes no
        difference), while a Python-unrolled body compiles to the same
        straight-line code as k sequential steps.  k > 1 then also
        amortizes the per-dispatch tunnel round trip (the residual
        ~9 ms/step gap from round 4, tools/profile_dispatch.py) over k
        steps.  Sub-step i folds the epoch rng by its GLOBAL step index,
        so any (k, remainder) split replays the identical step sequence —
        tests/test_epoch_scan.py pins bit-equality vs the per-batch loop.
        """
        step = self._step_core()

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def megastep(params, batch_stats, opt_state, data, i0, rng, lr):
            losses = []
            for j in range(k):
                i = i0 + j
                batch = make_batch(data, i)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, batch,
                    jax.random.fold_in(rng, i), lr)
                # Barrier between sub-steps: keeps XLA from fusing across
                # step boundaries, so every sub-step compiles to the SAME
                # arithmetic as a single-step dispatch (bit-exact with the
                # per-batch loop, and no fresh cross-step fusion surface on
                # TPU — see the mp.py factorized-channel miscompile).
                params, batch_stats, opt_state, loss = \
                    jax.lax.optimization_barrier(
                        (params, batch_stats, opt_state, loss))
                losses.append(loss)
            return params, batch_stats, opt_state, jnp.stack(losses)

        return megastep

    def _get_megastep(self, kind: str, plan, k: int):
        """Cache of megastep jits keyed by (epoch kind, pad plan, unroll)."""
        key = (kind, plan, k)
        fn = self._banked_jits.get(key)
        if fn is not None:
            return fn
        from cwn_tpu.train.loader import gather_uniform_batch

        if kind == "stacked":
            def make_batch(data, i):
                (batches,) = data
                return jax.tree.map(lambda a: a[i], batches)
        elif kind == "uniform":
            def make_batch(data, i):
                tpl, bank_dims, bank_y, idx_mat = data
                return gather_uniform_batch(tpl, bank_dims, bank_y,
                                            idx_mat[i])
        elif kind == "banked":
            from cwn_tpu.train.device_pack import assemble_batch

            def make_batch(data, i):
                bank, idx_mat, counts = data
                return assemble_batch(bank, plan, idx_mat[i], counts[i])
        else:
            raise ValueError(kind)
        fn = self._build_megastep(make_batch, k)
        self._banked_jits[key] = fn
        return fn

    # -- epochs -----------------------------------------------------------
    @staticmethod
    def _batch_trainable(batch: ComplexBatch) -> bool:
        """Skip batches whose smallest populated dim has <=1 cells (BN
        safety).  Exact parity with /root/reference/exp/train_utils.py:31-46,
        which takes min over per-dim cell counts (num_samples there is
        cells, not complexes); our batch carries all max_dim+1 dims as
        static-shape containers, so empty dims (= dims the reference's
        dynamic batch.dimension would exclude) are filtered first."""
        counts = [int(d.cell_mask.sum()) for d in batch.dims]
        present = [c for c in counts if c > 0]
        return bool(present) and min(present) > 1

    def train_batch(self, batch, sync: bool = True) -> float:
        """One optimizer step on one (possibly shard-stacked) batch.

        sync=False skips the scalar-loss device fetch (a full round trip
        on a tunneled chip) and returns the on-device loss."""
        self.rng, step_rng = jax.random.split(self.rng)
        if not sync:
            self.params, self.batch_stats, self.opt_state, loss = \
                self._train_step(self.params, self.batch_stats,
                                 self.opt_state, batch, step_rng,
                                 jnp.asarray(self.scheduler.lr, jnp.float32))
            return loss
        with self.step_timer:
            self.params, self.batch_stats, self.opt_state, loss = \
                self._train_step(self.params, self.batch_stats, self.opt_state,
                                 batch, step_rng,
                                 jnp.asarray(self.scheduler.lr, jnp.float32))
            loss = float(loss)
        return loss

    def train_epoch(self, loader) -> List[float]:
        spec = None
        if self.n_devices == 1 and self.loss_fn is not None:
            next_stack = getattr(loader, "next_epoch_stack", None)
            if next_stack is not None:
                spec = next_stack()
        if spec is not None:
            return self._train_epoch_scanned(spec)
        curve = []
        skips = total = 0
        for batch in loader:
            total += 1
            if not self._batch_trainable(batch):
                skips += 1
                continue
            curve.append(self.train_batch(batch))
        if total and skips / total >= 0.25:
            # Parity: reference warns when >=25% of an epoch's batches are
            # BN-skipped (/root/reference/exp/train_utils.py:47-49).
            print(f"Warning! {skips}/{total} batches were skipped this epoch")
        return curve

    def _train_epoch_scanned(self, spec) -> List[float]:
        """Run one epoch from a loader epoch spec: megastep dispatches of
        up to ``self.unroll`` steps each (batches formed inside the jit),
        one loss fetch for the whole epoch."""
        from cwn_tpu.train.loader import fused_device_put

        t0 = time.perf_counter()
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        rng = self.rng
        # Advance the host rng once per epoch (each step folds in its
        # index device-side).
        self.rng = jax.random.split(self.rng)[0]
        losses = []
        tail_loss = None
        n = spec["n"]
        kind = spec["kind"]
        plan = spec.get("plan")
        if kind == "uniform":
            data = (spec["tpl"], spec["bank_dims"], spec["bank_y"],
                    jnp.asarray(spec["idx"]))
        elif kind == "banked":
            data = (spec["bank"], jnp.asarray(spec["idx"]),
                    jnp.asarray(spec["counts"]))
        elif kind == "stacked":
            data = (fused_device_put(spec["batches"]),)
        i0 = 0
        while i0 < n:
            k = min(self.unroll, n - i0)
            fn = self._get_megastep(kind, plan, k)
            self.params, self.batch_stats, self.opt_state, loss_vec = fn(
                self.params, self.batch_stats, self.opt_state, data,
                np.int32(i0), rng, lr)
            losses.append(loss_vec)
            i0 += k
        if kind == "uniform" and spec.get("tail") is not None:
            # One packed upload: the host-resident tail batch's ~50 leaves
            # would otherwise device_put one by one at a ~30 ms round trip
            # each over the tunneled chip (measured: this WAS the FLOW
            # epoch floor — 1.9 s/epoch, ~1.5 s of it tail uploads).
            tail_loss = self.train_batch(fused_device_put(spec["tail"]),
                                         sync=False)
        curve = []
        if losses:
            curve = [float(v) for v in np.asarray(jnp.concatenate(losses))]
        if tail_loss is not None:
            curve.append(float(tail_loss))
        if spec["n"]:
            # One timer entry per epoch: the amortized per-step wall time
            # (dispatches + compute + the single loss sync).
            self.step_timer.times.append(
                (time.perf_counter() - t0) / max(1, spec["n"]))
        if spec["total"] and spec["skipped"] / spec["total"] >= 0.25:
            print(f"Warning! {spec['skipped']}/{spec['total']} batches "
                  f"were skipped this epoch")
        return curve

    def predict(self, loader) -> np.ndarray:
        # Dispatch every eval batch before fetching anything, then fetch
        # with one device->host transfer per distinct shape (each small
        # transfer pays a full round trip over a tunneled chip).
        outs, masks, ys = [], [], []
        for batch in loader:
            outs.append(self._eval_step(self.params, self.batch_stats, batch))
            masks.append(batch.y_mask)
            ys.append(batch.y)
        outs, masks, ys = _fetch_lists(outs, masks, ys)
        preds, trues = [], []
        for out, mask, y in zip(outs, masks, ys):
            n = int(mask.sum())
            preds.append(out[:n])
            if y is not None:
                trues.append(y[:n])
        y_pred = np.concatenate(preds, axis=0)
        y_true = np.concatenate(trues, axis=0) if trues else None
        return y_pred, y_true

    def evaluate(self, loader) -> Dict[str, float]:
        y_pred, y_true = self.predict(loader)
        metric = self.evaluator.eval({"y_pred": y_pred, "y_true": y_true})
        loss = np.nan
        if self.loss_fn is not None and y_true is not None:
            # Host-side loss: y_pred/y_true are numpy already; running the
            # jnp loss on the default (tunneled) device would cost two more
            # ~30 ms round trips per eval.
            with jax.default_device(jax.devices("cpu")[0]):
                s, w = self.loss_fn(jnp.asarray(y_pred), jnp.asarray(y_true),
                                    jnp.ones(len(y_pred), jnp.float32))
                loss = float(s) / max(float(w), 1.0)
        return {"metric": metric, "loss": loss}

    def count_params(self) -> int:
        """Total trainable parameter count
        (parity: /root/reference/exp/run_exp.py:330-340)."""
        sizes = jax.tree.map(lambda a: int(np.prod(a.shape)), self.params)
        return int(sum(jax.tree.leaves(sizes)))

    def param_table(self) -> str:
        """Per-parameter table (name, shape, count) + total
        (parity: /root/reference/exp/run_exp.py:330-340)."""
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        lines = ["===== Model parameters ====="]
        total = 0
        for path, leaf in flat:
            name = jax.tree_util.keystr(path).replace("'", "").strip("[]") \
                .replace("][", "/")
            n = int(np.prod(leaf.shape))
            total += n
            lines.append(f"{name:64s} {str(leaf.shape):18s} {n:>10d}")
        lines.append(f"{'TOTAL':64s} {'':18s} {total:>10d}")
        return "\n".join(lines)

    @property
    def lr(self) -> float:
        return self.scheduler.lr

    def should_early_stop(self) -> bool:
        return (self.config.early_stop
                and isinstance(self.scheduler, ReduceLROnPlateau)
                and self.scheduler.lr <= self.scheduler.min_lr)
