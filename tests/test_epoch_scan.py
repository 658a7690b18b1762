"""Epoch-scan training == per-batch training.

The epoch-scan fast path (Trainer._train_epoch_scanned + lax.scan) runs a
whole epoch in one dispatch.  With dropout 0 the math is rng-independent,
the shuffled batch composition comes from the same loader rng, and BN
stats thread identically through the scan carry — so the scanned epoch
must produce the SAME parameters as the per-batch loop (up to fp
noise from program re-association).
"""
import numpy as np
import pytest

from cwn_tpu.lift import ring_2complex
from cwn_tpu.models import SparseCIN
from cwn_tpu.train import ComplexLoader, Trainer, TrainConfig
from cwn_tpu.train.loader import gather_uniform_batch
from tests.fixtures import all_test_graphs


def _complexes(reps=4):
    return [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                          y=np.array([i % 2]), max_k=7, init_rings=True)
            for i, g in enumerate(all_test_graphs() * reps)]


def _make(complexes, seed=3, batch_size=8, plan=None, graph_norm="bn"):
    loader = ComplexLoader(complexes, batch_size=batch_size, max_dim=2,
                           shuffle=True, seed=seed, pad_multiple=32,
                           device_prefetch=False, plan=plan)
    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, max_dim=2, dropout_rate=0.0,
                      graph_norm=graph_norm)
    cfg = TrainConfig(task_type="classification", eval_metric="accuracy",
                      lr=0.01, lr_scheduler=None, seed=0)
    example = next(iter(loader))
    return loader, Trainer(model, cfg, example)


def _leaves_close(a, b, atol):
    import jax
    for u, v in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(u, np.float64),
                                   np.asarray(v, np.float64), atol=atol,
                                   rtol=1e-4)


def test_epoch_scan_matches_per_batch_loop():
    """With identical pad shapes and unroll=1 the scanned epoch is
    BIT-EXACT vs the per-batch loop (same composition, same BN threading,
    same rng-free math at dropout 0).  A generous fixed plan pins the
    shapes; without it the two paths pick different pow2 buckets per
    batch, whose fp reassociation alone perturbs BN-amplified params."""
    from cwn_tpu.batch import PadPlan

    complexes = _complexes()
    plan = PadPlan(batch_size=8, num_cells=(64, 64, 32),
                   num_up=(256, 512, 64), num_down=(64, 512, 128),
                   num_boundary=(64, 256, 256))
    loader_a, trainer_a = _make(complexes, plan=plan)
    loader_b, trainer_b = _make(complexes, plan=plan)
    trainer_a.unroll = 1     # k=1 sub-programs are the per-batch programs

    # A: scanned epochs (default when the loader supports it).
    for _ in range(2):
        losses_a = trainer_a.train_epoch(loader_a)
    # B: force the per-batch path.
    loader_b.next_epoch_stack = lambda: None
    for _ in range(2):
        losses_b = trainer_b.train_epoch(loader_b)

    assert len(losses_a) == len(losses_b) > 1
    np.testing.assert_allclose(losses_a, losses_b, atol=0)
    _leaves_close(trainer_a.params, trainer_b.params, atol=1e-7)
    _leaves_close(trainer_a.batch_stats, trainer_b.batch_stats, atol=1e-7)


def test_megastep_unroll_matches_per_batch_loop():
    """The k>1 megastep (several optimizer steps fused into one dispatch)
    replays the same step sequence: same loss count/order and params equal
    to the per-batch loop up to program-level fp reassociation (~1e-6 —
    XLA may re-associate matmul accumulations inside the longer program;
    the optimization_barrier between sub-steps keeps anything structural
    from fusing across step boundaries).  graph_norm id: the tiny fixture
    batches' near-zero-variance BN channels amplify those ulps chaotically
    (see test_banked_epoch_scan_trains_like_per_batch); BN threading
    itself is pinned bit-exactly by the unroll=1 test above."""
    from cwn_tpu.batch import PadPlan

    complexes = _complexes()
    plan = PadPlan(batch_size=8, num_cells=(64, 64, 32),
                   num_up=(256, 512, 64), num_down=(64, 512, 128),
                   num_boundary=(64, 256, 256))
    loader_a, trainer_a = _make(complexes, plan=plan, graph_norm="id")
    loader_b, trainer_b = _make(complexes, plan=plan, graph_norm="id")
    trainer_a.unroll = 3     # epoch of 5 batches -> megasteps of 3 + 2
    trainer_b.unroll = 1

    for _ in range(2):
        losses_a = trainer_a.train_epoch(loader_a)
    for _ in range(2):
        losses_b = trainer_b.train_epoch(loader_b)

    assert len(losses_a) == len(losses_b) > 1
    np.testing.assert_allclose(losses_a, losses_b, atol=1e-4)
    _leaves_close(trainer_a.params, trainer_b.params, atol=1e-4)
    _leaves_close(trainer_a.batch_stats, trainer_b.batch_stats, atol=1e-4)


def test_epoch_scan_spec_shapes():
    complexes = _complexes()
    loader, _ = _make(complexes)
    spec = loader.next_epoch_stack()
    assert spec is not None and spec["kind"] == "stacked"
    n = spec["n"]
    assert n == (len(complexes) + 7) // 8 - spec["skipped"]
    import jax
    for leaf in jax.tree.leaves(spec["batches"]):
        assert leaf.shape[0] == n
    # Later epochs reuse the shared plan, growing it monotonically when a
    # shuffle produces a bigger batch (recompiles at most a few times).
    plan1 = loader._epoch_plan
    spec2 = loader.next_epoch_stack()
    assert loader._epoch_plan.covers(plan1)
    for a, b in zip(jax.tree.leaves(spec["batches"]),
                    jax.tree.leaves(spec2["batches"])):
        assert all(y >= x for x, y in zip(a.shape[1:], b.shape[1:]))


def test_uniform_epoch_scan_matches_per_batch_loop():
    from cwn_tpu.data.datasets.flow import load_flow_dataset

    train, _ = load_flow_dataset(num_points=150, num_train=20, num_test=2,
                                 train_orientation="default",
                                 test_orientation="default", seed=11)
    from cwn_tpu.models.orient import EdgeOrient

    def make(seed):
        loader = ComplexLoader(train, batch_size=6, max_dim=1, shuffle=True,
                               seed=seed, pad_multiple=16,
                               keep_top_upper=True, device_prefetch=True)
        model = EdgeOrient(num_input_features=train[0].cochains[1].x.shape[1],
                           num_classes=2, num_layers=2, hidden=8,
                           dropout_rate=0.0, nonlinearity="tanh",
                           readout="sum", fully_invar=False)
        cfg = TrainConfig(task_type="classification", eval_metric="accuracy",
                          lr=0.01, lr_scheduler=None, seed=0)
        example = next(iter(loader))
        # Fresh loader: the example-iteration above consumed one epoch of
        # the rng; rebuild so both paths see the same shuffle sequence.
        loader = ComplexLoader(train, batch_size=6, max_dim=1, shuffle=True,
                               seed=seed, pad_multiple=16,
                               keep_top_upper=True, device_prefetch=True)
        return loader, Trainer(model, cfg, example)

    loader_a, trainer_a = make(5)
    loader_b, trainer_b = make(5)

    spec = loader_a.next_epoch_stack()
    assert spec is not None and spec["kind"] == "uniform"
    assert spec["tail"] is not None          # 20 = 3*6 + 2
    # replay the same spec through the scanned path
    losses_a = trainer_a._train_epoch_scanned(spec)

    loader_b.next_epoch_stack = lambda: None
    losses_b = trainer_b.train_epoch(loader_b)

    assert len(losses_a) == len(losses_b) == 4
    np.testing.assert_allclose(losses_a, losses_b, atol=1e-4)
    _leaves_close(trainer_a.params, trainer_b.params, atol=1e-4)


def _assert_batch_equal(got, ref):
    import jax
    gl = jax.tree_util.tree_leaves(got)
    rl = jax.tree_util.tree_leaves(ref)
    assert len(gl) == len(rl)
    for u, v in zip(gl, rl):
        np.testing.assert_array_equal(np.asarray(u, np.float64),
                                      np.asarray(v, np.float64))


def test_banked_assembly_matches_pack_complexes():
    """Device-assembled batches are bit-identical to host pack_complexes
    (same plan): offsets, stable dst-sort order, trash conventions."""
    from cwn_tpu.batch import PadPlan, pack_complexes
    from cwn_tpu.train.device_pack import assemble_batch, build_bank
    import jax.numpy as jnp

    complexes = _complexes(reps=2)
    bank = build_bank(complexes, max_dim=2)
    plan = PadPlan(batch_size=6, num_cells=(64, 64, 32),
                   num_up=(256, 512, 64), num_down=(64, 512, 128),
                   num_boundary=(64, 256, 256))
    rng = np.random.default_rng(0)
    for trial in range(4):
        count = [6, 6, 3, 1][trial]          # incl. short tail batches
        chunk = rng.choice(len(complexes), size=count, replace=False)
        ref = pack_complexes([complexes[i] for i in chunk], max_dim=2,
                             plan=plan)
        idx = np.zeros(6, np.int32)
        idx[:count] = chunk
        got = assemble_batch(bank, plan, jnp.asarray(idx),
                             jnp.asarray(count, jnp.int32))
        _assert_batch_equal(got, ref)


def test_banked_assembly_matches_pack_with_orientations():
    """Orientation streams (flow, heterogeneous random test orients)
    survive banked assembly bit-exactly."""
    from cwn_tpu.batch import PadPlan, pack_complexes
    from cwn_tpu.data.datasets.flow import load_flow_dataset
    from cwn_tpu.train.device_pack import assemble_batch, build_bank
    import jax.numpy as jnp

    _, test = load_flow_dataset(num_points=150, num_train=2, num_test=8,
                                train_orientation="default",
                                test_orientation="random", seed=1234)
    bank = build_bank(test, max_dim=1, keep_top_upper=True)
    plan = ComplexLoader(test, batch_size=4, max_dim=1, pad_multiple=16,
                         keep_top_upper=True, device_prefetch=False)
    ref_batches = list(plan._iter_host())
    for start, ref in zip(range(0, 8, 4), ref_batches):
        chunk = np.arange(start, start + 4, dtype=np.int32)
        got = assemble_batch(bank, _plan_of(ref), jnp.asarray(chunk),
                             jnp.asarray(4, jnp.int32))
        _assert_batch_equal(got, ref)


def _plan_of(batch):
    from cwn_tpu.batch import PadPlan
    return PadPlan(
        batch_size=batch.batch_size,
        num_cells=tuple(d.cell_mask.shape[0] for d in batch.dims),
        num_up=tuple(d.up_mask.shape[0] for d in batch.dims),
        num_down=tuple(d.down_mask.shape[0] for d in batch.dims),
        num_boundary=tuple(d.b_mask.shape[0] for d in batch.dims))


def test_banked_epoch_scan_trains_like_per_batch():
    """End-to-end: banked epoch scan == per-batch loop (fixed plan)."""
    from cwn_tpu.batch import PadPlan

    complexes = _complexes()
    plan = PadPlan(batch_size=8, num_cells=(64, 64, 32),
                   num_up=(256, 512, 64), num_down=(64, 512, 128),
                   num_boundary=(64, 256, 256))
    # graph_norm id: these tiny fixture batches have near-zero-variance BN
    # channels whose backward amplifies program-level fp ulps (XLA fuses
    # the assembly gathers into the step, re-associating fp) into visible
    # param drift; BN correctness under banked assembly is covered by the
    # bit-exact content test above + the stacked-scan BN test.
    loader_a, trainer_a = _make(complexes, plan=plan, graph_norm="id")
    loader_b, trainer_b = _make(complexes, plan=plan, graph_norm="id")
    loader_a.device_prefetch = True      # banked path requires it

    spec = loader_a.next_epoch_stack()
    assert spec is not None and spec["kind"] == "banked"
    assert spec["plan"] == plan
    losses_a = trainer_a._train_epoch_scanned(spec)

    loader_b.next_epoch_stack = lambda: None
    losses_b = trainer_b.train_epoch(loader_b)
    assert len(losses_a) == len(losses_b) > 1
    np.testing.assert_allclose(losses_a, losses_b, atol=1e-6)
    _leaves_close(trainer_a.params, trainer_b.params, atol=1e-5)


def test_gather_uniform_batch_matches_host_pack():
    from cwn_tpu.data.datasets.flow import load_flow_dataset

    train, _ = load_flow_dataset(num_points=150, num_train=9, num_test=2,
                                 train_orientation="default",
                                 test_orientation="default", seed=13)
    kw = dict(batch_size=3, max_dim=1, pad_multiple=16, keep_top_upper=True)
    fast = ComplexLoader(train, shuffle=True, seed=7, device_prefetch=True,
                         **kw)
    slow = ComplexLoader(train, shuffle=True, seed=7, device_prefetch=False,
                         **kw)
    spec = fast.next_epoch_stack()
    assert spec["kind"] == "uniform"
    import jax
    for row, ref_batch in zip(spec["idx"], slow._iter_host()):
        got = gather_uniform_batch(spec["tpl"], spec["bank_dims"],
                                   spec["bank_y"], row)
        for u, v in zip(jax.tree.leaves(got), jax.tree.leaves(ref_batch)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)
