"""Data-parallel training == single-device training.

The SURVEY's multi-chip consistency requirement: one DP step over an
N-device mesh (sync BN, psum'd grads) must produce the same loss and the
same updated parameters as a single-device step on the concatenated batch.
DP semantics are exact up to fp summation order, so the parity step runs
in f64 where the ordering-noise floor is ~1e-12 and the assertion is
sharp; a separate f32 test covers the Pallas-kernel DP path against the
XLA oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cwn_tpu.batch import PadPlan, pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.models import SparseCIN
from cwn_tpu.nn import sync_bn_axis
from cwn_tpu.parallel import make_dp_train_step, make_mesh, stack_shards
from tests.fixtures import all_test_graphs


def _complexes(n_dev):
    # init_rings gives 2-cells nonzero features: with all-zero features a
    # BN input is constant per channel, its variance is EXACTLY zero, and
    # the backward's 0 * rsqrt'(eps) products turn summation-order ulps
    # into program-shape-dependent (though ~1e-4-bounded) garbage grads —
    # exactly 0 in real arithmetic, but not comparable across programs.
    complexes = [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                               y=np.array([i % 2]), max_k=7, init_rings=True)
                 for i, g in enumerate(all_test_graphs() * 2)]
    per_dev = len(complexes) // n_dev
    return complexes[: per_dev * n_dev], per_dev


def _shards(complexes, per_dev, n_dev, pad_multiple=32, x_dtype=np.float32):
    shard_plan = PadPlan.union([
        PadPlan.for_complexes(complexes[i * per_dev:(i + 1) * per_dev], 2,
                              pad_multiple=pad_multiple)
        for i in range(n_dev)])
    return [pack_complexes(complexes[i * per_dev:(i + 1) * per_dev],
                           max_dim=2, plan=shard_plan, x_dtype=x_dtype)
            for i in range(n_dev)]


def _ce_loss(out, y, y_mask):
    ls = optax.softmax_cross_entropy_with_integer_labels(
        out, y.astype(jnp.int32))
    return (ls * y_mask).sum(), y_mask.sum()


@pytest.mark.parametrize("n_dev", [2, 4])
def test_dp_step_matches_single_device(n_dev):
    """f64: DP step == single-device step to ~summation-order exactness."""
    jax.config.update("jax_enable_x64", True)
    try:
        complexes, per_dev = _complexes(n_dev)
        shards = _shards(complexes, per_dev, n_dev, x_dtype=np.float64)
        stacked = stack_shards(shards)
        full = pack_complexes(complexes, max_dim=2, pad_multiple=32,
                              x_dtype=np.float64)

        model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                          hidden=8, max_dim=2, dropout_rate=0.0)
        variables = jax.tree.map(
            lambda a: a.astype(np.float64)
            if hasattr(a, "dtype") and a.dtype == np.float32 else a,
            model.init({"params": jax.random.PRNGKey(0)}, shards[0],
                       train=False))
        params, bs = variables["params"], variables["batch_stats"]
        tx = optax.sgd(0.1)
        opt = tx.init(params)

        mesh = make_mesh(n_dev, devices=jax.devices("cpu")[:n_dev])
        step = make_dp_train_step(model, tx, mesh, _ce_loss, donate=False)
        rng = jax.random.PRNGKey(1)
        p_dp, bs_dp, _, loss_dp = step(params, bs, opt, stacked, rng)

        # Single-device reference step on the full batch.
        def full_loss(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, full,
                                   train=True, rngs={"dropout": rng},
                                   mutable=["batch_stats"])
            s, w = _ce_loss(out, full.y, full.y_mask)
            return s / jnp.maximum(w, 1.0), mut["batch_stats"]

        (loss_ref, bs_ref), grads = jax.value_and_grad(
            full_loss, has_aux=True)(params)
        updates, _ = tx.update(grads, opt, params)
        p_ref = optax.apply_updates(params, updates)

        assert np.allclose(float(loss_dp), float(loss_ref), atol=1e-12)
        # Per-shard partial sums + psum reduce in a different fp order than
        # the one full-batch sum; in f64 that noise (even after the BN
        # variance backward's amplification) stays below 1e-9.
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-9)
        for a, b in zip(jax.tree.leaves(bs_dp), jax.tree.leaves(bs_ref)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dp_pallas_step_matches_xla_oracle():
    """The Pallas fast path composes with DP: one DP step on plan-carrying
    shards (interpret-mode kernels, exact precision) == the same DP step on
    the identical shards without plans (XLA gather/segsum path)."""
    from cwn_tpu.batch import add_tile_plans_sharded
    from cwn_tpu.ops import pallas_segment

    n_dev = 2
    complexes, per_dev = _complexes(n_dev)
    shards = _shards(complexes, per_dev, n_dev, pad_multiple=32)
    planned = add_tile_plans_sharded(shards, tile=128, window=128, block=128,
                                     precision="exact", feat_hint=32)
    # Harmonisation must make per-shard plan shapes identical.
    for f in ("up_plan", "b_plan", "pool_plan"):
        for k in range(3):
            plans = [getattr(s.dims[k], f) for s in planned]
            if plans[0] is not None:
                assert all(p.num_tiles == plans[0].num_tiles for p in plans)

    stacked_plain = stack_shards(shards)
    stacked_plans = stack_shards(planned)

    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=32, max_dim=2, dropout_rate=0.0,
                      use_coboundaries=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, shards[0],
                           train=False)
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1)
    opt = tx.init(params)
    mesh = make_mesh(n_dev, devices=jax.devices("cpu")[:n_dev])
    step = make_dp_train_step(model, tx, mesh, _ce_loss, donate=False)
    rng = jax.random.PRNGKey(1)

    pallas_segment.set_interpret(True)
    try:
        p_k, bs_k, _, loss_k = step(params, bs, opt, stacked_plans, rng)
    finally:
        pallas_segment.set_interpret(False)
    p_x, bs_x, _, loss_x = step(params, bs, opt, stacked_plain, rng)

    assert np.allclose(float(loss_k), float(loss_x), atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_x)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree.leaves(bs_k), jax.tree.leaves(bs_x)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)
