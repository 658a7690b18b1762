"""Data-parallel training == single-device training, exactly.

The SURVEY's multi-chip consistency requirement: one DP step over an
N-device mesh (sync BN, psum'd grads) must produce the same loss and the
same updated parameters as a single-device step on the concatenated batch.
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


@pytest.mark.parametrize("n_dev", [2, 4])
def test_dp_step_matches_single_device(n_dev):
    complexes = [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                               y=np.array([i % 2]), max_k=7)
                 for i, g in enumerate(all_test_graphs() * 2)]
    per_dev = len(complexes) // n_dev
    complexes = complexes[: per_dev * n_dev]

    shard_plan = PadPlan.union([
        PadPlan.for_complexes(complexes[i * per_dev:(i + 1) * per_dev], 2,
                              pad_multiple=32)
        for i in range(n_dev)])
    shards = [pack_complexes(complexes[i * per_dev:(i + 1) * per_dev],
                             max_dim=2, plan=shard_plan)
              for i in range(n_dev)]
    stacked = stack_shards(shards)
    full = pack_complexes(complexes, max_dim=2, pad_multiple=32)

    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=8, max_dim=2, dropout_rate=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)}, shards[0],
                           train=False)
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1)
    opt = tx.init(params)

    def loss_fn(out, y, y_mask):
        ls = optax.softmax_cross_entropy_with_integer_labels(
            out, y.astype(jnp.int32))
        return (ls * y_mask).sum(), y_mask.sum()

    mesh = make_mesh(n_dev, devices=jax.devices("cpu")[:n_dev])
    step = make_dp_train_step(model, tx, mesh, loss_fn, donate=False)
    rng = jax.random.PRNGKey(1)
    p_dp, bs_dp, _, loss_dp = step(params, bs, opt, stacked, rng)

    # Single-device reference step on the full batch.
    def full_loss(p):
        out, mut = model.apply({"params": p, "batch_stats": bs}, full,
                               train=True, rngs={"dropout": rng},
                               mutable=["batch_stats"])
        s, w = loss_fn(out, full.y, full.y_mask)
        return s / jnp.maximum(w, 1.0), mut["batch_stats"]

    (loss_ref, bs_ref), grads = jax.value_and_grad(
        full_loss, has_aux=True)(params)
    updates, _ = tx.update(grads, opt, params)
    p_ref = optax.apply_updates(params, updates)

    assert np.allclose(float(loss_dp), float(loss_ref), atol=1e-5)
    # Per-shard partial sums + psum reduce in a different fp order than the
    # one full-batch sum; the BN-variance backward ((var+eps)^-3/2 on
    # near-zero-variance ReLU channels) amplifies that ordering noise by
    # several orders of magnitude, so parameter parity is fp-noise-bounded,
    # not bit-exact.
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for a, b in zip(jax.tree.leaves(bs_dp), jax.tree.leaves(bs_ref)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)
