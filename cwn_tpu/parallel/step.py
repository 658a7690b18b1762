"""Data-parallel training step over a ('data',) mesh.

Each device holds one ComplexBatch shard (packed with a shared PadPlan so
shapes agree), parameters are replicated, and gradients are psum-averaged
over the mesh via shard_map — the XLA-collective equivalent of DDP, built
the JAX way rather than translating a NCCL allreduce.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from cwn_tpu.batch import ComplexBatch


def stack_shards(batches) -> ComplexBatch:
    """Stack per-device ComplexBatches (identical plans) on a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def make_dp_train_step(model, tx, mesh: Mesh, loss_fn: Callable,
                       axis: str = "data", donate: bool = True,
                       sync_bn: bool = True, inject_lr: bool = False):
    """Build a jitted data-parallel train step.

    loss_fn(outputs, y, y_mask) -> (loss_sum, weight_sum); sums are psum'd
    over the mesh then normalised, so the global loss is batch-size exact.
    sync_bn=True makes batch-norm statistics cross-replica (exactly the
    single-device semantics on the global batch).

    Returns step(params, batch_stats, opt_state, stacked_batch, rng)
      -> (params, batch_stats, opt_state, loss).
    With inject_lr=True the step takes a trailing `lr` argument and `tx`
    must be an optax.inject_hyperparams optimizer (the Trainer's scheduler
    path).
    """
    from cwn_tpu.nn import sync_bn_axis

    def sharded_body(params, batch_stats, batch, rng):
        # shard_map hands each device a leading axis of size 1: strip it.
        batch_local = jax.tree.map(lambda x: x[0], batch)

        def loss_of(p):
            with sync_bn_axis(axis if sync_bn else None):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch_local,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
            loss_sum, weight = loss_fn(out, batch_local.y, batch_local.y_mask)
            total_weight = jax.lax.psum(weight, axis)
            loss = jax.lax.psum(loss_sum, axis) / jnp.maximum(total_weight, 1.0)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        # With sync_bn the replicas' stats are identical; pmean is a no-op
        # then, and keeps replicas consistent in the per-replica mode.
        new_bs = jax.lax.pmean(new_bs, axis)
        return loss, grads, new_bs

    rep = P()            # replicated

    mapped = jax.shard_map(
        sharded_body, mesh=mesh,
        in_specs=(rep, rep, P(axis), rep),
        out_specs=(rep, rep, rep),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(params, batch_stats, opt_state, stacked_batch, rng):
        loss, grads, new_bs = mapped(params, batch_stats, stacked_batch, rng)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step_lr(params, batch_stats, opt_state, stacked_batch, rng, lr):
        loss, grads, new_bs = mapped(params, batch_stats, stacked_batch, rng)
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    return step_lr if inject_lr else step
