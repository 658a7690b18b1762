"""NN building blocks: torch-compatible inits, masked batch norm, MLPs, pooling.

The masked batch norm is the TPU-first detail that makes padded batching
exact: statistics are computed over *valid* cells only, so a padded batch
normalises identically to the reference's dense BatchNorm1d over the same
cells (/root/reference/mp/layers.py:302-325 uses torch BN inside the update
MLPs).
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.ops import segment_mean, segment_sum

# ---------------------------------------------------------------------------
# Initialisers matching torch defaults (matters for the untrained-model SR
# expressivity harness and for faithful training dynamics).
# ---------------------------------------------------------------------------


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear weight default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernels are [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class Linear(nn.Module):
    """Dense layer with torch-default initialisation."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (fan_in, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: torch_linear_bias_init(key, shape, fan_in=fan_in),
                (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class LinearParams(nn.Module):
    """Declares Linear-compatible params (same names/shapes/inits as
    `Linear`) without applying them — for fused kernels that consume the
    weights directly.  Checkpoint trees stay interchangeable with Linear."""

    features: int
    fan_in: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (self.fan_in, self.features))
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: torch_linear_bias_init(
                    key, shape, fan_in=self.fan_in),
                (self.features,))
        return kernel, bias


class Embedding(nn.Module):
    """Embedding table with torch default init N(0, 1)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids):
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# Nonlinearities (parity with /root/reference/mp/nn.py:7-27).
# ---------------------------------------------------------------------------

_ACTS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "id": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def get_nonlinearity(name: str) -> Callable:
    try:
        return _ACTS[name]
    except KeyError:
        raise NotImplementedError(f"Nonlinearity {name} is not supported") from None


# ---------------------------------------------------------------------------
# Norms.
# ---------------------------------------------------------------------------


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid cells only (torch semantics).

    Train: normalise by biased batch statistics of rows with mask==1; update
    running stats with momentum 0.1 (running var uses unbiased variance).
    Eval: normalise by running stats.  Matches torch.nn.BatchNorm1d applied
    to the unpadded rows.

    `axis_name` (set via the model's sync_bn config) makes the statistics
    cross-replica under shard_map/pmap: sums and counts are psum'd over the
    named mesh axis, so data-parallel training normalises exactly like
    single-device training on the global batch.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))

        if train:
            if mask is None:
                m = jnp.ones((x.shape[0],), x.dtype)
            else:
                m = mask.astype(x.dtype)
            n = jnp.sum(m)
            s1 = jnp.sum(x * m[:, None], axis=0)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            # Two-pass variance: E[(x-mean)^2] avoids the E[x^2]-E[x]^2
            # cancellation that amplifies cross-shard reduction-order noise
            # when var << mean^2 (post-ReLU activations routinely hit this).
            s2 = jnp.sum(jnp.square(x - mean) * m[:, None], axis=0)
            if self.axis_name is not None:
                s2 = jax.lax.psum(s2, self.axis_name)
            var = jnp.maximum(s2 / n, 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean.astype(jnp.float32))
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased.astype(jnp.float32))
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)

        inv = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
        return (x - mean) * inv * scale.astype(x.dtype) + bias.astype(x.dtype)


# Trace-time sync-BN context: the DP step sets this around model.apply so
# every MaskedBatchNorm created during that trace psums its statistics over
# the mesh axis (cross-replica BN), without plumbing a flag through every
# module. None = per-replica/single-device BN (the reference's semantics).
_BN_AXIS_NAME: list = [None]


@contextlib.contextmanager
def sync_bn_axis(axis_name: Optional[str]):
    _BN_AXIS_NAME.append(axis_name)
    try:
        yield
    finally:
        _BN_AXIS_NAME.pop()


# Edge-partitioned pooling context: cells of one complex live on several
# devices, so per-complex readout pooling must psum partial sums over the
# mesh axis.  Set by make_ep_train_step / ep_forward around model.apply.
_POOL_AXIS_NAME: list = [None]


@contextlib.contextmanager
def ep_pool_axis(axis_name: Optional[str]):
    _POOL_AXIS_NAME.append(axis_name)
    try:
        yield
    finally:
        _POOL_AXIS_NAME.pop()


class GraphNorm(nn.Module):
    """Factory-style wrapper: 'bn' (masked), 'ln', or 'id'.

    Parity with /root/reference/mp/nn.py:39-47 (get_graph_norm).
    """

    kind: str = "bn"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.kind == "bn":
            return MaskedBatchNorm(name="bn", axis_name=_BN_AXIS_NAME[-1])(
                x, mask=mask, train=train)
        if self.kind == "ln":
            return nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        if self.kind == "id":
            return x
        raise ValueError(f"Graph norm {self.kind} not supported")


# ---------------------------------------------------------------------------
# The two-layer update MLP used across CIN layers:
#   Linear -> norm -> act -> Linear -> norm -> act
# (/root/reference/mp/layers.py:301-321)
# ---------------------------------------------------------------------------


class UpdateMLP(nn.Module):
    hidden: int
    act: str = "relu"
    norm: str = "bn"
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        act = get_nonlinearity(self.act)
        for i in range(self.num_layers):
            x = Linear(self.hidden, name=f"linear_{i}")(x)
            x = GraphNorm(self.norm, name=f"norm_{i}")(x, mask=mask, train=train)
            x = act(x)
        return x


# ---------------------------------------------------------------------------
# Pooling: per-dim masked segment pooling into [batch_size, F].
# ---------------------------------------------------------------------------


def pool_cells_all(xs, data, readout: str = "sum"):
    """Launch-consolidated readout: every dim's masked segment-sum pooling
    as ONE Pallas kernel over the concatenated cell arenas.

    Returns the per-dim pooled list [batch_size, F], or None when the
    batch carries no combined pooling plan (heterogeneous shards, uniform
    datasets, EP mode) or a gate fails — callers fall back to per-dim
    pool_cells.  Mask weights are baked into the plan, exactly as in the
    per-dim plans."""
    plan = getattr(data, "pool_all_plan", None)
    so = getattr(data, "pool_all_src_off", None)
    if (plan is None or readout != "sum" or _POOL_AXIS_NAME[-1] is not None
            or so is None or len(xs) != len(so) - 1):
        return None
    from cwn_tpu.mp import _plan_usable
    if not all(_plan_usable(plan, x) for x in xs):
        return None
    parts = []
    for k, x in enumerate(xs):
        span = so[k + 1] - so[k]
        if x.shape[0] < span:
            x = jnp.pad(x, ((0, span - x.shape[0]), (0, 0)))
        parts.append(x[:span])
    from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
    out = segment_spmm_ad(jnp.concatenate(parts, axis=0), plan,
                          data.pool_all_plan_t)
    do = data.pool_all_dst_off
    return [out[do[k]:do[k] + data.batch_size] for k in range(len(xs))]


def pool_cells(x: jnp.ndarray, batch: jnp.ndarray, cell_mask: jnp.ndarray,
               batch_size: int, readout: str = "sum",
               plan=None, plan_t=None) -> jnp.ndarray:
    """Pool cell features per complex; padded cells land in a trash segment.

    Parity with global_add_pool/global_mean_pool with explicit size
    (/root/reference/mp/nn.py:50-60).  When the batch carries a pooling
    tile plan (and dtype is f32), the segment sum runs as a Pallas one-hot
    SpMM instead of an XLA scatter."""
    ep_axis = _POOL_AXIS_NAME[-1]
    from cwn_tpu.mp import _plan_usable
    if _plan_usable(plan, x) and ep_axis is None:
        from cwn_tpu.ops.banded import spmm_ad as segment_spmm_ad
        out = segment_spmm_ad(x, plan, plan_t)[:batch_size]
        if readout == "mean":
            counts = segment_sum(cell_mask[:, None], batch, batch_size + 1,
                                 indices_are_sorted=True)[:batch_size]
            out = out / jnp.maximum(counts, 1.0)
        elif readout != "sum":
            raise NotImplementedError(f"Readout {readout} is not supported")
        return out
    if readout == "sum":
        out = segment_sum(x, batch, batch_size + 1, mask=cell_mask,
                          indices_are_sorted=True)
        if ep_axis is not None:
            out = jax.lax.psum(out, ep_axis)
    elif readout == "mean":
        out = segment_sum(x, batch, batch_size + 1, mask=cell_mask,
                          indices_are_sorted=True)
        counts = segment_sum(cell_mask[:, None], batch, batch_size + 1,
                             indices_are_sorted=True)
        if ep_axis is not None:
            out = jax.lax.psum(out, ep_axis)
            counts = jax.lax.psum(counts, ep_axis)
        out = out / jnp.maximum(counts, 1.0)
    else:
        raise NotImplementedError(f"Readout {readout} is not supported")
    return out[:batch_size]
