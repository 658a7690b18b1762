"""Dense-CIN legacy models and no-message-passing baselines.

Parity targets:
  CIN0                   /root/reference/mp/models.py:12-109
  EdgeCIN0               /root/reference/mp/models.py:286-419
  Dummy                  /root/reference/mp/models.py:422-473
  MessagePassingAgnostic /root/reference/mp/models.py:618-661
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.mp import gather_down_attr, gather_up_attr, propagate
from cwn_tpu.nn import (
    GraphNorm, Linear, get_nonlinearity, pool_cells)


class _DenseMsgNet(nn.Module):
    """Linear(2d -> d) -> act -> BN over edge messages (masked)."""

    out_dim: int
    act: str

    @nn.compact
    def __call__(self, m, mask, train: bool):
        m = Linear(self.out_dim, name="lin")(m)
        m = get_nonlinearity(self.act)(m)
        return GraphNorm("bn", name="bn")(m, mask=mask, train=train)


class _DenseUpdateNet(nn.Module):
    """Linear -> act -> Linear -> act -> BN (reference CIN0 conv_update)."""

    hidden: int
    act: str

    @nn.compact
    def __call__(self, x, mask, train: bool):
        a = get_nonlinearity(self.act)
        x = a(Linear(self.hidden, name="lin1")(x))
        x = a(Linear(self.hidden, name="lin2")(x))
        return GraphNorm("bn", name="bn")(x, mask=mask, train=train)


class CIN0Layer(nn.Module):
    """One dense CIN conv; message/update nets are SHARED across dims
    (the reference passes the same modules to every per-dim conv,
    mp/models.py:48-50)."""

    hidden: int
    act: str = "relu"
    max_dim: int = 2
    eps: float = 0.0

    @nn.compact
    def __call__(self, data: ComplexBatch, xs, train: bool = False):
        msg_up = _DenseMsgNet(xs[0].shape[-1], self.act, name="msg_up")
        msg_down = _DenseMsgNet(xs[0].shape[-1], self.act, name="msg_down")
        update = _DenseUpdateNet(self.hidden, self.act, name="update")

        out = []
        for k in range(self.max_dim + 1):
            buf = data.dims[k]
            x = xs[k]
            x_up = xs[k + 1] if k < self.max_dim else None
            x_down = xs[k - 1] if k > 0 else None
            up_attr = gather_up_attr(buf, x_up) if x_up is not None else None
            down_attr = (gather_down_attr(buf, x_down)
                         if x_down is not None else None)

            def message_up(xj, attr):
                m = jnp.concatenate([xj, attr], -1) if attr is not None else \
                    jnp.concatenate([xj, jnp.zeros_like(xj)], -1)
                return msg_up(m, buf.up_mask, train)

            def message_down(xj, attr):
                m = jnp.concatenate([xj, attr], -1) if attr is not None else \
                    jnp.concatenate([xj, jnp.zeros_like(xj)], -1)
                return msg_down(m, buf.down_mask, train)

            up_out, down_out, _ = propagate(
                buf, x, up_attr=up_attr, down_attr=down_attr,
                message_up=message_up, message_down=message_down)
            up_out = up_out + (1.0 + self.eps) * x
            down_out = down_out + (1.0 + self.eps) * x
            out.append(update(up_out + down_out, buf.cell_mask, train))
        return out


class CIN0(nn.Module):
    """The original dense CIN model (up + down messages)."""

    num_input_features: int
    num_classes: int
    num_layers: int
    hidden: int
    dropout_rate: float = 0.5
    max_dim: int = 2
    jump_mode: Optional[str] = None
    nonlinearity: str = "relu"
    readout: str = "sum"

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        xs = []
        for buf in data.dims:
            xs.append(buf.x if buf.x is not None else jnp.zeros(
                (buf.cell_mask.shape[0], self.num_input_features), jnp.float32))

        jump_xs = [[] for _ in xs] if self.jump_mode is not None else None
        for c in range(self.num_layers):
            xs = CIN0Layer(hidden=self.hidden, act=self.nonlinearity,
                           max_dim=self.max_dim, name=f"conv{c}")(
                               data, xs, train=train)
            if jump_xs is not None:
                for i, x in enumerate(xs):
                    jump_xs[i].append(x)
        if self.jump_mode == "cat":
            xs = [jnp.concatenate(js, -1) for js in jump_xs]
        elif self.jump_mode == "max":
            xs = [jnp.max(jnp.stack(js, 0), 0) for js in jump_xs]

        pooled = jnp.stack([
            pool_cells(xs[k], data.dims[k].batch, data.dims[k].cell_mask,
                       data.batch_size, self.readout)
            for k in range(self.max_dim + 1)], axis=0)
        x = pooled.sum(axis=0)
        x = act(Linear(self.hidden, name="lin1")(x))
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        return Linear(self.num_classes, name="lin2")(x)


class EdgeCIN0(CIN0):
    """Dense CIN restricted to vertices+edges.

    Under batching the reference drops 2-cells at max_dim=1, so the optional
    top-feature update path is inert (/root/reference/data/complex.py:690-728);
    we match the batched semantics."""

    max_dim: int = 1


class Dummy(nn.Module):
    """Parameter-free pipeline-test model: messages are plain sums of
    neighbour features + attrs; readout sum; one linear head."""

    num_input_features: int
    num_classes: int
    num_layers: int
    max_dim: int = 2
    readout: str = "sum"

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        xs = []
        for buf in data.dims:
            xs.append(buf.x if buf.x is not None else jnp.zeros(
                (buf.cell_mask.shape[0], self.num_input_features), jnp.float32))
        for _ in range(self.num_layers):
            new_xs = []
            for k in range(self.max_dim + 1):
                buf = data.dims[k]
                x_up = xs[k + 1] if k < self.max_dim else None
                x_down = xs[k - 1] if k > 0 else None
                up_attr = gather_up_attr(buf, x_up) if x_up is not None else None
                down_attr = (gather_down_attr(buf, x_down)
                             if x_down is not None else None)
                up_out, down_out, _ = propagate(
                    buf, xs[k], up_attr=up_attr, down_attr=down_attr,
                    message_up=lambda xj, a: xj + a if a is not None else xj,
                    message_down=lambda xj, a: xj + a if a is not None else xj)
                new_xs.append(xs[k] + up_out + down_out)
            xs = new_xs
        pooled = jnp.stack([
            pool_cells(xs[k], data.dims[k].batch, data.dims[k].cell_mask,
                       data.batch_size, self.readout)
            for k in range(self.max_dim + 1)], axis=0)
        x = pooled.sum(axis=0)
        return Linear(self.num_classes, name="lin")(x)


class MessagePassingAgnostic(nn.Module):
    """DeepSets-style baseline: per-dim dense layer, no message passing."""

    num_input_features: int
    num_classes: int
    hidden: int
    dropout_rate: float = 0.5
    max_dim: int = 2
    nonlinearity: str = "relu"
    readout: str = "sum"

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        pooled = []
        for k in range(self.max_dim + 1):
            buf = data.dims[k]
            x = buf.x if buf.x is not None else jnp.zeros(
                (buf.cell_mask.shape[0], self.num_input_features), jnp.float32)
            x = act(Linear(self.hidden, name=f"lin0_{k}")(x))
            pooled.append(pool_cells(x, buf.batch, buf.cell_mask,
                                     data.batch_size, self.readout))
        x = jnp.stack(pooled, 0)
        x = act(Linear(self.hidden, name="lin1")(x))
        x = x.sum(axis=0)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        return Linear(self.num_classes, name="lin2")(x)
