"""Long-range ring-experiment models with masked target-node readout.

Parity targets:
  RingSparseCIN  /root/reference/mp/ring_exp_models.py:10-74
  RingGIN        /root/reference/mp/ring_exp_models.py:76-131

The `x[mask]` target-node selection becomes a masked segment sum: exactly
one node per complex is selected, so summing selected rows per complex
extracts it with static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.models.cin import SparseCINLayer
from cwn_tpu.nn import Linear, UpdateMLP, get_nonlinearity
from cwn_tpu.mp import propagate
from cwn_tpu.ops import segment_sum


def select_masked_nodes(x, buf, batch_size):
    """Per-complex extraction of the single mask-selected node feature."""
    assert buf.sel_mask is not None, "dataset provides no node mask"
    sel = buf.sel_mask * buf.cell_mask
    out = segment_sum(x, buf.batch, batch_size + 1, mask=sel,
                      indices_are_sorted=True)
    return out[:batch_size]


class RingSparseCIN(nn.Module):
    num_input_features: int
    num_classes: int
    num_layers: int
    hidden: int
    max_dim: int = 2
    nonlinearity: str = "relu"
    train_eps: bool = False
    use_coboundaries: bool = False
    graph_norm: str = "id"

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False,
                 include_partial: bool = False):
        res = {}
        xs = []
        for buf in data.dims:
            xs.append(buf.x if buf.x is not None else jnp.zeros(
                (buf.cell_mask.shape[0], self.num_input_features), jnp.float32))
        xs[0] = Linear(self.num_input_features, name="init_layer")(xs[0])

        for c in range(self.num_layers):
            xs = SparseCINLayer(
                hidden=self.hidden, act=self.nonlinearity,
                norm=self.graph_norm, use_coboundaries=self.use_coboundaries,
                train_eps=self.train_eps, max_dim=self.max_dim,
                name=f"conv{c}")(data, xs, train=train)
            if include_partial:
                for k in range(len(xs)):
                    res[f"layer{c}_{k}"] = xs[k]

        x = select_masked_nodes(xs[0], data.dims[0], data.batch_size)
        x = Linear(self.num_classes, name="lin1")(x)
        if include_partial:
            res["out"] = x
            return x, res
        return x


class RingGIN(nn.Module):
    """GIN baseline on the 0-skeleton with masked target-node readout."""

    num_features: int
    num_layers: int
    hidden: int
    num_classes: int
    nonlinearity: str = "relu"
    graph_norm: str = "bn"

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        buf = data.dims[0]
        x = buf.x
        x = Linear(self.num_features, name="init_linear")(x)

        for c in range(self.num_layers):
            agg, _, _ = propagate(buf, x, message_up=lambda xj, a: xj,
                                  up_identity=True)
            h = agg + x     # GIN eps=0, not trained
            x = UpdateMLP(self.hidden, self.nonlinearity, self.graph_norm,
                          name=f"conv{c}")(h, mask=buf.cell_mask, train=train)
            if c == 0:
                x = act(x)  # reference applies act() around conv1 only

        x = select_masked_nodes(x, buf, data.batch_size)
        return Linear(self.num_classes, name="lin1")(x)
