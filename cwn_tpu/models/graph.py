"""Plain-graph GIN baselines operating on the 0-skeleton.

Parity targets: GIN0 / GIN0WithJK / GIN / GINWithJK
(/root/reference/mp/graph_models.py:33-266).  The reference runs these on
plain PyG graphs; here the graph lives in dims[0] of a packed batch (the
vertex upper adjacency IS the edge set), so one batching path serves both
complexes and graphs.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.nn import Linear, UpdateMLP, get_nonlinearity, pool_cells
from cwn_tpu.mp import propagate


class GIN(nn.Module):
    num_features: int
    num_layers: int
    hidden: int
    num_classes: int
    readout: str = "sum"
    dropout_rate: float = 0.5
    nonlinearity: str = "relu"
    train_eps: bool = False
    jump_mode: Optional[str] = None   # 'cat' -> WithJK variants

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        buf = data.dims[0]
        x = buf.x
        jump_xs = []
        for c in range(self.num_layers):
            if self.train_eps:
                eps = self.param(f"eps_{c}", nn.initializers.zeros, (1,))
            else:
                eps = 0.0
            agg, _, _ = propagate(buf, x, message_up=lambda xj, a: xj,
                                  up_identity=True)
            h = agg + (1.0 + eps) * x
            x = UpdateMLP(self.hidden, self.nonlinearity, "bn",
                          name=f"conv{c}")(h, mask=buf.cell_mask, train=train)
            jump_xs.append(x)

        if self.jump_mode == "cat":
            x = jnp.concatenate(jump_xs, axis=-1)
        elif self.jump_mode == "max":
            x = jnp.max(jnp.stack(jump_xs, 0), axis=0)

        x = pool_cells(x, buf.batch, buf.cell_mask, data.batch_size,
                       self.readout)
        x = act(Linear(self.hidden, name="lin1")(x))
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        return Linear(self.num_classes, name="lin2")(x)


def GIN0(**kw):
    return GIN(train_eps=False, **kw)


def GIN0WithJK(**kw):
    return GIN(train_eps=False, jump_mode="cat", **kw)


def GINWithJK(**kw):
    return GIN(train_eps=True, jump_mode="cat", **kw)
