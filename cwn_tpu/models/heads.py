"""Shared readout head for CIN-family models.

The per-dim pool -> lin1 -> act -> stack -> final_readout -> dropout -> lin2
tail that SparseCIN, CINpp and all Embed variants share
(/root/reference/mp/models.py:222-254, mp/molec_models.py:129-161).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.nn import Linear, get_nonlinearity, pool_cells


class CINReadoutHead(nn.Module):
    num_classes: int
    hidden: int
    readout_dims: Tuple[int, ...]
    readout: str = "sum"
    final_readout: str = "sum"
    final_hidden_multiplier: int = 2
    nonlinearity: str = "relu"
    dropout_rate: float = 0.5
    apply_dropout_before: str = "lin2"
    lin1_bias: bool = True

    @nn.compact
    def __call__(self, xs, data: ComplexBatch, train: bool = False,
                 include_partial: bool = False, res=None):
        act = get_nonlinearity(self.nonlinearity)
        from cwn_tpu.nn import pool_cells_all
        pooled = pool_cells_all(xs, data, self.readout)
        if pooled is None:
            pooled = [
                pool_cells(xs[k], data.dims[k].batch, data.dims[k].cell_mask,
                           data.batch_size, self.readout,
                           plan=data.dims[k].pool_plan,
                           plan_t=data.dims[k].pool_plan_t)
                for k in range(len(xs))
            ]
        # Readout dims beyond the batch's dims pool to zeros (the
        # reference's pool_complex zero-fills missing dims,
        # /root/reference/mp/nn.py:50-60).
        sel = [pooled[i] if i < len(pooled) else jnp.zeros_like(pooled[0])
               for i in self.readout_dims]
        if include_partial and res is not None:
            for k in range(len(sel)):
                res[f"pool_{k}"] = sel[k]

        dropout = nn.Dropout(rate=self.dropout_rate)
        new_xs = []
        for i, x in enumerate(sel):
            if self.apply_dropout_before == "lin1":
                x = dropout(x, deterministic=not train)
            lin1 = Linear(self.final_hidden_multiplier * self.hidden,
                          use_bias=self.lin1_bias,
                          name=f"lin1_{self.readout_dims[i]}")
            new_xs.append(act(lin1(x)))

        x = jnp.stack(new_xs, axis=0)
        if self.apply_dropout_before == "final_readout":
            x = dropout(x, deterministic=not train)
        if self.final_readout == "mean":
            x = jnp.mean(x, axis=0)
        elif self.final_readout == "sum":
            x = jnp.sum(x, axis=0)
        else:
            raise NotImplementedError
        if self.apply_dropout_before not in ("lin1", "final_readout"):
            x = dropout(x, deterministic=not train)

        return Linear(self.num_classes, name="lin2")(x)
