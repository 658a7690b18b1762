"""Orientation-equivariant simplicial models (MPSN trajectory experiments).

Parity targets:
  OrientedConv  /root/reference/mp/layers.py:430-470
  EdgeOrient    /root/reference/mp/models.py:476-546
  EdgeMPNN      /root/reference/mp/models.py:549-615

Messages are x_j * (+-1 relative orientation); updates are bias-free linear
maps (bias would break orientation equivariance); orientation invariance is
obtained with |.| before pooling (or at input when fully_invar).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.nn import Linear, get_nonlinearity, pool_cells
from cwn_tpu.ops import segment_sum


class OrientedConv(nn.Module):
    """One oriented conv on 1-cochains: act(W0 x + W1 S_up x + W2 S_down x)."""

    hidden: int
    act: str = "id"
    orient: bool = True
    use_up: bool = True      # False -> EdgeMPNN (line-graph MPNN ablation)

    @nn.compact
    def __call__(self, buf, x):
        act = get_nonlinearity(self.act)
        n = x.shape[0]

        # Tile plans fold orientation weights in.  orient=True matches the
        # plans directly; the fully-invariant models (orient=False with
        # orientations recorded) use the SAME plans with |weights| — the
        # orientations are +-1, so abs(mask) recovers the unsigned
        # adjacency at a trivial per-step cost.
        signed_ok = self.orient or buf.up_orient is None

        def fix(p):
            if p is None or signed_ok:
                return p
            from cwn_tpu.ops.banded import BandedPlan
            if isinstance(p, BandedPlan):
                return p.replace(a=jnp.abs(p.a))
            return p.replace(mask=jnp.abs(p.mask))

        from cwn_tpu.mp import (_identity_channel, _plan_usable,
                                _uniform_channel, _uniform_usable,
                                halo_gather_src)

        up_out = jnp.zeros((n, x.shape[-1]), x.dtype)
        if self.use_up and buf.up_src.shape[0] > 0:
            if _uniform_usable(buf.uni_up_plan, buf, x):
                up_out = _uniform_channel(
                    x, fix(buf.uni_up_plan), fix(buf.uni_up_plan_t),
                    buf.uni_cells, buf.uni_cells, buf.uni_count, n)
            elif _plan_usable(buf.up_plan, x):
                src = x if buf.ep_axis is None else \
                    halo_gather_src(buf, x, buf.up_send)
                up_out = _identity_channel(src, fix(buf.up_plan),
                                           fix(buf.up_plan_t), n)
            else:
                m = jnp.take(x, buf.up_src, axis=0, mode="clip")
                if self.orient and buf.up_orient is not None:
                    m = m * buf.up_orient[:, None]
                up_out = segment_sum(m, buf.up_dst, n, mask=buf.up_mask,
                                     indices_are_sorted=True)

        down_out = jnp.zeros((n, x.shape[-1]), x.dtype)
        if buf.down_src.shape[0] > 0:
            if _uniform_usable(buf.uni_down_plan, buf, x):
                down_out = _uniform_channel(
                    x, fix(buf.uni_down_plan), fix(buf.uni_down_plan_t),
                    buf.uni_cells, buf.uni_cells, buf.uni_count, n)
            elif _plan_usable(buf.down_plan, x):
                src = x if buf.ep_axis is None else \
                    halo_gather_src(buf, x, buf.down_send)
                down_out = _identity_channel(src, fix(buf.down_plan),
                                             fix(buf.down_plan_t), n)
            else:
                m = jnp.take(x, buf.down_src, axis=0, mode="clip")
                if self.orient and buf.down_orient is not None:
                    m = m * buf.down_orient[:, None]
                down_out = segment_sum(m, buf.down_dst, n, mask=buf.down_mask,
                                       indices_are_sorted=True)

        out = Linear(self.hidden, use_bias=False, name="update")(x)
        if self.use_up:
            out = out + Linear(self.hidden, use_bias=False,
                               name="update_up")(up_out)
        else:
            # EdgeMPNN discards upper messages entirely
            # (/root/reference/mp/models.py:569-570: update_up = lambda x: 0).
            pass
        out = out + Linear(self.hidden, use_bias=False,
                           name="update_down")(down_out)
        return act(out)


class EdgeOrient(nn.Module):
    """Trajectory model on oriented 1-cochains."""

    num_input_features: int
    num_classes: int
    num_layers: int
    hidden: int
    dropout_rate: float = 0.0
    nonlinearity: str = "id"
    readout: str = "sum"
    fully_invar: bool = False
    use_up: bool = True      # False -> EdgeMPNN

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False,
                 include_partial: bool = False):
        buf = data.dims[1]
        x = buf.x
        if self.fully_invar:
            x = jnp.abs(x)
        for c in range(self.num_layers):
            x = OrientedConv(hidden=self.hidden, act=self.nonlinearity,
                             orient=not self.fully_invar, use_up=self.use_up,
                             name=f"conv{c}")(buf, x)
        cell_pred = x

        if not self.fully_invar:
            x = jnp.abs(x)
        x = pool_cells(x, buf.batch, buf.cell_mask, data.batch_size,
                       self.readout)

        x = jnp.maximum(Linear(self.hidden, name="lin1")(x), 0.0)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        x = Linear(self.num_classes, name="lin2")(x)
        if include_partial:
            return x, cell_pred
        return x


class EdgeMPNN(EdgeOrient):
    """Line-graph MPNN ablation: lower adjacency only, invariant by default."""

    nonlinearity: str = "relu"
    fully_invar: bool = True
    use_up: bool = False
