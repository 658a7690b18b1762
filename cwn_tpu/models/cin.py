"""SparseCIN / CIN++ — the headline CW-network models.

Functional flax re-designs of /root/reference/mp/layers.py:154-427 and
/root/reference/mp/models.py:112-284.  Per conv layer, every cochain
dimension is updated simultaneously from the pre-layer features:

  out_up  = segsum_up( msg_up(x_j, coboundary_attr) ) + (1+eps1) x
  out_bnd = segsum_b( x_{k-1}[b_src] )               + (1+eps2) x
  y_k     = combine(cat(update_up(out_up), update_bnd(out_bnd)))

CIN++ adds the lower-adjacency channel with its own eps/update nets and a
3-way combine.  All aggregations are masked destination-sorted segment sums
over the padded static buffers.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.mp import (
    factorized_kernel_usable,
    factorized_up_channel,
    factorized_up_channel_kernel,
    factorized_up_usable,
    fused_channel_usable,
    fused_mlp_channel,
    gather_down_attr,
    gather_up_attr,
    propagate,
)
from cwn_tpu.nn import (
    GraphNorm,
    Linear,
    LinearParams,
    UpdateMLP,
    get_nonlinearity,
    pool_cells,
)


class SparseCINCochainConv(nn.Module):
    """One dimension's conv: boundary + upper-adjacency channels.

    Parity: /root/reference/mp/layers.py:154-214 (SparseCINCochainConv).
    """

    dim: int
    hidden: int
    act: str = "relu"
    norm: str = "bn"
    use_coboundaries: bool = False
    train_eps: bool = False
    init_eps: float = 0.0

    @nn.compact
    def __call__(self, buf, x, x_up, boundary_attr, train: bool = False,
                 cob_buf=None, bnd_out=None):
        act = get_nonlinearity(self.act)
        layer_dim = x.shape[-1]

        if self.train_eps:
            eps1 = self.param("eps1", nn.initializers.constant(self.init_eps), (1,))
            eps2 = self.param("eps2", nn.initializers.constant(self.init_eps), (1,))
        else:
            eps1 = eps2 = self.init_eps

        fused_up = None
        if self.use_coboundaries:
            kernel, bias = LinearParams(layer_dim, 2 * layer_dim,
                                        name="msg_up")()
            if (buf.up_src.shape[0] > 0
                    and factorized_kernel_usable(buf, cob_buf, x, x_up)):
                # O(memberships) exact rewrite of the pairwise channel,
                # reductions on the MXU kernels — fewer tiles, same math.
                fused_up = factorized_up_channel_kernel(
                    x, x_up, kernel, bias, buf, cob_buf, act, x.shape[0])
                up_attr = None
                message_up = None
            elif (buf.up_src.shape[0] > 0
                    and factorized_up_usable(buf, cob_buf, x, x_up)):
                # O(memberships) exact rewrite of the pairwise channel —
                # the dominant ring tiles never materialise.
                fused_up = factorized_up_channel(
                    x, x_up, kernel, bias, buf, cob_buf, act, x.shape[0])
                up_attr = None
                message_up = None
            elif (buf.up_src.shape[0] > 0 and fused_channel_usable(
                    buf.up_plan, buf.up_plan_bs, buf.up_plan_bc, x, x_up,
                    self.act)):
                # Hot path: per-edge cat+Linear+act+segsum as one Pallas
                # kernel per direction; no [E, F] tensor in HBM.
                fused_up = fused_mlp_channel(
                    x, x_up, kernel, bias, buf.up_plan, buf.up_plan_bs,
                    buf.up_plan_bc, self.act, x.shape[0])
                up_attr = None
                message_up = None
            else:
                if x_up is not None:
                    up_attr = gather_up_attr(buf, x_up)
                else:
                    up_attr = jnp.zeros((buf.up_src.shape[0], layer_dim),
                                        x.dtype)

                def message_up(up_x_j, attr):
                    pre = jnp.concatenate([up_x_j, attr], axis=-1) @ kernel
                    return act(pre + bias)
        else:
            up_attr = None

            def message_up(up_x_j, attr):
                return up_x_j

        out_up, _, out_bnd = propagate(
            buf, x, up_attr=up_attr,
            boundary_attr=None if bnd_out is not None else boundary_attr,
            message_up=message_up,
            message_boundary=((lambda b: b)
                              if boundary_attr is not None
                              and bnd_out is None else None),
            up_identity=not self.use_coboundaries, boundary_identity=True)
        if fused_up is not None:
            out_up = fused_up
        if bnd_out is not None:
            out_bnd = bnd_out      # consolidated cross-dim boundary kernel

        out_up = out_up + (1.0 + eps1) * x
        out_bnd = out_bnd + (1.0 + eps2) * x
        out_up = UpdateMLP(self.hidden, self.act, self.norm, name="update_up")(
            out_up, mask=buf.cell_mask, train=train)
        out_bnd = UpdateMLP(self.hidden, self.act, self.norm,
                            name="update_boundaries")(
            out_bnd, mask=buf.cell_mask, train=train)

        combined = Linear(self.hidden, name="combine")(
            jnp.concatenate([out_up, out_bnd], axis=-1))
        combined = GraphNorm(self.norm, name="combine_norm")(
            combined, mask=buf.cell_mask, train=train)
        return act(combined)


class CINppCochainConv(nn.Module):
    """CIN++ per-dim conv: boundary + upper + lower channels.

    Parity: /root/reference/mp/layers.py:216-260 (CINppCochainConv); eps
    assignment follows its forward: eps1 -> up, eps2 -> down, eps3 -> boundary.

    DELIBERATE DIVERGENCE (documented, switchable): the reference CODE's
    lower-adjacency messages are structurally zero — `CINppCochainConv`
    inherits `use_down_msg=False` from `SparseCINCochainConv.__init__`
    (/root/reference/mp/layers.py:167-168) and its forward never passes
    `down_attr` to propagate (/root/reference/mp/layers.py:243-248), so
    `propagate` zero-fills the channel (/root/reference/mp/cell_mp.py:376).
    The reference's CIN++ is therefore CIN plus an
    `update_down_nn((1+eps2) x)` self-term.  This module implements the
    CIN++ *paper* (real down messages) by default; set
    `ref_quirk_no_down_msg=True` to reproduce the reference code's
    semantics exactly (message sum zeroed, eps residual + update_down MLP
    + 3-way combine retained).
    """

    dim: int
    hidden: int
    act: str = "relu"
    norm: str = "bn"
    use_coboundaries: bool = False
    train_eps: bool = False
    init_eps: float = 0.0
    ref_quirk_no_down_msg: bool = False

    @nn.compact
    def __call__(self, buf, x, x_up, x_down, boundary_attr,
                 train: bool = False, cob_buf=None, bnd_out=None):
        act = get_nonlinearity(self.act)
        layer_dim = x.shape[-1]

        if self.train_eps:
            eps1 = self.param("eps1", nn.initializers.constant(self.init_eps), (1,))
            eps2 = self.param("eps2", nn.initializers.constant(self.init_eps), (1,))
            eps3 = self.param("eps3", nn.initializers.constant(self.init_eps), (1,))
        else:
            eps1 = eps2 = eps3 = self.init_eps

        fused_up = fused_down = None
        if self.use_coboundaries:
            k_up, b_up = LinearParams(layer_dim, 2 * layer_dim,
                                      name="msg_up")()
            k_dn, b_dn = LinearParams(layer_dim, 2 * layer_dim,
                                      name="msg_down")()
            up_attr = down_attr = None
            message_up = message_down = None
            if (buf.up_src.shape[0] > 0
                    and factorized_kernel_usable(buf, cob_buf, x, x_up)):
                fused_up = factorized_up_channel_kernel(
                    x, x_up, k_up, b_up, buf, cob_buf, act, x.shape[0])
            elif (buf.up_src.shape[0] > 0
                    and factorized_up_usable(buf, cob_buf, x, x_up)):
                fused_up = factorized_up_channel(
                    x, x_up, k_up, b_up, buf, cob_buf, act, x.shape[0])
            elif (buf.up_src.shape[0] > 0 and fused_channel_usable(
                    buf.up_plan, buf.up_plan_bs, buf.up_plan_bc, x, x_up,
                    self.act)):
                fused_up = fused_mlp_channel(
                    x, x_up, k_up, b_up, buf.up_plan, buf.up_plan_bs,
                    buf.up_plan_bc, self.act, x.shape[0])
            else:
                up_attr = (gather_up_attr(buf, x_up) if x_up is not None
                           else jnp.zeros((buf.up_src.shape[0], layer_dim),
                                          x.dtype))

                def message_up(xj, attr):
                    return act(jnp.concatenate([xj, attr], axis=-1) @ k_up
                               + b_up)
            if self.ref_quirk_no_down_msg:
                pass                     # reference code: no down messages
            elif (buf.down_src.shape[0] > 0 and fused_channel_usable(
                    buf.down_plan, buf.down_plan_bs, buf.down_plan_bc, x,
                    x_down, self.act)):
                fused_down = fused_mlp_channel(
                    x, x_down, k_dn, b_dn, buf.down_plan, buf.down_plan_bs,
                    buf.down_plan_bc, self.act, x.shape[0])
            else:
                down_attr = (gather_down_attr(buf, x_down)
                             if x_down is not None
                             else jnp.zeros((buf.down_src.shape[0],
                                             layer_dim), x.dtype))

                def message_down(xj, attr):
                    return act(jnp.concatenate([xj, attr], axis=-1) @ k_dn
                               + b_dn)
        else:
            up_attr = down_attr = None

            def message_up(xj, attr):
                return xj

            def message_down(xj, attr):
                return xj

        out_up, out_down, out_bnd = propagate(
            buf, x, up_attr=up_attr, down_attr=down_attr,
            boundary_attr=None if bnd_out is not None else boundary_attr,
            message_up=message_up,
            message_down=None if self.ref_quirk_no_down_msg else message_down,
            message_boundary=((lambda b: b)
                              if boundary_attr is not None
                              and bnd_out is None else None),
            up_identity=not self.use_coboundaries,
            down_identity=not self.use_coboundaries, boundary_identity=True)
        if fused_up is not None:
            out_up = fused_up
        if fused_down is not None and not self.ref_quirk_no_down_msg:
            out_down = fused_down
        if bnd_out is not None:
            out_bnd = bnd_out      # consolidated cross-dim boundary kernel

        out_up = out_up + (1.0 + eps1) * x
        out_down = out_down + (1.0 + eps2) * x
        out_bnd = out_bnd + (1.0 + eps3) * x
        out_up = UpdateMLP(self.hidden, self.act, self.norm, name="update_up")(
            out_up, mask=buf.cell_mask, train=train)
        out_down = UpdateMLP(self.hidden, self.act, self.norm,
                             name="update_down")(
            out_down, mask=buf.cell_mask, train=train)
        out_bnd = UpdateMLP(self.hidden, self.act, self.norm,
                            name="update_boundaries")(
            out_bnd, mask=buf.cell_mask, train=train)

        combined = Linear(self.hidden, name="combine")(
            jnp.concatenate([out_up, out_down, out_bnd], axis=-1))
        combined = GraphNorm(self.norm, name="combine_norm")(
            combined, mask=buf.cell_mask, train=train)
        return act(combined)


class SparseCINLayer(nn.Module):
    """One conv over all dims (simultaneous update from pre-layer features).

    Parity: /root/reference/mp/layers.py:271-342 (SparseCINConv.forward).
    """

    hidden: int
    act: str = "relu"
    norm: str = "bn"
    use_coboundaries: bool = False
    train_eps: bool = False
    max_dim: int = 2
    include_down: bool = False       # True -> CIN++ convs
    ref_quirk_no_down_msg: bool = False   # see CINppCochainConv docstring
    include_boundary_features: bool = True
    include_top_features: bool = True

    @nn.compact
    def __call__(self, data: ComplexBatch, xs, train: bool = False,
                 start_to_process: int = 0):
        out = []
        # Launch-consolidated boundary channels: all dims' identity
        # boundary sums in ONE kernel (they read pre-layer features, so
        # there is no cross-dim dependency).  None when the batch has no
        # combined plan — per-dim propagate runs as before.
        bnd_all = None
        if self.include_boundary_features and start_to_process == 0:
            from cwn_tpu.mp import boundary_all
            bnd_all = boundary_all(data, xs)
        # A batch may carry fewer dims than the model's max_dim (e.g. a
        # clique lift that found no cells above some dimension); missing
        # dims behave as empty, matching the reference's zero-fill
        # (/root/reference/mp/models.py:171-185).
        for k in range(min(self.max_dim + 1, len(data.dims))):
            if k < start_to_process:
                out.append(xs[k])
                continue
            buf = data.dims[k]
            cob_buf = data.dims[k + 1] if k + 1 < len(data.dims) else None
            x_up = xs[k + 1] if k + 1 < len(xs) else None
            x_down = xs[k - 1] if k > 0 else None
            b_attr = xs[k - 1] if (k > 0 and self.include_boundary_features) else None
            bnd_k = (bnd_all.get(k) if bnd_all is not None
                     and b_attr is not None else None)
            if self.include_down:
                conv = CINppCochainConv(
                    dim=k, hidden=self.hidden, act=self.act, norm=self.norm,
                    use_coboundaries=self.use_coboundaries,
                    train_eps=self.train_eps,
                    ref_quirk_no_down_msg=self.ref_quirk_no_down_msg,
                    name=f"dim{k}")
                out.append(conv(buf, xs[k], x_up, x_down, b_attr, train=train,
                                cob_buf=cob_buf, bnd_out=bnd_k))
            else:
                conv = SparseCINCochainConv(
                    dim=k, hidden=self.hidden, act=self.act, norm=self.norm,
                    use_coboundaries=self.use_coboundaries,
                    train_eps=self.train_eps, name=f"dim{k}")
                out.append(conv(buf, xs[k], x_up, b_attr, train=train,
                                cob_buf=cob_buf, bnd_out=bnd_k))
        return out


class SparseCIN(nn.Module):
    """The main CW-network benchmark model.

    Parity: /root/reference/mp/models.py:112-257 (SparseCIN), including the
    `include_partial` per-layer activation hook used for parity testing.
    """

    num_input_features: int
    num_classes: int
    num_layers: int
    hidden: int
    dropout_rate: float = 0.5
    max_dim: int = 2
    jump_mode: Optional[str] = None
    nonlinearity: str = "relu"
    readout: str = "sum"
    train_eps: bool = False
    final_hidden_multiplier: int = 2
    use_coboundaries: bool = False
    readout_dims: Tuple[int, ...] = (0, 1, 2)
    final_readout: str = "sum"
    apply_dropout_before: str = "lin2"
    graph_norm: str = "bn"
    include_down: bool = False       # True -> CIN++
    ref_quirk_no_down_msg: bool = False   # see CINppCochainConv docstring

    def _readout_dims(self):
        if self.readout_dims is not None:
            return tuple(d for d in self.readout_dims if d <= self.max_dim)
        return tuple(range(self.max_dim + 1))

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False,
                 include_partial: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        readout_dims = self._readout_dims()
        res = {}

        xs = []
        for buf in data.dims:
            if buf.x is not None:
                xs.append(buf.x)
            else:
                xs.append(jnp.zeros((buf.cell_mask.shape[0],
                                     self.num_input_features), jnp.float32))

        jump_xs = [[] for _ in xs] if self.jump_mode is not None else None
        for c in range(self.num_layers):
            xs = SparseCINLayer(
                hidden=self.hidden, act=self.nonlinearity, norm=self.graph_norm,
                use_coboundaries=self.use_coboundaries, train_eps=self.train_eps,
                max_dim=self.max_dim, include_down=self.include_down,
                ref_quirk_no_down_msg=self.ref_quirk_no_down_msg,
                name=f"conv{c}")(data, xs, train=train)
            if include_partial:
                for k in range(len(xs)):
                    res[f"layer{c}_{k}"] = xs[k]
            if jump_xs is not None:
                for i, x in enumerate(xs):
                    jump_xs[i].append(x)

        if self.jump_mode == "cat":
            xs = [jnp.concatenate(js, axis=-1) for js in jump_xs]
        elif self.jump_mode == "max":
            xs = [jnp.max(jnp.stack(js, 0), axis=0) for js in jump_xs]

        from cwn_tpu.models.heads import CINReadoutHead
        x = CINReadoutHead(
            num_classes=self.num_classes, hidden=self.hidden,
            readout_dims=readout_dims, readout=self.readout,
            final_readout=self.final_readout,
            final_hidden_multiplier=self.final_hidden_multiplier,
            nonlinearity=self.nonlinearity, dropout_rate=self.dropout_rate,
            apply_dropout_before=self.apply_dropout_before,
            lin1_bias=(self.jump_mode != "cat"), name="head")(
                xs, data, train=train, include_partial=include_partial, res=res)

        if include_partial:
            res["out"] = x
            return x, res
        return x


class CINpp(SparseCIN):
    """SparseCIN + lower-adjacency channel (CIN++).

    Parity: /root/reference/mp/models.py:259-284."""

    include_down: bool = True
