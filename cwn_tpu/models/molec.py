"""Molecular models: Embed/OGB CIN variants and the GIN pipeline baseline.

Parity targets:
  EmbedSparseCIN        /root/reference/mp/molec_models.py:12-165
  EmbedCINpp            /root/reference/mp/molec_models.py:167-199
  OGBEmbedSparseCIN     /root/reference/mp/molec_models.py:201-353
  OGBEmbedCINpp         /root/reference/mp/molec_models.py:355-384
  EmbedSparseCINNoRings /root/reference/mp/molec_models.py:386-503
  EmbedGIN              /root/reference/mp/molec_models.py:506-606
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.models.cin import SparseCINLayer
from cwn_tpu.models.encoders import EmbedVEWithReduce
from cwn_tpu.models.heads import CINReadoutHead
from cwn_tpu.nn import Linear, UpdateMLP, get_nonlinearity, pool_cells
from cwn_tpu.mp import propagate


class EmbedSparseCIN(nn.Module):
    """CIN on molecules: integer features embedded, higher cells initialised
    by boundary reduction; input dropout; SparseCIN body + shared head."""

    atom_types: int
    bond_types: int
    out_size: int
    num_layers: int
    hidden: int
    dropout_rate: float = 0.5
    in_dropout_rate: Optional[float] = None   # None -> use dropout_rate (ZINC)
    max_dim: int = 2
    jump_mode: Optional[str] = None
    nonlinearity: str = "relu"
    readout: str = "sum"
    train_eps: bool = False
    final_hidden_multiplier: int = 2
    readout_dims: Tuple[int, ...] = (0, 1, 2)
    final_readout: str = "sum"
    apply_dropout_before: str = "lin2"
    init_reduce: str = "add"
    embed_edge: bool = False
    embed_dim: Optional[int] = None
    use_coboundaries: bool = False
    graph_norm: str = "bn"
    include_down: bool = False                # True -> CIN++ convs
    ref_quirk_no_down_msg: bool = False       # see CINppCochainConv docstring
    ogb_encoders: bool = False                # True -> Atom/Bond encoders
    conv_dropout: bool = False                # True -> dropout on conv outputs (OGB)

    def _readout_dims(self):
        if self.readout_dims is not None:
            return tuple(d for d in self.readout_dims if d <= self.max_dim)
        return tuple(range(self.max_dim + 1))

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False,
                 include_partial: bool = False):
        embed_dim = self.embed_dim or self.hidden
        in_rate = (self.dropout_rate if self.in_dropout_rate is None
                   else self.in_dropout_rate)
        res = {}

        xs = EmbedVEWithReduce(
            atom_types=self.atom_types, bond_types=self.bond_types,
            embed_dim=embed_dim, embed_edge=self.embed_edge,
            init_reduce=self.init_reduce, ogb_encoders=self.ogb_encoders,
            name="init_conv")(data)
        # Pad missing higher dims with zeros so every conv dim has features.
        while len(xs) < self.max_dim + 1:
            k = len(xs)
            xs.append(jnp.zeros(
                (data.dims[k].cell_mask.shape[0], embed_dim), xs[0].dtype))

        in_dropout = nn.Dropout(rate=in_rate)
        xs = [in_dropout(x, deterministic=not train) for x in xs]

        conv_dropout = nn.Dropout(rate=self.dropout_rate)
        jump_xs = [[] for _ in xs] if self.jump_mode is not None else None
        for c in range(self.num_layers):
            xs = SparseCINLayer(
                hidden=self.hidden, act=self.nonlinearity,
                norm=self.graph_norm, use_coboundaries=self.use_coboundaries,
                train_eps=self.train_eps, max_dim=self.max_dim,
                include_down=self.include_down,
                ref_quirk_no_down_msg=self.ref_quirk_no_down_msg,
                name=f"conv{c}")(
                    data, xs, train=train)
            if self.conv_dropout:
                xs = [conv_dropout(x, deterministic=not train) for x in xs]
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

        x = CINReadoutHead(
            num_classes=self.out_size, hidden=self.hidden,
            readout_dims=self._readout_dims(), readout=self.readout,
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


class EmbedCINpp(EmbedSparseCIN):
    """EmbedSparseCIN + lower-adjacency messages (CIN++)."""

    include_down: bool = True


class OGBEmbedSparseCIN(EmbedSparseCIN):
    """OGB molecule variant: Atom/Bond encoders, separate input dropout and
    dropout applied to every conv output."""

    ogb_encoders: bool = True
    conv_dropout: bool = True
    in_dropout_rate: Optional[float] = 0.0


class OGBEmbedCINpp(OGBEmbedSparseCIN):
    include_down: bool = True


class EmbedSparseCINNoRings(EmbedSparseCIN):
    """Ablation killing the ring channel: operate with max_dim=1 only.

    Under our packing, max_dim=1 already drops the ring-mediated upper
    adjacency of edges — the exact effect of the reference's
    `params[1].up_index = None` (/root/reference/mp/molec_models.py:457-471).
    Construct with max_dim=1, readout_dims=(0, 1) and pack batches with
    max_dim=1."""

    max_dim: int = 1
    readout_dims: Tuple[int, ...] = (0, 1)


class EmbedGIN(nn.Module):
    """GIN(E) on the 0-skeleton of the lifted complex (pipeline baseline).

    The init conv embeds vertices/edges exactly like EmbedSparseCIN; message
    passing then runs only on the vertex dim, with edge features added to
    source features per GINE: m = relu(x_j + e_attr)."""

    atom_types: int
    bond_types: int
    out_size: int
    num_layers: int
    hidden: int
    dropout_rate: float = 0.5
    nonlinearity: str = "relu"
    readout: str = "sum"
    train_eps: bool = False
    apply_dropout_before: str = "lin2"
    init_reduce: str = "add"
    embed_edge: bool = False
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(self, data: ComplexBatch, train: bool = False):
        act = get_nonlinearity(self.nonlinearity)
        embed_dim = self.embed_dim or self.hidden

        xs = EmbedVEWithReduce(
            atom_types=self.atom_types, bond_types=self.bond_types,
            embed_dim=embed_dim, embed_edge=self.embed_edge,
            init_reduce=self.init_reduce, name="init_conv")(data)
        dropout = nn.Dropout(rate=self.dropout_rate)
        x = dropout(xs[0], deterministic=not train)
        e_x = xs[1] if len(xs) > 1 else None

        buf = data.dims[0]
        # Edge attr per upper edge = feature of the shared coboundary (the edge).
        up_attr = (jnp.take(e_x, buf.up_cob, axis=0, mode="clip")
                   if e_x is not None else None)

        for c in range(self.num_layers):
            if self.train_eps:
                eps = self.param(f"eps_{c}", nn.initializers.zeros, (1,))
            else:
                eps = 0.0

            def message(xj, attr):
                if attr is None:
                    return jax.nn.relu(xj)
                return jnp.maximum(xj + attr, 0.0)

            agg, _, _ = propagate(buf, x, up_attr=up_attr, message_up=message)
            h = agg + (1.0 + eps) * x
            # GINE update MLP: Linear -> BN -> act -> Linear -> BN -> act.
            x = UpdateMLP(self.hidden, self.nonlinearity, "bn",
                          name=f"update_{c}")(h, mask=buf.cell_mask, train=train)

        x = pool_cells(x, buf.batch, buf.cell_mask, data.batch_size, self.readout)
        if self.apply_dropout_before == "lin1":
            x = dropout(x, deterministic=not train)
        x = act(Linear(self.hidden, name="lin1")(x))
        if self.apply_dropout_before in ("final_readout", "lin2"):
            x = dropout(x, deterministic=not train)
        return Linear(self.out_size, name="lin2")(x)
