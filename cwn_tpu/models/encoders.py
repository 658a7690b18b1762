"""Input featurisation: integer-feature embeddings and OGB-style encoders.

Parity targets:
  InitReduceConv        /root/reference/mp/layers.py:473-487
  EmbedVEWithReduce     /root/reference/mp/layers.py:490-571
  OGBEmbedVEWithReduce  /root/reference/mp/layers.py:573-593
  AtomEncoder/BondEncoder (ogb.graphproppred.mol_encoder): sums one
  embedding table per input feature column.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cwn_tpu.batch import ComplexBatch
from cwn_tpu.mp import boundary_reduce
from cwn_tpu.nn import Embedding

# Public OGB molecule vocab sizes (ogb.utils.features full feature dims).
OGB_ATOM_FEATURE_DIMS: Tuple[int, ...] = (119, 5, 12, 12, 10, 6, 6, 2, 2)
OGB_BOND_FEATURE_DIMS: Tuple[int, ...] = (5, 6, 2)


class AtomEncoder(nn.Module):
    """Sum of per-column embeddings over the 9 OGB atom features."""

    embed_dim: int
    feature_dims: Tuple[int, ...] = OGB_ATOM_FEATURE_DIMS

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.int32)
        out = 0.0
        for i in range(x.shape[-1]):
            n = self.feature_dims[i] if i < len(self.feature_dims) else 100
            out = out + Embedding(n, self.embed_dim, name=f"emb_{i}")(x[..., i])
        return out


class BondEncoder(nn.Module):
    """Sum of per-column embeddings over the 3 OGB bond features."""

    embed_dim: int
    feature_dims: Tuple[int, ...] = OGB_BOND_FEATURE_DIMS

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.int32)
        out = 0.0
        for i in range(x.shape[-1]):
            n = self.feature_dims[i] if i < len(self.feature_dims) else 100
            out = out + Embedding(n, self.embed_dim, name=f"emb_{i}")(x[..., i])
        return out


class EmbedVEWithReduce(nn.Module):
    """Embed integer vertex (and optionally edge) features; boundary-reduce
    to initialise higher-cell features.

    ogb_encoders=False: scalar int features + plain Embedding tables (ZINC).
    ogb_encoders=True:  multi-column int features + Atom/Bond encoders.
    """

    atom_types: int
    bond_types: int
    embed_dim: int
    embed_edge: bool = False
    init_reduce: str = "add"
    ogb_encoders: bool = False

    @nn.compact
    def __call__(self, data: ComplexBatch):
        max_dim = data.max_dim
        v_buf = data.dims[0]
        assert v_buf.x is not None

        if self.ogb_encoders:
            vx = AtomEncoder(self.embed_dim, name="v_embed")(v_buf.x)
        else:
            assert v_buf.x.shape[-1] == 1
            vx = Embedding(self.atom_types, self.embed_dim, name="v_embed")(
                v_buf.x[:, 0].astype(jnp.int32))
        out = [vx]

        if max_dim >= 1:
            e_buf = data.dims[1]
            n_e = e_buf.cell_mask.shape[0]
            reduced_ex = boundary_reduce(vx, e_buf, n_e, self.init_reduce)
            if self.embed_edge and e_buf.x is not None:
                if self.ogb_encoders:
                    ex = BondEncoder(self.embed_dim, name="e_embed")(e_buf.x)
                else:
                    assert e_buf.x.shape[-1] == 1
                    ex = Embedding(self.bond_types, self.embed_dim,
                                   name="e_embed")(e_buf.x[:, 0].astype(jnp.int32))
            else:
                ex = reduced_ex
            out.append(ex)

            if max_dim >= 2:
                c_buf = data.dims[2]
                n_c = c_buf.cell_mask.shape[0]
                # Divide by two: each ring vertex is counted by two of its
                # boundary edges (/root/reference/mp/layers.py:540).
                cx = boundary_reduce(reduced_ex, c_buf, n_c,
                                     self.init_reduce) / 2.0
                out.append(cx)

        return out
