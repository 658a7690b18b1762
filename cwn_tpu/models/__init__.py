"""Model zoo.

Parity targets (reference file:class):
  mp/models.py:112  SparseCIN        -> cwn_tpu.models.cin.SparseCIN
  mp/models.py:259  CINpp            -> cwn_tpu.models.cin.CINpp
  mp/models.py:618  MessagePassingAgnostic -> cwn_tpu.models.baselines
  mp/models.py:476  EdgeOrient       -> cwn_tpu.models.orient
  mp/models.py:549  EdgeMPNN         -> cwn_tpu.models.orient
  mp/molec_models.py:12  EmbedSparseCIN   -> cwn_tpu.models.molec
  mp/molec_models.py:167 EmbedCINpp       -> cwn_tpu.models.molec
  mp/molec_models.py:201 OGBEmbedSparseCIN-> cwn_tpu.models.molec
  mp/molec_models.py:386 EmbedSparseCINNoRings -> cwn_tpu.models.molec
  mp/molec_models.py:506 EmbedGIN         -> cwn_tpu.models.molec
  mp/graph_models.py     GIN0/GIN(+JK)    -> cwn_tpu.models.graph
  mp/ring_exp_models.py  RingSparseCIN/RingGIN -> cwn_tpu.models.ring_exp
"""

from cwn_tpu.models.cin import (
    SparseCIN,
    CINpp,
    SparseCINCochainConv,
    CINppCochainConv,
    SparseCINLayer,
)
from cwn_tpu.models.baselines import (
    CIN0,
    EdgeCIN0,
    Dummy,
    MessagePassingAgnostic,
)
from cwn_tpu.models.molec import (
    EmbedSparseCIN,
    EmbedCINpp,
    OGBEmbedSparseCIN,
    OGBEmbedCINpp,
    EmbedSparseCINNoRings,
    EmbedGIN,
)
from cwn_tpu.models.orient import OrientedConv, EdgeOrient, EdgeMPNN
from cwn_tpu.models.ring_exp import RingSparseCIN, RingGIN
from cwn_tpu.models.graph import GIN, GIN0, GIN0WithJK, GINWithJK
