"""Dataset suite.

Parity map (reference -> here):
  data/datasets/sr.py        -> sr.py       (bundled graph6 families)
  data/datasets/csl.py       -> csl.py      (synthetic CSL + bundled splits)
  data/datasets/zinc.py      -> zinc.py     (gated download; synthetic stand-in)
  data/datasets/ogb.py       -> ogb.py      (gated)
  data/datasets/tu.py        -> tu.py       (gated; parser + folds included)
  data/datasets/ringtransfer/ringlookup -> ring.py (synthetic)
  data/datasets/flow.py/ocean.py -> flow.py / ocean.py (oriented cochains)
  data/datasets/peptides_*.py -> peptides.py (gated)
  data/datasets/dummy.py     -> dummy.py    (fixture complexes)
"""

from cwn_tpu.data.datasets.base import ComplexDatasetSpec, DatasetNotAvailable
from cwn_tpu.data.datasets.registry import load_dataset
