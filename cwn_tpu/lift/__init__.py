"""Graph -> cell complex lifting (host-side preprocessing).

Produces `cwn_tpu.complex.Complex` objects from plain graphs.  This replaces
the reference's gudhi SimplexTree + graph-tool subgraph-isomorphism stage
(/root/reference/data/utils.py) with self-contained NumPy/Python
implementations: clique expansion for simplicial complexes and chordless
cycle enumeration for ring 2-complexes.  Runs offline on host; the output is
consumed by `cwn_tpu.batch` which emits static-shape device buffers.
"""

from cwn_tpu.lift.core import build_complex_from_cells
from cwn_tpu.lift.simplicial import clique_complex, convert_graph_dataset_with_cliques
from cwn_tpu.lift.rings import (
    find_induced_cycles,
    ring_2complex,
    convert_graph_dataset_with_rings,
)
