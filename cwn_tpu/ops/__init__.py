"""TPU compute kernels: masked segment reductions and fused gather-scatter.

`segment.py` holds the XLA reference implementations (always correct, used
as the oracle in tests).  `pallas_segment.py` holds the Pallas TPU kernels
for the hot paths; they are drop-in replacements validated against the XLA
versions.
"""

from cwn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_reduce,
    masked_segment_reduce,
)
