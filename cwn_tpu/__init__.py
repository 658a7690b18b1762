"""cwn_tpu: a TPU-native cellular/simplicial message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
twitter-research/cwn (CIN / CIN++ / MPSN): graphs are lifted host-side into
cell complexes (clique complexes or ring 2-complexes) emitted as static-shape
padded COO/CSR incidence buffers, and boundary / upper / lower adjacency
message passing runs as compiled segment-reduce programs on TPU.

Layout:
  cwn_tpu.complex    host-side Complex IR (numpy)
  cwn_tpu.lift       graph -> complex lifting (clique / rings / orientation)
  cwn_tpu.batch      packing complexes into padded device-ready pytrees
  cwn_tpu.ops        segment reductions + Pallas kernels
  cwn_tpu.mp         the functional message-passing engine
  cwn_tpu.models     model zoo (SparseCIN, CIN++, Embed variants, MPSN, ...)
  cwn_tpu.data       dataset suite
  cwn_tpu.train      experiment harness (optimizer, scheduler, evaluator)
  cwn_tpu.parallel   mesh / pjit / shard_map scale-out
"""

__version__ = "0.1.0"

from cwn_tpu.complex import Cochain, Complex
