"""Scale-out: device meshes, data-parallel pjit/shard_map training.

The reference is strictly single-device (/root/reference/exp/run_exp.py:22);
this subsystem is the TPU-native scale-out it lacks: batches are packed
per-device with a common PadPlan, stacked on a leading device axis, and the
train step runs under shard_map over a ('data',) mesh with psum'd gradients.
Edge-partitioned model parallelism of single large complexes lives in
cwn_tpu.parallel.edge_partition.
"""

from cwn_tpu.parallel.mesh import make_mesh
from cwn_tpu.parallel.step import make_dp_train_step, stack_shards
