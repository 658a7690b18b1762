"""Aux subsystems: checkpointing, profiling, logging.

The reference has none of these (SURVEY.md section 5); they are required
for production-scale training on TPU pods.
"""

from cwn_tpu.utils.checkpoint import CheckpointManager
from cwn_tpu.utils.profiling import StepTimer, trace
