"""Device mesh construction."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices: Optional[Sequence] = None,
              backend: Optional[str] = None) -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
