"""Device mesh helpers.

The reference's parallel runtime is a shared-memory work-stealing threadpool
(constantine/threadpool/threadpool.nim:850-1128); its TPU-native equivalent
is SPMD over a jax.sharding.Mesh with XLA collectives riding ICI (SURVEY.md
§2.2/§2.3 mapping). This module centralizes mesh construction so every
parallel kernel shards the same way.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))
