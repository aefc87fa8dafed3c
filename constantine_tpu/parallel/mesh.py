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


HOST_AXIS = "host"


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Multi-process (multi-host) initialization.

    Reads CTT_COORDINATOR / CTT_NUM_PROCESSES / CTT_PROCESS_ID when args
    are omitted; no-ops for single-process runs. This is the jax.distributed
    path the reference lacks entirely (its distributed story is "not a
    target, yet" — README-PERFORMANCE.md:125); on TPU pods the same call
    wires DCN process groups while in-slice traffic rides ICI.
    """
    import os
    coordinator = coordinator or os.environ.get("CTT_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("CTT_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else int(
        os.environ.get("CTT_PROCESS_ID", "-1"))
    if not coordinator or num_processes <= 1 or process_id < 0:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh_2d(n_hosts: int, per_host: int = None) -> Mesh:
    """2-D (host x data) mesh: leading axis spans processes (DCN), minor
    axis the devices within a process (ICI). Shardings that keep their
    collectives on the minor axis stay on-chip-interconnect."""
    devices = jax.devices()
    if per_host is None:
        per_host = len(devices) // n_hosts
    arr = np.array(devices[:n_hosts * per_host]).reshape(n_hosts, per_host)
    return Mesh(arr, (HOST_AXIS, DATA_AXIS))
