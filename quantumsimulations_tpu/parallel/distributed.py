"""Multi-host initialization and mesh construction (SURVEY.md §5 comm slot).

The reference is a single Python process with no communication backend at
all; the TPU-native equivalent is ``jax.distributed`` + XLA collectives.
``initialize_multihost()`` wires a multi-host run (one process per host, all
chips of a pod slice visible as jax.devices()); ``global_mesh`` lays the
('dp', 'sp') axes over the global device set so that the sp axis stays
within a host's ICI-connected chips wherever possible (collective-permute on
the state axis rides ICI, the embarrassingly-parallel dp axis can cross DCN).
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars.

    Returns True when a multi-process runtime was initialized; False for a
    plain single-process run (missing configuration is not an error — the
    framework degrades to single-host seamlessly).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or num_processes is None or process_id is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(sp: int = 1) -> Mesh:
    """('dp', 'sp') mesh over ALL global devices (multi-host aware).

    ``sp`` consecutive devices (ICI neighbors under the default device order)
    form the sharded-state axis; the rest is the batch axis.
    """
    devs = jax.devices()
    n = len(devs)
    if n % sp != 0:
        raise ValueError(f"{n} devices not divisible by sp={sp}")
    arr = np.asarray(devs).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))
