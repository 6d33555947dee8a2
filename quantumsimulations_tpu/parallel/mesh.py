"""Device-mesh helpers for sweep (DP) and statevector (SP) sharding.

The 2D sweep grid (f1A x detuning) maps to a data-parallel mesh axis 'dp'
(each device propagates a slice of the Hamiltonian batch) and large baths map
their Hilbert dimension to a state-parallel axis 'sp' (sharded statevector,
state_sharded.py).  A 2D ('dp', 'sp') mesh composes both — the TPU-native
replacement of the reference's serial Python detuning loop
(sweep_sea_detuning.py:611).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, sp: int = 1) -> Mesh:
    """('dp', 'sp') mesh over the first n_devices devices.

    ``sp`` devices shard the statevector axis; the rest form the batch axis.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    if n_devices % sp != 0:
        raise ValueError("n_devices must be divisible by sp")
    dp = n_devices // sp
    arr = np.asarray(devs[:n_devices]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def pow2_floor(n: int) -> int:
    return 1 << (n.bit_length() - 1)
