"""Data-parallel sweep sharding: the Hamiltonian batch over the 'dp' axis.

The batched eig propagator (dynamics/eig_propagator.py) is already expressed
as vmapped MXU matmuls; sharding the batch axis with a ``NamedSharding`` lets
XLA partition the whole trace computation across the mesh with zero
communication (each device owns complete simulations — the detuning grid is
embarrassingly parallel, exactly what the reference serializes in Python at
sweep_sea_detuning.py:611).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics.eig_propagator import (
    default_time_chunk,
    eig_traces_assembled_batched,
)


def pad_batch(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (replicating the last element)."""
    B = x.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return x, B
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), B


def _mesh_device_put(mesh: Mesh):
    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def put(x, kind):
        return jax.device_put(jnp.asarray(x), batch if kind == "batch" else rep)

    return put


def eig_traces_assembled_sharded(
    w: np.ndarray,  # (B, dim)
    V: np.ndarray,  # (B, dim, dim) complex
    psi0: np.ndarray,  # (B, dim) complex
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: np.ndarray,
    idx_rare: int,
    mesh: Mesh,
    t_chunk: int | None = None,
) -> np.ndarray:
    """dp-sharded assembled traces (B, 8, T); batch padded to the dp size."""
    dp = mesh.shape["dp"]
    w_p, B = pad_batch(np.asarray(w), dp)
    V_p, _ = pad_batch(np.asarray(V), dp)
    psi_p, _ = pad_batch(np.asarray(psi0), dp)
    nse_p, _ = pad_batch(np.asarray(n_sea_effective), dp)
    Bp, dim = w_p.shape
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, len(times), batch=max(1, Bp // dp))
    rows = eig_traces_assembled_batched(
        w_p, V_p, psi_p, times, dims, nse_p, idx_rare,
        t_chunk=t_chunk, device_put=_mesh_device_put(mesh),
    )
    return rows[:B]


