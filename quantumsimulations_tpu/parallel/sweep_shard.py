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
    _batched_coeffs_kernel,
    _batched_trace_chunk_kernel,
    default_time_chunk,
)
from ..dynamics.phase import reduce_wdt_host, uniform_grid_decomposition
from ..ops.cplx import Cplx


def pad_batch(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (replicating the last element)."""
    B = x.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return x, B
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), B


def eig_propagate_traces_sharded(
    w: np.ndarray,  # (B, dim)
    V: np.ndarray,  # (B, dim, dim) complex
    psi0: np.ndarray,  # (B, dim) complex
    times: np.ndarray,
    dims: tuple[int, ...],
    mesh: Mesh,
    t_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Like eig_propagate_traces_batched but with the batch sharded over 'dp'.

    The batch is padded up to a multiple of the dp axis size; padding rows are
    dropped from the returned traces.
    """
    dp = mesh.shape["dp"]
    w_p, B = pad_batch(np.asarray(w), dp)
    V_p, _ = pad_batch(np.asarray(V), dp)
    psi_p, _ = pad_batch(np.asarray(psi0), dp)
    Bp, dim = w_p.shape
    T = len(times)
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=max(1, Bp // dp))

    dt, eps = uniform_grid_decomposition(times)
    r = np.stack([reduce_wdt_host(wb, dt) for wb in w_p])

    batch_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    put = lambda arr, sh: jax.device_put(jnp.asarray(arr), sh)

    wd = put(w_p, batch_sharding)
    rd = put(r, batch_sharding)
    Vc = Cplx(put(V_p.real, batch_sharding), put(V_p.imag, batch_sharding))
    psic = Cplx(put(psi_p.real, batch_sharding), put(psi_p.imag, batch_sharding))
    c = _batched_coeffs_kernel(Vc, psic)

    k_all = np.arange(T, dtype=np.float64)
    xyz_parts, norm_parts, energy_parts = [], [], []
    for start in range(0, T, t_chunk):
        kb = put(k_all[start : start + t_chunk], rep)
        eb = put(eps[start : start + t_chunk], rep)
        xyz, norms, energy = _batched_trace_chunk_kernel(wd, rd, Vc, c, kb, eb, dims)
        xyz_parts.append(np.asarray(xyz))
        norm_parts.append(np.asarray(norms))
        energy_parts.append(np.asarray(energy))
    return {
        "site_xyz": np.concatenate(xyz_parts, axis=-1)[:B],
        "norm": np.concatenate(norm_parts, axis=-1)[:B],
        "energy": np.concatenate(energy_parts, axis=-1)[:B],
    }
