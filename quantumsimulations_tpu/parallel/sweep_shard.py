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
    _batched_assembled_all_kernel32,
    _batched_coeffs_kernel,
    default_time_chunk,
    eig_traces_assembled_batched,
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


def eig_traces_assembled_sharded32(
    w: np.ndarray,  # (B, dim)
    V: np.ndarray,  # (B, dim, dim) complex
    psi0: np.ndarray,  # (B, dim) complex
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: np.ndarray,
    idx_rare: int,
    mesh: Mesh,
    t_chunk: int | None = None,
    interpret: bool | None = None,
) -> np.ndarray:
    """dp-sharded f32 speed mode (Pallas fused complex matmul per device).

    The Pallas kernel is a custom call the SPMD partitioner can't split, so
    the batch is partitioned explicitly with ``shard_map``: each device runs
    the full f32 trace kernel on its local slice of whole simulations —
    zero-communication, like the f64 path.
    """
    from functools import partial

    dp = mesh.shape["dp"]
    w_p, B = pad_batch(np.asarray(w), dp)
    V_p, _ = pad_batch(np.asarray(V), dp)
    psi_p, _ = pad_batch(np.asarray(psi0), dp)
    nse_p, _ = pad_batch(np.asarray(n_sea_effective), dp)
    Bp, dim = w_p.shape
    T = len(times)
    n_sites = len(dims)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=max(1, Bp // dp)) * 2

    dt, eps = uniform_grid_decomposition(times)
    n_chunks = int(np.ceil(T / t_chunk))
    Tp = n_chunks * t_chunk
    k_all = np.arange(T, dtype=np.float64)
    k_chunks = np.concatenate([k_all, np.full(Tp - T, k_all[-1])]).reshape(n_chunks, t_chunk)
    eps_chunks = np.concatenate([eps, np.full(Tp - T, eps[-1])]).reshape(n_chunks, t_chunk)
    r = np.stack([reduce_wdt_host(wb, dt) for wb in w_p])
    sea_mask = (
        np.arange(n_sites)[None, :] < np.asarray(nse_p)[:, None]
    ).astype(np.float64)

    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    put_b = lambda x: jax.device_put(jnp.asarray(x), batch)
    put_r = lambda x: jax.device_put(jnp.asarray(x), rep)

    Vc = Cplx(put_b(V_p.real), put_b(V_p.imag))
    c = _batched_coeffs_kernel(Vc, Cplx(put_b(psi_p.real), put_b(psi_p.imag)))
    V32 = Cplx(Vc.re.astype(jnp.float32), Vc.im.astype(jnp.float32))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    def local_solve(w_l, r_l, V32_l, c_l, mask_l, kc, ec):
        return _batched_assembled_all_kernel32(
            w_l, r_l, V32_l, c_l, mask_l, kc, ec, dims, idx_rare, interpret
        )

    out = jax.jit(local_solve)(
        put_b(w_p), put_b(r), V32, c, put_b(sea_mask),
        put_r(k_chunks), put_r(eps_chunks),
    )
    n_ch, Bk, _, Tc = out.shape
    arr = np.asarray(out.reshape(-1)).reshape(n_ch, Bk, 8, Tc)
    return np.moveaxis(arr, 0, 2).reshape(Bp, 8, -1)[:B, :, :T]


