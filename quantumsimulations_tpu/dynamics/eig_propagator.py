"""Exact propagation via dense eigendecomposition — the small/medium-N fast path.

The rotating-frame Hamiltonian is time-independent (the reference's drives are
static in the rotating frame, dipolar_ensemble_with_rare.py:515-528), so the
entire trace is available in closed form:

    psi(t_k) = V exp(-i L t_k) V^dag psi0

Where the reference pushes ~3e6 adaptive ODE steps through QuTiP/SciPy per
simulation (30 s horizon at max_step=1e-5, sweep_sea_detuning.py:1247-1250),
this propagator does ONE host-side eigendecomposition per Hamiltonian and then
produces all 20k output states with a single MXU-shaped complex matmul
(dim x dim) @ (dim x T), evaluated in (re, im) float64 planes and chunked over
time to bound memory.  Expectation traces come from per-site reduced density
matrices (observables.py) without ever materializing dense observables.

Phase arguments w*t (up to ~1e8 rad at 30 s) are handled by the uniform-grid
reduction in phase.py (host longdouble per-step reduction + small-argument
device reduction), adding < 1e-11 rad of error on any backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, matmul
from .observables import site_xyz_expectations, state_norms
from .phase import grid_expi_neg, reduce_wdt_host, uniform_grid_decomposition


def eigh_host(H: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition on the host CPU (complex dtypes are TPU-unsupported)."""
    w, V = np.linalg.eigh(H)
    return w, V


def _trace_chunk(w, r, V: Cplx, c: Cplx, k_block, eps_block, dims):
    """site_xyz (n,3,Tc), norms (Tc,), <H> (Tc,) for one block of times."""
    ph_re, ph_im = grid_expi_neg(r, k_block, w, eps_block)  # (dim, Tc)
    amp = Cplx(
        c.re[:, None] * ph_re - c.im[:, None] * ph_im,
        c.re[:, None] * ph_im + c.im[:, None] * ph_re,
    )
    states = matmul(V, amp)  # (dim, Tc)
    xyz = site_xyz_expectations(states, dims)
    norms = state_norms(states)
    energy = jnp.sum(w[:, None] * amp.abs2(), axis=0)
    return xyz, norms, energy


_trace_chunk_kernel = jax.jit(_trace_chunk, static_argnames=("dims",))


def _coeffs(V: Cplx, psi0: Cplx) -> Cplx:
    dag = V.dagger()
    re = dag.re @ psi0.re - dag.im @ psi0.im
    im = dag.re @ psi0.im + dag.im @ psi0.re
    return Cplx(re, im)


_coeffs_kernel = jax.jit(_coeffs)


def default_time_chunk(dim: int, T: int, batch: int = 1) -> int:
    """Bound the per-chunk states block.

    The budget is deliberately small (~64 MB of f64 pairs): on TPU the x64
    rewriter expands f64 matmuls/einsums into multi-limb bf16/f32 passes with
    ~10x temporary inflation and heavy fragmentation, so a 512 MB block OOMs
    a 16 GB chip.  Override with QST_TCHUNK for experiments.
    """
    import os

    env = os.environ.get("QST_TCHUNK")
    if env:
        return max(1, min(T, int(env)))
    return max(64, min(T, (1 << 22) // max(1, dim * batch)))


def eig_propagate_traces(
    w: np.ndarray,
    V: np.ndarray,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    t_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Full observable traces for one simulation.

    Returns {'site_xyz': (n_sites, 3, T), 'norm': (T,), 'energy': (T,)}.
    """
    dim = int(np.prod(dims))
    T = len(times)
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T)
    dt, eps = uniform_grid_decomposition(times)
    r = jnp.asarray(reduce_wdt_host(w, dt))
    k_all = np.arange(T, dtype=np.float64)

    Vc = Cplx.from_numpy(V)
    wd = jnp.asarray(w)
    c = _coeffs_kernel(Vc, Cplx.from_numpy(psi0))

    xyz_parts, norm_parts, energy_parts = [], [], []
    for start in range(0, T, t_chunk):
        kb = jnp.asarray(k_all[start : start + t_chunk])
        eb = jnp.asarray(eps[start : start + t_chunk])
        xyz, norms, energy = _trace_chunk_kernel(wd, r, Vc, c, kb, eb, dims)
        xyz_parts.append(np.asarray(xyz))
        norm_parts.append(np.asarray(norms))
        energy_parts.append(np.asarray(energy))
    return {
        "site_xyz": np.concatenate(xyz_parts, axis=-1),
        "norm": np.concatenate(norm_parts),
        "energy": np.concatenate(energy_parts),
    }


# ---------------------------------------------------------------------------
# Batched variant: many Hamiltonians (sweep points / variants) on one chip.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims",))
def _batched_trace_chunk_kernel(w, r, V, c, k_block, eps_block, dims):
    fn = lambda wb, rb, Vb, cb: _trace_chunk(wb, rb, Vb, cb, k_block, eps_block, dims)
    return jax.vmap(fn)(w, r, V, c)


_batched_coeffs_kernel = jax.jit(jax.vmap(_coeffs))


def eig_propagate_traces_batched(
    w: np.ndarray,  # (B, dim)
    V: np.ndarray,  # (B, dim, dim) complex
    psi0: np.ndarray,  # (B, dim) complex
    times: np.ndarray,
    dims: tuple[int, ...],
    t_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Batched traces: site_xyz (B, n, 3, T), norm (B, T), energy (B, T)."""
    B, dim = w.shape
    T = len(times)
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=B)
    dt, eps = uniform_grid_decomposition(times)
    r = jnp.asarray(np.stack([reduce_wdt_host(wb, dt) for wb in w]))
    k_all = np.arange(T, dtype=np.float64)

    Vc = Cplx.from_numpy(V)
    wd = jnp.asarray(w)
    c = _batched_coeffs_kernel(Vc, Cplx.from_numpy(psi0))

    xyz_parts, norm_parts, energy_parts = [], [], []
    for start in range(0, T, t_chunk):
        kb = jnp.asarray(k_all[start : start + t_chunk])
        eb = jnp.asarray(eps[start : start + t_chunk])
        xyz, norms, energy = _batched_trace_chunk_kernel(wd, r, Vc, c, kb, eb, dims)
        xyz_parts.append(np.asarray(xyz))
        norm_parts.append(np.asarray(norms))
        energy_parts.append(np.asarray(energy))
    return {
        "site_xyz": np.concatenate(xyz_parts, axis=-1),
        "norm": np.concatenate(norm_parts, axis=-1),
        "energy": np.concatenate(energy_parts, axis=-1),
    }
