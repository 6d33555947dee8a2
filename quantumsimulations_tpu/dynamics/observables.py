"""On-device expectation-value traces from statevector blocks.

Instead of materializing dense observable matrices and computing
<psi|O|psi> per output time (the reference lets ``qt.sesolve`` do this with
six dense e_ops, dipolar_ensemble_with_rare.py:653-666), we compute per-site
single-spin reduced density matrices for a whole block of time points with a
single einsum per site — O(dim * d_site^2) per time point — and take traces
against the 2x2 / 4x4 spin matrices.  Collective sea observables are sums of
per-site expectations (linearity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# f32 inputs on the TPU MXU default to ONE bf16 pass (~2e-3 error); HIGHEST
# selects the 3-pass decomposition (f32-grade).  No effect on the f64 path.
_HI = jax.lax.Precision.HIGHEST

from ..ops.cplx import Cplx
from ..ops.spin import spin_matrix


def site_xyz_expectations(states: Cplx, dims: tuple[int, ...]) -> jnp.ndarray:
    """Per-site <Sx>, <Sy>, <Sz> for a block of states.

    Spin operators only couple ADJACENT local levels (Jx/Jy are tridiagonal,
    Jz diagonal), so each expectation is a handful of elementwise
    slice-products reduced over the environment axes — no per-site reduced
    density matrix and, crucially, no einsum relayouts: the (lart,lbrt->tab)
    formulation transposed the full f64 block once per site per product,
    which at dim 8192 cost ~4 s per 128-column block on chip (emulated-f64
    relayouts); this form runs the same math as fused multiply-reduces in
    the natural (dim, T) layout.

        <Jx> = sum_a Jx[a,a+1] * 2 Re(conj(psi_a) psi_{a+1})
        <Jy> = sum_a c_a      * 2 Im(conj(psi_a) psi_{a+1}),  Jy[a,a+1] = -i c_a
        <Jz> = sum_a Jz[a,a] * |psi_a|^2

    Parameters
    ----------
    states : Cplx with shape (dim, T)
        Columns are statevectors at successive output times.
    dims : per-site local dimensions (static).

    Returns
    -------
    jnp.ndarray of shape (n_sites, 3, T), real float64.
    """
    n_sites = len(dims)
    T = states.shape[-1]
    outs = []
    for site in range(n_sites):
        dl = int(np.prod(dims[:site], dtype=np.int64)) if site > 0 else 1
        d = dims[site]
        dr = int(np.prod(dims[site + 1 :], dtype=np.int64)) if site + 1 < n_sites else 1
        pr = states.re.reshape(dl, d, dr, T)
        pi = states.im.reshape(dl, d, dr, T)
        s = (d - 1) / 2.0
        jx = np.real(spin_matrix(s, "x"))  # real symmetric, superdiag c_a
        jy = np.imag(spin_matrix(s, "y"))  # Jy[a,a+1] = -i c_a -> imag part -c_a
        jz = np.real(np.diag(spin_matrix(s, "z")))
        ex = jnp.zeros((T,), states.re.dtype)
        ey = jnp.zeros((T,), states.re.dtype)
        ez = jnp.zeros((T,), states.re.dtype)
        for a in range(d):
            ra, ia = pr[:, a], pi[:, a]  # (dl, dr, T)
            ez = ez + jz[a] * jnp.sum(ra * ra + ia * ia, axis=(0, 1))
            if a + 1 < d:
                rb, ib = pr[:, a + 1], pi[:, a + 1]
                cx = float(jx[a, a + 1])
                cy = float(-jy[a, a + 1])  # c_a of Jy[a,a+1] = -i c_a
                # conj(psi_a) psi_b: Re = ra rb + ia ib, Im = ra ib - ia rb
                ex = ex + (2.0 * cx) * jnp.sum(ra * rb + ia * ib, axis=(0, 1))
                ey = ey + (2.0 * cy) * jnp.sum(ra * ib - ia * rb, axis=(0, 1))
        outs.append(jnp.stack([ex, ey, ez]))  # (3, T)
    return jnp.stack(outs)  # (n_sites, 3, T)


def state_norms(states: Cplx) -> jnp.ndarray:
    """||psi(t)|| per column — the reference's integrator diagnostic."""
    return jnp.sqrt(jnp.sum(states.abs2(), axis=0))


def assemble_traces(
    site_xyz: np.ndarray,
    norms: np.ndarray,
    n_sea_effective: int,
    idx_rare: int,
) -> dict[str, np.ndarray]:
    """Build the reference's named observable dict from per-site expectations.

    Keys match dipolar_ensemble_with_rare.py:671-679: collective sea sums
    over sites [0, n_sea_effective) and the rare site's x/y/z, plus
    state_norm.  For the sea-as-center control variant, n_sea_effective
    includes the center site (reference :488-489).
    """
    sea = site_xyz[:n_sea_effective]  # (n_sea_eff, 3, T)
    rare = site_xyz[idx_rare]  # (3, T)
    return {
        "Ix_sea": np.asarray(sea[:, 0, :].sum(axis=0)),
        "Iy_sea": np.asarray(sea[:, 1, :].sum(axis=0)),
        "Iz_sea": np.asarray(sea[:, 2, :].sum(axis=0)),
        "Iz_R": np.asarray(rare[2]),
        "Ix_R": np.asarray(rare[0]),
        "Iy_R": np.asarray(rare[1]),
        "state_norm": np.asarray(norms),
    }
