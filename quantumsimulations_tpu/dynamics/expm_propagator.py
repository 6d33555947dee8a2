"""Dense step-operator propagation: U = exp(-i H dt) by Taylor + squaring.

The large-dense-dim path (N ~ 12-13 spins, Hilbert dim 4k-8k): a host
eigendecomposition would dominate the runtime, so instead the step operator
for ONE output interval is built on-device and the whole trace is advanced by
blocked matmuls:

  1. U = exp(-i H dt) via scaling-and-squaring with a degree-`K` Taylor core
     (Paterson–Stockmeyer evaluation).  Only matmuls and adds — no linear
     solves — so it runs entirely in (re, im) float64 pairs on the MXU.
  2. The first `B` output states are built by sequential U-matvecs, then
     U_B = U^B advances whole (dim x B) blocks: states_{k+1} = U_B @ states_k.
     Work is T * dim^2 MACs in MXU-shaped matmuls instead of the reference's
     ~3e6 ODE steps/sim (sweep_sea_detuning.py:1247-1250).

Unitarity keeps rounding benign: each squaring/propagation multiplies by a
unitary (to ~1e-15), so errors grow linearly, staying ~1e-12 over 2e4 steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, matmul
from ..ops.embed import OperatorSum
from .krylov import spectral_norm_bound
from .observables import site_xyz_expectations, state_norms

_TAYLOR_DEGREE = 16
_TAYLOR_THETA = 1.0  # scale so that ||A|| * dt / 2^s <= theta


def _cplx_eye(dim: int) -> Cplx:
    return Cplx(jnp.eye(dim), jnp.zeros((dim, dim)))


def _taylor_expm(A: Cplx, degree: int = _TAYLOR_DEGREE) -> Cplx:
    """exp(A) by Horner-evaluated truncated Taylor (||A|| <= ~1)."""
    dim = A.shape[0]
    acc = _cplx_eye(dim)
    # Horner: exp(A) ~ I + A(I + A/2 (I + A/3 (...)))
    for k in range(degree, 0, -1):
        acc = _cplx_eye(dim) + matmul(A, acc) * (1.0 / k)
    return acc


@partial(jax.jit, static_argnames=("n_squarings", "degree"))
def _expm_scaled(Hre, Him, dt_scaled: float, n_squarings: int, degree: int = _TAYLOR_DEGREE):
    """exp(-i H dt) with dt = dt_scaled * 2^n_squarings."""
    A = Cplx(Him * dt_scaled, -Hre * dt_scaled)  # -i * H * dt_scaled
    U = _taylor_expm(A, degree)
    for _ in range(n_squarings):
        U = matmul(U, U)
    return U.re, U.im


def build_step_operator(H: OperatorSum, dt: float) -> Cplx:
    """Dense U = exp(-i H dt) on device."""
    Hd = H.to_dense()
    norm = spectral_norm_bound(H)
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _TAYLOR_THETA))))
    dt_scaled = dt / (2**n_sq)
    Ure, Uim = _expm_scaled(
        jnp.asarray(Hd.real), jnp.asarray(Hd.imag), dt_scaled, n_sq
    )
    return Cplx(Ure, Uim)


@partial(jax.jit, static_argnames=("n_blocks", "block", "dims"))
def _propagate_blocks(U: Cplx, psi0: Cplx, n_blocks: int, block: int, dims):
    """All output states by blocked stepping; returns per-block observables."""
    # seed block: psi(0), U psi(0), ..., U^{B-1} psi(0)
    def seed_body(p, _):
        nxt = Cplx(
            U.re @ p.re - U.im @ p.im,
            U.re @ p.im + U.im @ p.re,
        )
        return nxt, p

    _, seeds = jax.lax.scan(seed_body, psi0, None, length=block)
    S0 = Cplx(seeds.re.T, seeds.im.T)  # (dim, B)

    # U_B = U^block by repeated squaring/multiplication (block is static)
    UB = _matrix_power(U, block)

    def blk_body(S, _):
        xyz = site_xyz_expectations(S, dims)
        nrm = state_norms(S)
        nxt = matmul(UB, S)
        return nxt, (xyz, nrm)

    _, (xyzs, nrms) = jax.lax.scan(blk_body, S0, None, length=n_blocks)
    return xyzs, nrms  # (n_blocks, n, 3, B), (n_blocks, B)


def _matrix_power(U: Cplx, p: int) -> Cplx:
    result = None
    base = U
    while p > 0:
        if p & 1:
            result = base if result is None else matmul(result, base)
        p >>= 1
        if p:
            base = matmul(base, base)
    return result


def expm_propagate_traces(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    block: int = 128,
) -> dict[str, np.ndarray]:
    """Observable traces via the dense step operator (uniform grid required)."""
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("expm stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0

    block = min(block, T)
    n_blocks = int(np.ceil(T / block))
    U = build_step_operator(H, dt)
    xyzs, nrms = _propagate_blocks(U, Cplx.from_numpy(psi0), n_blocks, block, dims)
    # (n_blocks, n, 3, B) -> (n, 3, n_blocks * B), trimmed to T
    xyz = np.moveaxis(np.asarray(xyzs), 0, 2).reshape(
        xyzs[0].shape[0], 3, n_blocks * block
    )[..., :T]
    norm = np.asarray(nrms).reshape(-1)[:T]
    # energy: <H> at t=0 is conserved (unitary propagation of a
    # time-independent H); report the exact constant for diagnostics.
    p0 = Cplx.from_numpy(psi0)
    hp = H.apply(p0)
    e0 = float(np.asarray(jnp.sum(p0.re * hp.re + p0.im * hp.im)))
    return {"site_xyz": xyz, "norm": norm, "energy": np.full(T, e0)}
