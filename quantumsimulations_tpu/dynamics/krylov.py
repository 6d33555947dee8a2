"""Krylov (Lanczos) expm-multiply stepper — matrix-free propagation.

For Hilbert spaces too large to eigendecompose (or to hold a dense step
operator), psi(t+dt) = exp(-i H dt) psi is evaluated in a Krylov subspace:
Lanczos builds an orthonormal basis V_m and a real symmetric tridiagonal T_m
(H is Hermitian, so the projected matrix is real tridiagonal up to rounding);
then

    psi' ≈ ||psi|| * V_m @ expm(-i dt T_m) e_1

with expm of the tiny (m x m) tridiagonal done by on-device eigh.  The
Hamiltonian is applied matrix-free through the term IR (ops/embed.py), so the
memory footprint is O(m * dim) and every operation is jit/shard-compatible —
this is the stepper that scales to sharded 14-16 spin baths (SURVEY.md §5
"long-context" slot; replaces QuTiP's adaptive zvode at
dipolar_ensemble_with_rare.py:653).

Accuracy: the Lanczos approximation converges superlinearly once
m >~ ||H||*dt; we substep so that ||H||*dt_sub <= KRYLOV_THETA and use a
fixed m, which keeps everything static-shaped for XLA.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx
from ..ops.embed import OperatorSum, local_op
from .observables import site_xyz_expectations, state_norms

KRYLOV_M = 48
KRYLOV_THETA = 12.0  # max ||H|| * dt per substep


def default_matrix_free_apply(H: OperatorSum):
    """psi -> H psi closure for single-chip matrix-free stepping.

    Prefers the qubit flip-apply (ops/embed.py::make_qubit_flip_apply):
    reverse + broadcast-multiply programs that the TPU backend compiles
    cleanly at any dim — the generic rank-n einsum apply stalls the remote
    compiler indefinitely at dim >= 8192 (the round-2 'Krylov worker crash').
    Falls back to the generic apply for non-qubit dims / exotic terms."""
    from ..ops.embed import make_qubit_flip_apply

    diag = jnp.asarray(H.diagonal_part())
    fa = make_qubit_flip_apply(H)
    if fa is not None:
        return lambda psi: fa(psi, diag)
    return lambda psi: H.apply(psi, diag=diag)


def spectral_norm_bound(H: OperatorSum) -> float:
    """Cheap upper bound: sum_k |coeff_k| * prod ||op||_2 over the factors."""
    total = 0.0
    for term in H.terms:
        nrm = abs(term.coeff)
        for site, which in term.factors:
            op = local_op(H.dims[site], which)
            nrm *= float(np.linalg.norm(op, 2))
        total += nrm
    return total


def spectral_norm_estimate(H: OperatorSum, iters: int = 40, seed: int = 0) -> float:
    """||H||_2 estimate by matrix-free power iteration (H is Hermitian).

    The triangle-inequality bound above overestimates by 2-4x for this
    problem's Hamiltonians; every factor of 2 costs the expm path one extra
    squaring (doubling its rounding amplification), so the scaling decision
    uses this estimate (inflated by a small safety margin).
    """
    import jax

    rng = np.random.default_rng(seed)
    dim = H.dim
    v = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    apply_h = default_matrix_free_apply(H)

    # ONE device program: a per-iteration dispatch loop costs seconds of
    # relay round-trip latency per step through the TPU tunnel.
    @partial(jax.jit, static_argnames=("n",))
    def power(re, im, n: int):
        def body(_, carry):
            re, im, _ = carry
            out = apply_h(Cplx(re, im))
            nrm = jnp.sqrt(jnp.sum(out.abs2()))
            return out.re / nrm, out.im / nrm, nrm

        return jax.lax.fori_loop(0, n, body, (re, im, jnp.asarray(0.0)))

    _, _, nrm = power(jnp.asarray(v.real), jnp.asarray(v.imag), iters)
    # power iteration converges from below for the dominant |eigenvalue|
    return float(nrm) * 1.05


@partial(jax.jit, static_argnames=("iters",))
def _dense_power(h_re, h_im, v_re, v_im, iters: int):
    def body(_, carry):
        re, im, _ = carry
        ore = h_re @ re - h_im @ im
        oim = h_re @ im + h_im @ re
        nrm = jnp.sqrt(jnp.sum(ore * ore + oim * oim))
        return ore / nrm, oim / nrm, nrm

    return jax.lax.fori_loop(0, iters, body, (v_re, v_im, jnp.asarray(0.0, v_re.dtype)))


def spectral_norm_estimate_dense(
    Hd: np.ndarray, iters: int = 40, seed: int = 0
) -> float:
    """||H||_2 estimate by f32 power iteration on the dense matrix.

    For paths that densify H anyway (eig/expm), this replaces the term-IR
    power iteration: the compiled program is a single complex matvec in a
    fori_loop — negligible compile time, one dispatch, and f32 is plenty for
    a scaling decision (inflated 5% like the matrix-free estimate).
    """
    rng = np.random.default_rng(seed)
    dim = Hd.shape[0]
    v = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    _, _, nrm = _dense_power(
        jnp.asarray(Hd.real, jnp.float32),
        jnp.asarray(Hd.imag, jnp.float32),
        jnp.asarray(v.real, jnp.float32),
        jnp.asarray(v.imag, jnp.float32),
        iters,
    )
    return float(nrm) * 1.05


_SMALL_EXPM_THETA = 0.25  # ||A||/2^s target for the small-matrix Taylor
_SMALL_EXPM_DEGREE = 12  # truncation (0.25^13/13!) ~ 2e-18


def _expm_n_squarings(x: float) -> int:
    """Static squaring count so ||(-i dt T)/2^s|| <= _SMALL_EXPM_THETA,
    given the static bound x >= ||T|| * |dt| (Lanczos T inherits ||T|| <=
    ||H||_2)."""
    return max(0, int(np.ceil(np.log2(max(x, 1e-30) / _SMALL_EXPM_THETA))))


def _tridiag_expm_e1(alphas, betas, dt, n_sq: int, degree: int = _SMALL_EXPM_DEGREE):
    """(re, im) of y = expm(-i dt T) e1 for the small real tridiagonal T.

    Pure matmuls: scaling-and-squaring around a Horner-evaluated Taylor core
    in (re, im) f64 pairs.  Replaces the previous on-device
    ``jnp.linalg.eigh(T)`` — the small f64 eigh inside the substep program
    reproducibly crashed the TPU worker once the surrounding program carried
    dim >= 8192 state buffers (see docs/ROUND2.md handoff item 2), while
    plain matmul programs at those sizes are solid.  18-ish (m x m) matmuls
    of m ~ 48 are negligible next to one H apply, and the routine is
    shard_map-safe (computed redundantly per device, no collectives).
    """
    m = alphas.shape[0]
    T = jnp.diag(alphas) + jnp.diag(betas[: m - 1], 1) + jnp.diag(betas[: m - 1], -1)
    eye = jnp.eye(m, dtype=T.dtype)
    Aim = T * (-dt / (2.0**n_sq))  # A = -i dt_s T: A_re = 0
    # Horner: U = I + A(I + A/2 (I + A/3 (...))) with purely-imaginary A
    acc_re, acc_im = eye, jnp.zeros_like(T)
    for k in range(degree, 0, -1):
        acc_re, acc_im = eye - (Aim @ acc_im) / k, (Aim @ acc_re) / k
    for _ in range(n_sq):
        acc_re, acc_im = (
            acc_re @ acc_re - acc_im @ acc_im,
            acc_re @ acc_im + acc_im @ acc_re,
        )
    return acc_re[:, 0], acc_im[:, 0]


def _lanczos_expm_substep(
    apply_h: Callable[[Cplx], Cplx],
    psi: Cplx,
    dt: float,
    m: int,
    axis_name: str | None = None,
    n_sq: int = 6,  # covers ||H||*dt <= 16 (> KRYLOV_THETA)
    breakdown_tol: float = 0.0,
):
    """One exp(-i H dt) application via an m-dim Lanczos subspace.

    With ``axis_name`` set this runs on a SHARDED statevector inside
    shard_map: every inner product is psum-reduced over the state axis while
    the small (m x m) tridiagonal exponential is computed redundantly on
    every device.

    ``breakdown_tol`` (callers pass ~1e-13 * ||H||) handles happy breakdown
    (the Krylov space closes before m vectors, e.g. m > dim or an invariant
    subspace): a beta at/below the tolerance is stored as EXACTLY 0 and the
    recurrence freezes (v_{j+1} = 0), so T decouples cleanly.  Without the
    clamp, dividing by a ~1e-26 beta fills V with garbage whose betas grow
    geometrically (observed up to 1e38) — harmless to the old eigh-based
    exponential but fatal (overflow) to the Taylor/squaring one.
    """

    def _allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    dim = psi.shape[0]
    nrm0 = jnp.sqrt(_allsum(jnp.sum(psi.abs2())))
    safe = jnp.where(nrm0 > 0, nrm0, 1.0)
    v0 = Cplx(psi.re / safe, psi.im / safe)

    Vr = jnp.zeros((m, dim))
    Vi = jnp.zeros((m, dim))
    Vr = Vr.at[0].set(v0.re)
    Vi = Vi.at[0].set(v0.im)
    alphas = jnp.zeros(m)
    betas = jnp.zeros(m)  # betas[j] = beta_{j+1} (subdiagonal)

    def body(j, carry):
        Vr, Vi, alphas, betas = carry
        v = Cplx(Vr[j], Vi[j])
        w = apply_h(v)
        # alpha_j = <v_j | w> (real for Hermitian H)
        alpha = _allsum(jnp.sum(v.re * w.re + v.im * w.im))
        w = Cplx(w.re - alpha * v.re, w.im - alpha * v.im)
        vp_re = jnp.where(j > 0, Vr[jnp.maximum(j - 1, 0)], jnp.zeros(dim))
        vp_im = jnp.where(j > 0, Vi[jnp.maximum(j - 1, 0)], jnp.zeros(dim))
        beta_prev = jnp.where(j > 0, betas[jnp.maximum(j - 1, 0)], 0.0)
        w = Cplx(w.re - beta_prev * vp_re, w.im - beta_prev * vp_im)
        # full reorthogonalization (cheap vs apply_h; crucial for 1e-12 accuracy)
        mask = (jnp.arange(m) <= j).astype(w.re.dtype)
        proj_re = _allsum(Vr @ w.re + Vi @ w.im) * mask
        proj_im = _allsum(Vr @ w.im - Vi @ w.re) * mask
        w = Cplx(
            w.re - proj_re @ Vr + proj_im @ Vi,
            w.im - proj_re @ Vi - proj_im @ Vr,
        )
        beta = jnp.sqrt(_allsum(jnp.sum(w.abs2())))
        beta = jnp.where(beta > breakdown_tol, beta, 0.0)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)
        inv = jnp.where(beta > 0, 1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
        nxt = jnp.minimum(j + 1, m - 1)
        Vr = Vr.at[nxt].set(jnp.where(j + 1 < m, w.re * inv, Vr[nxt]))
        Vi = Vi.at[nxt].set(jnp.where(j + 1 < m, w.im * inv, Vi[nxt]))
        return Vr, Vi, alphas, betas

    Vr, Vi, alphas, betas = jax.lax.fori_loop(0, m, body, (Vr, Vi, alphas, betas))

    # y = expm(-i dt T) e1 of the small real tridiagonal (matmuls only)
    yr, yi = _tridiag_expm_e1(alphas, betas, dt, n_sq)
    out_re = yr @ Vr - yi @ Vi
    out_im = yr @ Vi + yi @ Vr
    return Cplx(out_re * nrm0, out_im * nrm0)


def make_krylov_step(
    H: OperatorSum,
    dt: float,
    m: int = KRYLOV_M,
    theta: float = KRYLOV_THETA,
    apply_h: Callable[[Cplx], Cplx] | None = None,
    norm_bound: float | None = None,
    axis_name: str | None = None,
):
    """Build a jittable psi -> exp(-i H dt) psi step (with static substepping).

    ``apply_h`` may be overridden (e.g. with a sharded apply under shard_map,
    together with ``axis_name`` for psum-reduced inner products); by default
    the term-IR matrix-free apply is used.
    """
    if norm_bound is None:
        norm_bound = spectral_norm_bound(H)
    n_sub = max(1, int(np.ceil(norm_bound * abs(dt) / theta)))
    dt_sub = dt / n_sub
    # one extra squaring of margin: ||T|| can slightly exceed the (possibly
    # power-iteration-estimated) norm_bound
    n_sq = _expm_n_squarings(2.0 * norm_bound * abs(dt_sub))
    bd_tol = 1e-13 * norm_bound
    if apply_h is None:
        apply_h = default_matrix_free_apply(H)

    def substeps(psi: Cplx, k: int) -> Cplx:
        def body(_, p):
            return _lanczos_expm_substep(
                apply_h, p, dt_sub, m, axis_name=axis_name, n_sq=n_sq,
                breakdown_tol=bd_tol,
            )

        return jax.lax.fori_loop(0, k, body, psi)

    def step(psi: Cplx) -> Cplx:
        return substeps(psi, n_sub)

    step.substeps = substeps  # for bounded-duration segmented dispatching
    return step, n_sub


def krylov_traces_assembled(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    m: int = KRYLOV_M,
    theta: float = KRYLOV_THETA,
    norm_bound: float | None = None,
) -> np.ndarray:
    """Assembled-observable rows (8, T) by matrix-free Krylov stepping.

    The large-bath single-chip path (N = 14+, where the dense operator no
    longer fits but the statevector is tiny): same row layout as
    eig_traces_assembled_batched (TRACE_ROWS), observables assembled on
    device, transfer flattened (the tunnel moves 1-D arrays fast).  Uses the
    power-iteration norm estimate by default — the triangle-inequality bound
    overestimates by 2-4x and costs that factor in substeps.
    """
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("krylov stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0
    if norm_bound is None:
        norm_bound = min(spectral_norm_bound(H), spectral_norm_estimate(H))
    step, n_sub = make_krylov_step(H, dt, m=m, theta=theta, norm_bound=norm_bound)

    n_sites = len(dims)
    sea_mask = jnp.asarray((np.arange(n_sites) < n_sea_effective).astype(np.float64))
    apply_h = default_matrix_free_apply(H)
    psi_init = Cplx.from_numpy(psi0)
    # <H> is conserved under unitary stepping; record the t=0 constant
    hpsi = apply_h(psi_init)
    e0 = float(np.asarray(jnp.sum(psi_init.re * hpsi.re + psi_init.im * hpsi.im)))

    @partial(jax.jit, static_argnames=("dims_", "idx_rare_", "n_steps"))
    def scan_chunk(psi0_, mask, dims_, idx_rare_, n_steps):
        def body(psi, _):
            st = psi.reshape(psi.shape + (1,))
            xyz = site_xyz_expectations(st, dims_)[..., 0]  # (n, 3)
            nrm = state_norms(st)[0]
            sea = jnp.einsum("j,jo->o", mask, xyz)
            rare = xyz[idx_rare_]
            row = jnp.stack([sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], nrm])
            return step(psi), row

        psi, rows = jax.lax.scan(body, psi0_, None, length=n_steps)
        return rows.reshape(-1), psi  # rows flat for the tunnel

    # bound the Lanczos substeps per device dispatch: at production ||H|| a
    # single all-T program runs for tens of minutes and the TPU tunnel kills
    # it (observed worker crash at n_sea=13); chunked dispatches with host
    # syncs are the same math
    sub_budget = int(os.environ.get("QST_KRYLOV_DISPATCH_SUBSTEPS", "2000"))
    rows = np.empty((8, T))
    rows[7] = e0
    if n_sub <= sub_budget:
        # whole output steps per dispatch
        chunk = max(1, min(T, sub_budget // max(n_sub, 1)))
        flats = []
        psi = psi_init
        done = 0
        while done < T:
            n = int(min(chunk, T - done))
            flat, psi = scan_chunk(psi, sea_mask, dims, idx_rare, n)
            flats.append(np.asarray(flat))
            done += n
        rows[:7] = np.concatenate(flats).reshape(T, 7).T
        return rows

    # one output step exceeds the dispatch budget: segment INSIDE the step
    @partial(jax.jit, static_argnames=("dims_", "idx_rare_"))
    def obs_row(psi, mask, dims_, idx_rare_):
        st = psi.reshape(psi.shape + (1,))
        xyz = site_xyz_expectations(st, dims_)[..., 0]
        nrm = state_norms(st)[0]
        sea = jnp.einsum("j,jo->o", mask, xyz)
        rare = xyz[idx_rare_]
        return jnp.stack([sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], nrm])

    sub_jit = jax.jit(step.substeps, static_argnums=(1,))
    psi = psi_init
    for t in range(T):
        rows[:7, t] = np.asarray(obs_row(psi, sea_mask, dims, idx_rare))
        remaining = n_sub
        while remaining > 0:
            k = int(min(sub_budget, remaining))
            psi = sub_jit(psi, k)
            from ..utils.profiling import fetch_sync

            fetch_sync(psi.re)  # completion, not dispatch acceptance
            remaining -= k
    return rows


def krylov_propagate_traces(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    m: int = KRYLOV_M,
    theta: float = KRYLOV_THETA,
) -> dict[str, np.ndarray]:
    """Observable traces by sequential Krylov stepping over the output grid."""
    times = np.asarray(times)
    if len(times) > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("krylov stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0

    step, _ = make_krylov_step(H, dt, m=m, theta=theta)
    apply_h = default_matrix_free_apply(H)

    @partial(jax.jit, static_argnames=("dims_",))
    def scan_all(psi_init: Cplx, dims_):
        def body(psi, _):
            xyz = site_xyz_expectations(psi.reshape(psi.shape + (1,)), dims_)
            nrm = state_norms(psi.reshape(psi.shape + (1,)))
            hpsi = apply_h(psi)
            energy = jnp.sum(psi.re * hpsi.re + psi.im * hpsi.im)
            nxt = step(psi)
            return nxt, (xyz[..., 0], nrm[0], energy)

        _, (xyzs, nrms, energies) = jax.lax.scan(body, psi_init, None, length=len(times))
        return xyzs, nrms, energies

    xyzs, nrms, energies = scan_all(Cplx.from_numpy(psi0), dims)
    return {
        "site_xyz": np.moveaxis(np.asarray(xyzs), 0, -1),  # (n, 3, T)
        "norm": np.asarray(nrms),
        "energy": np.asarray(energies),
    }
