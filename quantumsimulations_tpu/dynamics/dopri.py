"""Adaptive Dormand–Prince (DoPri5) Schrödinger integrator.

The exact eig/expm/krylov propagators cover the reference's production case
(time-INdependent rotating-frame H).  This stepper is the general path for
time-dependent Hamiltonians — the lab-frame cosine-drive form

    H(t) = H0 + sum_k f_k(t) * V_k

that QuTiP would express as ``sesolve([H0, [V, 'cos(w t)']])`` — and doubles
as an in-framework cross-check of the exact steppers at the reference's
tolerances (atol=1e-10 / rtol=1e-9, sweep_sea_detuning.py:1247-1250).

Structure: classic embedded 5(4) pair with PI step-size control, implemented
as a single ``lax.while_loop`` whose carry holds the integration state and a
cursor into the output grid; dense output (4th-order Hermite interpolation)
fills trace samples as steps fly past them, so output never forces tiny
steps.  Everything is static-shaped and jit-safe — no Python control flow on
traced values.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx
from ..ops.embed import OperatorSum
from .observables import site_xyz_expectations, state_norms

# Dormand–Prince 5(4) tableau
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = _A[6, :7].copy()  # 5th-order solution (FSAL)
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40])


class TimeDependentHamiltonian:
    """H(t) = H0 + sum_k f_k(t) V_k with term-IR pieces.

    ``coeff_fns`` are jittable scalar functions of t (e.g. lambda t:
    jnp.cos(w * t)); the QuTiP-style [H0, [V, cos]] list maps directly.
    """

    def __init__(
        self,
        H0: OperatorSum,
        pieces: Sequence[tuple[OperatorSum, Callable]] = (),
    ):
        self.H0 = H0
        self.pieces = tuple(pieces)
        self._diag0 = None

    def apply(self, psi: Cplx, t) -> Cplx:
        if self._diag0 is None:
            self._diag0 = jnp.asarray(self.H0.diagonal_part())
        out = self.H0.apply(psi, diag=self._diag0)
        for V, fn in self.pieces:
            out = out + V.apply(psi) * fn(t)
        return out


def _rhs_factory(H) -> Callable:
    """psi' = -i H(t) psi in pair form."""
    if isinstance(H, OperatorSum):
        diag = jnp.asarray(H.diagonal_part())
        apply_h = lambda psi, t: H.apply(psi, diag=diag)
    else:
        apply_h = H.apply

    def rhs(psi: Cplx, t) -> Cplx:
        hp = apply_h(psi, t)
        return Cplx(hp.im, -hp.re)  # -i * (re + i im) = im - i re

    return rhs


@partial(jax.jit, static_argnames=("rhs", "dims", "n_out"))
def _dopri_integrate(psi0: Cplx, t_out, atol, rtol, max_step, rhs, dims, n_out):
    dim = psi0.shape[0]
    t0 = t_out[0]
    t_end = t_out[-1]

    k0 = rhs(psi0, t0)
    # initial step heuristic
    d0 = jnp.sqrt(jnp.sum(psi0.abs2()) / dim)
    d1 = jnp.sqrt(jnp.sum(k0.abs2()) / dim)
    h0 = jnp.where(d1 > 1e-12, 0.01 * d0 / jnp.maximum(d1, 1e-300), 1e-6)
    h0 = jnp.minimum(jnp.minimum(h0, max_step), t_end - t0)

    A = [jnp.asarray(row) for row in _A]
    B5 = jnp.asarray(_B5)
    B4 = jnp.asarray(_B4)
    C = jnp.asarray(_C)

    def attempt_step(psi, t, h, k_first):
        ks_re = jnp.zeros((7, dim))
        ks_im = jnp.zeros((7, dim))
        ks_re = ks_re.at[0].set(k_first.re)
        ks_im = ks_im.at[0].set(k_first.im)
        for i in range(1, 7):
            acc_re = A[i][:i] @ ks_re[:i]
            acc_im = A[i][:i] @ ks_im[:i]
            yi = Cplx(psi.re + h * acc_re, psi.im + h * acc_im)
            ki = rhs(yi, t + C[i] * h)
            ks_re = ks_re.at[i].set(ki.re)
            ks_im = ks_im.at[i].set(ki.im)
        y5 = Cplx(psi.re + h * (B5 @ ks_re), psi.im + h * (B5 @ ks_im))
        y4_re = psi.re + h * (B4 @ ks_re)
        y4_im = psi.im + h * (B4 @ ks_im)
        err_re = y5.re - y4_re
        err_im = y5.im - y4_im
        sc = atol + rtol * jnp.sqrt(
            jnp.maximum(psi.abs2(), y5.abs2())
        )
        err = jnp.sqrt(jnp.mean((err_re**2 + err_im**2) / sc**2))
        # a NaN error (diverging state, overflowing coefficient function)
        # must act as a hard reject, not poison the controller
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        k_last = Cplx(ks_re[6], ks_im[6])  # FSAL: k7 = f(t+h, y5)
        return y5, err, k_last, (ks_re, ks_im)

    out_xyz0 = jnp.zeros((n_out, len(dims), 3))
    out_norm0 = jnp.zeros(n_out)

    def record(outs, idx, psi):
        out_xyz, out_norm = outs
        col = psi.reshape(psi.shape + (1,))
        xyz = site_xyz_expectations(col, dims)[..., 0]
        nrm = state_norms(col)[0]
        return out_xyz.at[idx].set(xyz), out_norm.at[idx].set(nrm)

    outs0 = record((out_xyz0, out_norm0), 0, psi0)

    h_floor = jnp.maximum((t_end - t0) * 1e-15, 1e-300)

    def cond(carry):
        t, psi, h, k, outs, out_idx, n_acc, n_rej = carry
        # guards against step-size collapse (incompatible frequencies, NaN
        # divergence): once h shrinks to the floor or the step budget runs
        # out, the loop exits; the unfilled tail of the trace stays at its
        # zero initialization with n_accepted/n_rejected exposing the stall
        return (
            (out_idx < n_out)
            & (t < t_end)
            & (h > h_floor)
            & (n_acc + n_rej < 20_000_000)
        )

    def body(carry):
        t, psi, h, k, outs, out_idx, n_acc, n_rej = carry
        h = jnp.minimum(h, t_end - t)
        y_new, err, k_last, (ks_re, ks_im) = attempt_step(psi, t, h, k)
        accept = err <= 1.0
        # PI controller
        fac = jnp.clip(0.9 * jnp.power(jnp.maximum(err, 1e-16), -0.2), 0.2, 5.0)
        h_next = jnp.minimum(h * fac, max_step)

        def fill(outs, out_idx):
            # DOPRI5 4th-order dense output (Hairer's contd5): matches the
            # solution order between accepted steps, so output sampling never
            # degrades the tolerance.
            d = jnp.asarray(
                [
                    -12715105075.0 / 11282082432.0,
                    0.0,
                    87487479700.0 / 32700410799.0,
                    -10690763975.0 / 1880347072.0,
                    701980252875.0 / 199316789632.0,
                    -1453857185.0 / 822651844.0,
                    69997945.0 / 29380423.0,
                ]
            )
            r1_re, r1_im = psi.re, psi.im
            r2_re, r2_im = y_new.re - psi.re, y_new.im - psi.im
            r3_re = h * ks_re[0] - r2_re
            r3_im = h * ks_im[0] - r2_im
            r4_re = r2_re - h * ks_re[6] - r3_re
            r4_im = r2_im - h * ks_im[6] - r3_im
            r5_re = h * (d @ ks_re)
            r5_im = h * (d @ ks_im)

            def inner(state):
                outs, oi = state
                th = (t_out[jnp.minimum(oi, n_out - 1)] - t) / h
                th1 = 1.0 - th
                pi_re = r1_re + th * (r2_re + th1 * (r3_re + th * (r4_re + th1 * r5_re)))
                pi_im = r1_im + th * (r2_im + th1 * (r3_im + th * (r4_im + th1 * r5_im)))
                outs = record(outs, oi, Cplx(pi_re, pi_im))
                return outs, oi + 1

            def cond_i(state):
                _, oi = state
                return (oi < n_out) & (t_out[jnp.minimum(oi, n_out - 1)] <= t + h + 1e-300)

            return jax.lax.while_loop(cond_i, inner, (outs, out_idx))

        outs2, out_idx2 = jax.lax.cond(
            accept, fill, lambda o, i: (o, i), outs, out_idx
        )
        t2 = jnp.where(accept, t + h, t)
        psi2 = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), y_new, psi)
        k2 = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), k_last, k)
        return (
            t2,
            psi2,
            h_next,
            k2,
            outs2,
            out_idx2,
            n_acc + accept.astype(jnp.int64),
            n_rej + (~accept).astype(jnp.int64),
        )

    init = (t0, psi0, h0, k0, outs0, jnp.asarray(1, jnp.int64),
            jnp.asarray(0, jnp.int64), jnp.asarray(0, jnp.int64))
    t, psi, h, k, outs, out_idx, n_acc, n_rej = jax.lax.while_loop(cond, body, init)
    out_xyz, out_norm = outs
    return out_xyz, out_norm, n_acc, n_rej


def dopri_propagate_traces(
    H,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    atol: float = 1e-10,
    rtol: float = 1e-9,
    max_step: float | None = None,
) -> dict[str, np.ndarray]:
    """Adaptive-step traces; H may be an OperatorSum or TimeDependentHamiltonian."""
    times = np.asarray(times, dtype=np.float64)
    rhs = _rhs_factory(H)
    if max_step is None:
        max_step = float(times[-1] - times[0])
    out_xyz, out_norm, n_acc, n_rej = _dopri_integrate(
        Cplx.from_numpy(psi0),
        jnp.asarray(times),
        atol,
        rtol,
        max_step,
        rhs,
        dims,
        len(times),
    )
    xyz = np.moveaxis(np.asarray(out_xyz), 0, -1)  # (n, 3, T)
    result = {
        "site_xyz": xyz,
        "norm": np.asarray(out_norm),
        "n_accepted": int(n_acc),
        "n_rejected": int(n_rej),
    }
    # energy trace only defined for time-independent H
    if isinstance(H, OperatorSum):
        p0 = Cplx.from_numpy(psi0)
        hp = H.apply(p0)
        e0 = float(np.asarray(jnp.sum(p0.re * hp.re + p0.im * hp.im)))
        result["energy"] = np.full(len(times), e0)
    return result
