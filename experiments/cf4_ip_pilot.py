"""Pilot: interaction-picture CF4 (commutator-free quasi-Magnus) stepper.

Round-2 design question (docs/ROUND1.md item 3): for N=14-16 baths the plain
Krylov stepper needs ||H||*dt ~ 1e4 rad of substepping per output interval
because the single-site detuning+drive terms dominate ||H||.  In the
interaction picture w.r.t. the single-site part H_loc (whose propagator is a
product of 2x2 rotations), only the dipolar norm remains:

    psi(t) = U0(t) phi(t),   i phi' = H_I(t) phi,  H_I = U0^dag W U0

This script measures, at a small dense size, how the 4th-order
commutator-free integrator's error scales with the substep count for ONE
production output interval (dt = 1.5 ms), answering: how many substeps (and
hence Krylov applies) would a production N=12+ trace need per output point?

CF4 (Blanes/Moan, two-exponential form):
    phi_{n+1} = exp(-i h (x1 A + x2 B)) exp(-i h (x2 A + x1 B)) phi_n
    A = H_I(t_n + c1 h), B = H_I(t_n + c2 h),
    c_{1,2} = 1/2 -/+ sqrt(3)/6 (Gauss nodes), x1 = 1/4 - sqrt(3)/6,
    x2 = 1/4 + sqrt(3)/6.

Run:  python experiments/cf4_ip_pilot.py
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.linalg

sys.path.insert(0, ".")

from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402
from quantumsimulations_tpu.models.params import (  # noqa: E402
    GAMMA_27AL,
    GAMMA_71GA,
    DipolarRareParams,
)
from quantumsimulations_tpu.ops.embed import OperatorSum  # noqa: E402


def split_hamiltonian(H: OperatorSum):
    """(H_loc single-site terms, W multi-site terms) as dense matrices."""
    loc = [t for t in H.terms if len(t.factors) == 1]
    dip = [t for t in H.terms if len(t.factors) > 1]
    H_loc = OperatorSum(H.dims, tuple(loc)).to_dense()
    W = OperatorSum(H.dims, tuple(dip)).to_dense()
    return H_loc, W


def main() -> None:
    B0 = 3.0
    f_Az = GAMMA_71GA * B0 / (2 * np.pi)
    f1A = 50e3
    delta = 150e3  # worst-case detuning of the production sweep
    p = DipolarRareParams(
        n_sea=5,
        gamma_sea=GAMMA_71GA,
        gamma_rare=GAMMA_27AL,
        B0_sea=B0,
        B0_rare=B0,
        B1_sea=2 * np.pi * f1A / GAMMA_71GA,
        B1_rare=2 * np.pi * 70710.678 / GAMMA_27AL,
        omega_rf_sea=2 * np.pi * (f_Az - delta),
        omega_rf_rare=GAMMA_27AL * B0,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )
    model = build_model(p)
    H_loc, W = split_hamiltonian(model.hamiltonian)
    H = H_loc + W
    dim = H.shape[0]
    norm_loc = np.linalg.norm(H_loc, 2)
    norm_W = np.linalg.norm(W, 2)
    dt_out = 30.0 / 20000  # production output interval
    print(f"dim={dim}  ||H_loc||={norm_loc:.3e}  ||W||={norm_W:.3e} rad/s")
    print(f"dt_out={dt_out:.2e} s: ||H||*dt={np.linalg.norm(H,2)*dt_out:.1f}, "
          f"||W||*dt={norm_W*dt_out:.3f} rad")

    psi0 = model.psi0
    # exact over one output interval
    U_exact = scipy.linalg.expm(-1j * H * dt_out)
    psi_exact = U_exact @ psi0

    # interaction-picture pieces
    wloc, Vloc = np.linalg.eigh(H_loc)

    def U0(t):
        return (Vloc * np.exp(-1j * wloc * t)) @ Vloc.conj().T

    def H_I(t):
        u = U0(t)
        return u.conj().T @ W @ u

    s3 = np.sqrt(3.0)
    c1, c2 = 0.5 - s3 / 6, 0.5 + s3 / 6
    x1, x2 = 0.25 - s3 / 6, 0.25 + s3 / 6

    print(f"\n{'substeps':>9} {'CF4-IP error':>14} {'Krylov applies*':>16}")
    for n_sub in (1, 2, 4, 8, 16, 32):
        h = dt_out / n_sub
        phi = psi0.copy()
        t = 0.0
        for _ in range(n_sub):
            A = H_I(t + c1 * h)
            Bm = H_I(t + c2 * h)
            phi = scipy.linalg.expm(-1j * h * (x2 * A + x1 * Bm)) @ (
                scipy.linalg.expm(-1j * h * (x1 * A + x2 * Bm)) @ phi
            )
            t += h
        psi_cf4 = U0(dt_out) @ phi
        err = np.abs(psi_cf4 - psi_exact).max()
        # each CF4 substep = 2 Krylov expms; m ~ 15 applies each at ||W||h<1
        print(f"{n_sub:>9d} {err:>14.3e} {n_sub * 2 * 15:>16d}")

    print("\n* estimated matrix-free H_I applies per output interval at m=15;")
    print("  compare: plain Krylov needs ~n_sub(theta=12) ="
          f" {int(np.ceil(np.linalg.norm(H,2)*dt_out/12))} substeps x ~48 applies.")


if __name__ == "__main__":
    main()
