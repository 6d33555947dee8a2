"""Lab-frame cosine-drive model: exact-oracle parity and RWA consistency."""

import numpy as np
import scipy.linalg
from scipy.integrate import solve_ivp

from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.labframe import build_lab_frame_model, simulate_lab_frame
from quantumsimulations_tpu.models.params import DipolarRareParams


def _params(**kw):
    # scaled-down frequencies so lab-frame integration is cheap in a test
    gamma = 1.0e5
    B0 = 1.0  # omega_z = 1e5 rad/s
    f1 = 1.0e3  # omega1 = 2*pi*1e3
    base = dict(
        n_sea=2,
        gamma_sea=gamma,
        gamma_rare=gamma * 0.8,
        B0_sea=B0,
        B0_rare=B0,
        B1_sea=2 * np.pi * f1 / gamma,
        B1_rare=2 * np.pi * f1 / (gamma * 0.8),
        phi_sea=0.3,
        phi_rare=1.1,
        # couplings scale as gamma^2: with gamma 818x below the physical
        # value, boost the scale ~7e5 so |b| stays in the kHz regime
        dipolar_scale=1e-7 * 1.054571817e-34 * 7e5,
        shell_scale=0.282393e-9,
        t_final=2.0e-3,
        steps=81,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )
    base.update(kw)
    return DipolarRareParams(**base)


def test_lab_frame_matches_scipy_oracle():
    params = _params()
    model = build_model(params)
    Ht, freqs = build_lab_frame_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)

    # dense oracle of the identical H(t)
    H0 = Ht.H0.to_dense()
    Vs = [(V.to_dense(), fn) for V, fn in Ht.pieces]
    dim = H0.shape[0]

    def rhs(tt, y):
        psi = y[:dim] + 1j * y[dim:]
        H = H0.copy()
        for Vd, fn in Vs:
            H = H + float(fn(tt)) * Vd
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    sol = solve_ivp(
        rhs, (0, params.t_final),
        np.concatenate([model.psi0.real, model.psi0.imag]),
        t_eval=t, method="DOP853", rtol=1e-12, atol=1e-14,
    )
    assert sol.success
    psis = sol.y[:dim] + 1j * sol.y[dim:]

    t2, traces = simulate_lab_frame(params, atol=1e-12, rtol=1e-11)
    from quantumsimulations_tpu.ops.spin import spin_matrix

    def embed(op, site):
        out = np.array([[1.0 + 0j]])
        for k, d in enumerate(model.dims):
            out = np.kron(out, op if k == site else np.eye(d, dtype=complex))
        return out

    Iz_sea = sum(embed(spin_matrix(0.5, "z"), j) for j in range(model.n_sea_effective))
    want = np.real(np.einsum("it,ij,jt->t", psis.conj(), Iz_sea, psis))
    assert np.allclose(traces["Iz_sea"], want, atol=1e-7)
    assert np.allclose(traces["state_norm"], 1.0, atol=1e-8)


def test_lab_frame_rwa_matches_rotating_frame():
    """On-resonance lab-frame evolution ~ rotating-frame evolution of <Iz>
    (Iz is invariant under the frame rotation; RWA error ~ omega1/omega_z)."""
    from quantumsimulations_tpu.dynamics.evolve import simulate_rare

    # make RWA accurate: omega1/omega_z = 2*pi*50/1e5 ~ 3e-3
    params = _params(
        B1_sea=2 * np.pi * 50.0 / 1.0e5,
        B1_rare=2 * np.pi * 50.0 / 0.8e5,
        dipolar_scale=0.0,  # isolate the drive physics
        shell_scale=1.0,
        t_final=5.0e-3,
        steps=101,
    )
    t, lab = simulate_lab_frame(params, atol=1e-12, rtol=1e-11)
    t2, rot = simulate_rare(params)
    # Iz commutes with the rotating-frame transformation exp(-i w t Sz)
    assert np.allclose(lab["Iz_sea"], rot["Iz_sea"], atol=5e-3)
    assert np.allclose(lab["Iz_R"], rot["Iz_R"], atol=5e-3)
    # and the dynamics is nontrivial
    assert rot["Iz_sea"].max() - rot["Iz_sea"].min() > 0.1
