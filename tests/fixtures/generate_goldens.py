"""Generate committed golden NPZ fixtures for the parity tests.

SURVEY.md §4.2 calls for pre-generated ``qutip.sesolve`` golden traces.  QuTiP
is not installable in this environment (no network egress), so the goldens
are produced by two INDEPENDENT CPU engines instead and cross-checked against
each other at generation time:

  * scipy DOP853 at tighter-than-reference tolerances (rtol=1e-11/atol=1e-12)
    — the same adaptive Runge-Kutta family QuTiP's sesolve wraps
    (dipolar_ensemble_with_rare.py:653 with options from
    sweep_sea_detuning.py:1247-1250);
  * dense numpy eigendecomposition with longdouble phase reduction (exact
    propagator, used alone for the 30 s long-horizon fixture where an ODE
    integration would take hours).

Everything physics-side is built here from scratch with numpy kron chains
following the reference formulas (dipolar_ensemble_with_rare.py:453-606) —
independent of the framework package except for the geometry helpers
(positions/couplings), which are themselves point-by-point tested against
the reference formulas in tests/test_geometry.py.

Run from the repo root (CPU, ~a minute):  python tests/fixtures/generate_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from quantumsimulations_tpu.models.geometry import (  # noqa: E402
    dipolar_couplings_from_positions,
    shell_positions_with_rare_center,
)

HERE = os.path.dirname(os.path.abspath(__file__))

SX = 0.5 * np.array([[0, 1], [1, 0]], dtype=complex)
SY = 0.5 * np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = 0.5 * np.array([[1, 0], [0, -1]], dtype=complex)

GAMMA_SEA, GAMMA_RARE = 8.1812e7, 6.976e7
B0 = 3.0
F_AZ = GAMMA_SEA * B0 / (2 * np.pi)
F1A = 50e3
F1R = float(np.sqrt(F1A**2 + F1A**2))  # Hartmann-Hahn at target detuning f1A


def _j32(which):
    m = np.array([1.5, 0.5, -0.5, -1.5])
    jz = np.diag(m).astype(complex)
    jp = np.zeros((4, 4), dtype=complex)
    jp[np.arange(3), np.arange(1, 4)] = np.sqrt(1.5 * 2.5 - m[1:] * (m[1:] + 1))
    jm = jp.conj().T
    return {"x": 0.5 * (jp + jm), "y": (jp - jm) / 2j, "z": jz}[which]


def _embed(op, site, dims):
    out = np.array([[1.0 + 0j]])
    for k, d in enumerate(dims):
        out = np.kron(out, op if k == site else np.eye(d, dtype=complex))
    return out


def build_case(n_sea, delta_Hz, drive_rare, is_center_rare, spin32, t_final, steps):
    """Reference-semantics H, psi0, observables, params dict."""
    n_total = n_sea + 1
    idx_rare = n_sea
    dims = [2] * n_sea + [4 if spin32 else 2]
    n_sea_eff = n_total if not is_center_rare else n_sea

    omega_rf_sea = 2 * np.pi * (F_AZ - delta_Hz)
    delta_sea = GAMMA_SEA * B0 - omega_rf_sea  # drive_sea always on here
    omega1_sea = 2 * np.pi * F1A
    omega1_rare = 2 * np.pi * F1R
    delta_rare = 0.0  # rare RF on resonance
    phi = np.pi / 2

    rop = {w: (_j32(w) if spin32 else {"x": SX, "y": SY, "z": SZ}[w]) for w in "xyz"}
    sop = {"x": SX, "y": SY, "z": SZ}

    dim = int(np.prod(dims))
    H = np.zeros((dim, dim), dtype=complex)
    # detuning terms (dipolar_ensemble_with_rare.py:504-512)
    if delta_sea != 0.0:
        for j in range(n_sea_eff):
            H += delta_sea * _embed(sop["z"], j, dims)
    if is_center_rare and drive_rare and delta_rare != 0.0:
        H += delta_rare * _embed(rop["z"], idx_rare, dims)
    # static rotating-frame drives (:515-528)
    for j in range(n_sea_eff):
        H += omega1_sea * (
            np.cos(phi) * _embed(sop["x"], j, dims)
            + np.sin(phi) * _embed(sop["y"], j, dims)
        )
    if is_center_rare and drive_rare:
        H += omega1_rare * (
            np.cos(phi) * _embed(rop["x"], idx_rare, dims)
            + np.sin(phi) * _embed(rop["y"], idx_rare, dims)
        )
    # dipolar terms (:559-568): DQ sea-sea, Ising sea-rare
    pos = shell_positions_with_rare_center(n_sea, 0.282393e-9)
    b = dipolar_couplings_from_positions(
        pos, 1e-7 * 1.054571817e-34, GAMMA_SEA,
        GAMMA_RARE if is_center_rare else GAMMA_SEA,
    )
    for i in range(n_total):
        for j in range(i + 1, n_total):
            if i < n_sea_eff and j < n_sea_eff:
                H += b[i, j] * (
                    _embed(sop["z"], i, dims) @ _embed(sop["z"], j, dims)
                    - 0.25 * (
                        _embed(sop["x"], i, dims) @ _embed(sop["x"], j, dims)
                        - _embed(sop["y"], i, dims) @ _embed(sop["y"], j, dims)
                    )
                )
            elif j == idx_rare:
                H += b[i, j] * (
                    _embed(sop["z"], i, dims) @ _embed(rop["z"], idx_rare, dims)
                )

    # initial state (:591-606): sea |down> each, rare top eigenstate of z
    psi0 = np.array([1.0 + 0j])
    down = np.array([0.0, 1.0], dtype=complex)
    for _ in range(n_sea):
        psi0 = np.kron(psi0, down)
    if is_center_rare:
        rare_up = np.zeros(dims[-1], dtype=complex)
        rare_up[0] = 1.0  # m = +1/2 or +3/2 first in this convention
        psi0 = np.kron(psi0, rare_up)
    else:
        psi0 = np.kron(psi0, down)

    # observables (:572-588)
    obs = {}
    for w in "xyz":
        obs[f"I{w}_sea"] = sum(_embed(sop[w], j, dims) for j in range(n_sea_eff))
    for w in "xyz":
        obs[f"I{w}_R"] = _embed(rop[w], idx_rare, dims)

    params = dict(
        n_sea=n_sea, delta_Hz=delta_Hz, drive_rare=drive_rare,
        is_center_rare=is_center_rare, is_spin_three_half=spin32,
        t_final=t_final, steps=steps,
    )
    return H, psi0, obs, params


def evolve_eig(H, psi0, t):
    """Exact dense propagation; longdouble phase reduction for long horizons."""
    w, V = np.linalg.eigh(H)
    c = V.conj().T @ psi0
    theta = np.mod(
        np.asarray(w, np.longdouble)[:, None] * np.asarray(t, np.longdouble)[None, :],
        2 * np.pi,
    ).astype(np.float64)
    amps = c[:, None] * np.exp(-1j * theta)
    return V @ amps  # (dim, T)


def evolve_dop853(H, psi0, t):
    from scipy.integrate import solve_ivp

    dim = H.shape[0]
    y0 = np.concatenate([psi0.real, psi0.imag])

    def rhs(_t, y):
        psi = y[:dim] + 1j * y[dim:]
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    sol = solve_ivp(rhs, (t[0], t[-1]), y0, t_eval=t, method="DOP853",
                    rtol=1e-11, atol=1e-12)
    assert sol.success
    return sol.y[:dim] + 1j * sol.y[dim:]


def traces_of(states, obs):
    out = {}
    for name, O in obs.items():
        out[name] = np.real(np.einsum("it,ij,jt->t", states.conj(), O, states))
    out["state_norm"] = np.linalg.norm(states, axis=0)
    return out


CASES = [
    ("n4_center_on", dict(n_sea=4, delta_Hz=1000.0, drive_rare=True,
                          is_center_rare=True, spin32=False,
                          t_final=0.02, steps=400)),
    ("n4_center_off", dict(n_sea=4, delta_Hz=1000.0, drive_rare=False,
                           is_center_rare=True, spin32=False,
                           t_final=0.02, steps=400)),
    ("n4_shell_off", dict(n_sea=4, delta_Hz=1000.0, drive_rare=False,
                          is_center_rare=False, spin32=False,
                          t_final=0.02, steps=400)),
    ("n3_spin32_on", dict(n_sea=3, delta_Hz=1000.0, drive_rare=True,
                          is_center_rare=True, spin32=True,
                          t_final=0.02, steps=400)),
    ("n5_fib_on", dict(n_sea=5, delta_Hz=25_000.0, drive_rare=True,
                       is_center_rare=True, spin32=False,
                       t_final=0.02, steps=400)),
    ("n6_long30s_on", dict(n_sea=6, delta_Hz=1000.0, drive_rare=True,
                           is_center_rare=True, spin32=False,
                           t_final=30.0, steps=2000)),
]


def main():
    for name, cfg in CASES:
        H, psi0, obs, params = build_case(**cfg)
        t = np.linspace(0.0, cfg["t_final"], cfg["steps"])
        states = evolve_eig(H, psi0, t)
        if cfg["t_final"] <= 0.1:
            # cross-check the two independent engines on short horizons
            states_ode = evolve_dop853(H, psi0, t)
            err = np.abs(states - states_ode).max()
            assert err < 2e-8, (name, err)
            print(f"  cross-check eig vs DOP853: {err:.2e}")
        else:
            # long horizon: cross-check the first 0.02 s only
            t_short = t[t <= 0.02]
            if len(t_short) >= 2:
                s_ode = evolve_dop853(H, psi0, t_short)
                err = np.abs(states[:, : len(t_short)] - s_ode).max()
                assert err < 2e-8, (name, err)
                print(f"  cross-check (first 0.02 s): {err:.2e}")
        tr = traces_of(states, obs)
        path = os.path.join(HERE, f"golden_{name}.npz")
        np.savez_compressed(path, t=t, params=json.dumps(params), **tr)
        print(f"wrote {path}: " + ", ".join(f"{k}" for k in tr))


if __name__ == "__main__":
    main()
