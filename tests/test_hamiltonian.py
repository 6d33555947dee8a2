"""Hamiltonian assembly vs an independent QuTiP-semantics kron oracle.

The oracle below re-derives the reference Hamiltonian term set
(dipolar_ensemble_with_rare.py:453-588) directly with numpy kron chains —
a fully independent code path from the framework's OperatorSum IR.
"""

import numpy as np
import pytest

from quantumsimulations_tpu.models.dipolar import build_hamiltonian_terms, initial_state
from quantumsimulations_tpu.models.geometry import (
    dipolar_couplings_from_positions,
    shell_positions_with_rare_center,
)
from quantumsimulations_tpu.models.params import DipolarRareParams, get_derived_frequencies

SX = 0.5 * np.array([[0, 1], [1, 0]], dtype=complex)
SY = 0.5 * np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = 0.5 * np.array([[1, 0], [0, -1]], dtype=complex)


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


def _oracle_hamiltonian(params: DipolarRareParams) -> np.ndarray:
    """Reference-semantics dense H (independent construction)."""
    n_sea = params.n_sea
    n_total = n_sea + 1
    idx_rare = n_sea
    dims = list(params.hilbert_dims())
    n_sea_eff = n_total if not params.is_center_rare else n_sea

    f = get_derived_frequencies(params)
    rare_spin32 = dims[idx_rare] == 4
    rop = {w: (_j32(w) if rare_spin32 else {"x": SX, "y": SY, "z": SZ}[w]) for w in "xyz"}
    sop = {"x": SX, "y": SY, "z": SZ}

    dim = int(np.prod(dims))
    H = np.zeros((dim, dim), dtype=complex)

    if params.drive_sea and f["delta_sea"] != 0.0:
        for j in range(n_sea_eff):
            H += f["delta_sea"] * _embed(sop["z"], j, dims)
    if params.is_center_rare and params.drive_rare and f["delta_rare"] != 0.0:
        H += f["delta_rare"] * _embed(rop["z"], idx_rare, dims)

    if params.drive_sea and f["omega1_sea"] != 0.0:
        for j in range(n_sea_eff):
            H += f["omega1_sea"] * (
                np.cos(params.phi_sea) * _embed(sop["x"], j, dims)
                + np.sin(params.phi_sea) * _embed(sop["y"], j, dims)
            )
    if params.is_center_rare and params.drive_rare and f["omega1_rare"] != 0.0:
        H += f["omega1_rare"] * (
            np.cos(params.phi_rare) * _embed(rop["x"], idx_rare, dims)
            + np.sin(params.phi_rare) * _embed(rop["y"], idx_rare, dims)
        )

    pos = shell_positions_with_rare_center(n_sea, params.shell_scale)
    b = dipolar_couplings_from_positions(
        pos,
        params.dipolar_scale,
        params.gamma_sea,
        params.gamma_rare if params.is_center_rare else params.gamma_sea,
    )
    for i in range(n_total):
        for j in range(i + 1, n_total):
            if i < n_sea_eff and j < n_sea_eff:
                H += b[i, j] * (
                    _embed(sop["z"], i, dims) @ _embed(sop["z"], j, dims)
                    - 0.25
                    * (
                        _embed(sop["x"], i, dims) @ _embed(sop["x"], j, dims)
                        - _embed(sop["y"], i, dims) @ _embed(sop["y"], j, dims)
                    )
                )
            elif j == idx_rare:
                H += b[i, j] * (_embed(sop["z"], i, dims) @ _embed(rop["z"], idx_rare, dims))
    return H


def _params(**kw):
    base = dict(
        n_sea=4,
        gamma_sea=8.1812e7,
        gamma_rare=6.976e7,
        B0_sea=3.0,
        B0_rare=3.0,
        B1_sea=2 * np.pi * 50e3 / 8.1812e7,
        B1_rare=2 * np.pi * 70.7e3 / 6.976e7,
        omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 1000.0,
        omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        is_spin_three_half=False,
        is_center_rare=True,
        drive_sea=True,
        drive_rare=False,
    )
    base.update(kw)
    return DipolarRareParams(**base)


@pytest.mark.parametrize(
    "kw",
    [
        dict(),  # center_off variant
        dict(drive_rare=True),  # center_on variant
        dict(drive_rare=False, is_center_rare=False),  # sea-center control
        dict(drive_rare=True, is_spin_three_half=True),  # coherent spin-3/2 rare
        dict(drive_sea=False, drive_rare=False),  # free evolution
        dict(omega_rf_sea=None),  # on-resonance default, delta=0 branch
    ],
)
def test_hamiltonian_matches_oracle(kw):
    params = _params(**kw)
    H_ir, _meta = build_hamiltonian_terms(params)
    got = H_ir.to_dense()
    want = _oracle_hamiltonian(params)
    assert got.shape == want.shape
    scale = max(1.0, np.abs(want).max())
    assert np.allclose(got, want, atol=1e-12 * scale)
    # Hermiticity
    assert np.allclose(got, got.conj().T, atol=1e-12 * scale)


def test_detuning_gated_by_drive_flag():
    # drive off => detuning term absent even with omega_rf far off resonance
    p_off = _params(drive_sea=False, drive_rare=False)
    f = get_derived_frequencies(p_off)
    assert f["delta_sea"] == 0.0 and f["delta_rare"] == 0.0


def test_derived_frequencies_truth_table():
    p = _params(drive_rare=True)
    f = get_derived_frequencies(p)
    assert np.isclose(f["omega_Az"], p.gamma_sea * p.B0_sea)
    assert np.isclose(f["omega1_sea"], p.gamma_sea * p.B1_sea)
    assert np.isclose(f["delta_sea"], f["omega_Az"] - p.omega_rf_sea)
    assert np.isclose(f["delta_sea_Hz"], f["delta_sea"] / (2 * np.pi))
    assert np.isclose(f["delta_sea_Hz"], 1000.0)
    # rare driven on resonance -> zero detuning
    assert f["delta_rare"] == 0.0
    # rf defaults to Larmor when None
    p2 = _params(omega_rf_sea=None, omega_rf_rare=None, drive_rare=True)
    f2 = get_derived_frequencies(p2)
    assert f2["omega_rf_sea"] == f2["omega_Az"]
    assert f2["delta_sea"] == 0.0


def test_initial_state_product_structure():
    p = _params(n_sea=3, init_x_sign=-1)
    psi = initial_state(p)
    # sea |down>^3 (x) rare |up>: down=(0,1), so index = 0b111 0 -> binary 1110
    dim = 2**4
    assert psi.shape == (dim,)
    idx = int("1110", 2)
    expected = np.zeros(dim, dtype=complex)
    expected[idx] = 1.0
    assert np.allclose(psi, expected)


def test_initial_state_spin32_rare():
    p = _params(n_sea=2, init_x_sign=-1, is_spin_three_half=True)
    psi = initial_state(p)
    assert psi.shape == (2 * 2 * 4,)
    # sea down,down; rare m=+3/2 (index 0 of 4)
    expected = np.zeros(16, dtype=complex)
    expected[1 * 8 + 1 * 4 + 0] = 1.0
    assert np.allclose(psi, expected)


def test_sea_center_control_couples_all_sites_homonuclear():
    p = _params(is_center_rare=False)
    H_ir, meta = build_hamiltonian_terms(p)
    assert meta["n_sea_effective"] == p.n_sea + 1
    # center site must appear in xx terms (homonuclear), not only zz
    center = p.n_sea
    has_xx_center = any(
        any(s == center and w == "x" for s, w in t.factors) and len(t.factors) == 2
        for t in H_ir.terms
    )
    assert has_xx_center
