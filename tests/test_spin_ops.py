"""Spin operator algebra: commutators, eigenstates, QuTiP-convention checks."""

import numpy as np
import pytest

from quantumsimulations_tpu.ops.spin import eigenstate, spin_dim, spin_matrix


@pytest.mark.parametrize("s", [0.5, 1.0, 1.5, 2.0])
def test_su2_commutators(s):
    jx, jy, jz = (spin_matrix(s, w) for w in "xyz")
    assert np.allclose(jx @ jy - jy @ jx, 1j * jz, atol=1e-14)
    assert np.allclose(jy @ jz - jz @ jy, 1j * jx, atol=1e-14)
    assert np.allclose(jz @ jx - jx @ jz, 1j * jy, atol=1e-14)


@pytest.mark.parametrize("s", [0.5, 1.5])
def test_casimir(s):
    j2 = sum(spin_matrix(s, w) @ spin_matrix(s, w) for w in "xyz")
    assert np.allclose(j2, s * (s + 1) * np.eye(spin_dim(s)), atol=1e-14)


def test_spin_half_matches_pauli_halves():
    sx = 0.5 * np.array([[0, 1], [1, 0]], dtype=complex)
    sy = 0.5 * np.array([[0, -1j], [1j, 0]], dtype=complex)
    sz = 0.5 * np.array([[1, 0], [0, -1]], dtype=complex)
    assert np.allclose(spin_matrix(0.5, "x"), sx)
    assert np.allclose(spin_matrix(0.5, "y"), sy)
    assert np.allclose(spin_matrix(0.5, "z"), sz)


def test_spin_three_half_jz_diag_descending():
    # QuTiP jmat(1.5,'z') ordering: diag(3/2, 1/2, -1/2, -3/2)
    assert np.allclose(np.diag(spin_matrix(1.5, "z")), [1.5, 0.5, -0.5, -1.5])


def test_spin_three_half_ladder_values():
    jp = spin_matrix(1.5, "p")
    # <m+1|J+|m> = sqrt(s(s+1) - m(m+1)); descending basis puts it on superdiag
    expected = [np.sqrt(3.0), 2.0, np.sqrt(3.0)]
    assert np.allclose(np.diag(jp, k=1), expected)


@pytest.mark.parametrize("s", [0.5, 1.5])
@pytest.mark.parametrize("axis", ["x", "z"])
@pytest.mark.parametrize("sign", [+1, -1])
def test_eigenstate_is_extremal(s, axis, sign):
    ket = eigenstate(s, axis, sign)
    op = spin_matrix(s, axis)
    val = np.real(ket.conj() @ op @ ket)
    target = s if sign >= 0 else -s
    assert np.isclose(val, target, atol=1e-12)
    assert np.isclose(np.linalg.norm(ket), 1.0, atol=1e-12)


def test_z_eigenstates_are_basis_kets():
    assert np.allclose(eigenstate(0.5, "z", +1), [1, 0])
    assert np.allclose(eigenstate(0.5, "z", -1), [0, 1])
    assert np.allclose(eigenstate(1.5, "z", +1), [1, 0, 0, 0])
    assert np.allclose(eigenstate(1.5, "z", -1), [0, 0, 0, 1])
