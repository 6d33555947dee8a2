"""Complex-pair arithmetic and the operator IR vs a numpy-kron oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantumsimulations_tpu.ops.cplx import Cplx, expi, matmul, norm, vdot
from quantumsimulations_tpu.ops.embed import (
    OperatorSum,
    ProductTerm,
    expect_site,
    local_op,
    site_reduced_density,
)

rng = np.random.default_rng(0)


def _rand_c(*shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_cplx_roundtrip_and_arith():
    a = _rand_c(5, 3)
    b = _rand_c(5, 3)
    ca, cb = Cplx.from_numpy(a), Cplx.from_numpy(b)
    assert np.allclose((ca + cb).to_numpy(), a + b)
    assert np.allclose((ca - cb).to_numpy(), a - b)
    assert np.allclose((ca * cb).to_numpy(), a * b)
    assert np.allclose(ca.conj().to_numpy(), a.conj())
    assert np.allclose(ca.abs2(), np.abs(a) ** 2)
    assert np.allclose((ca * 2.5).to_numpy(), a * 2.5)
    assert np.allclose((ca * (1 + 2j)).to_numpy(), a * (1 + 2j))


def test_cplx_matmul_vdot_norm():
    a = _rand_c(4, 6)
    b = _rand_c(6, 3)
    assert np.allclose(matmul(Cplx.from_numpy(a), Cplx.from_numpy(b)).to_numpy(), a @ b, atol=1e-14)
    v = _rand_c(7)
    w = _rand_c(7)
    assert np.allclose(vdot(Cplx.from_numpy(v), Cplx.from_numpy(w)).to_numpy(), np.vdot(v, w))
    assert np.isclose(norm(Cplx.from_numpy(v)), np.linalg.norm(v))


def test_cplx_dagger_expi():
    a = _rand_c(3, 5)
    assert np.allclose(Cplx.from_numpy(a).dagger().to_numpy(), a.conj().T)
    th = rng.standard_normal(10)
    assert np.allclose(expi(jnp.asarray(th)).to_numpy(), np.exp(1j * th))


# ---------------------------------------------------------------------------
# Operator IR vs explicit kron chains
# ---------------------------------------------------------------------------

def _kron_chain(dims, placed):
    mats = []
    for k, d in enumerate(dims):
        mats.append(placed.get(k, np.eye(d, dtype=complex)))
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


@pytest.mark.parametrize("dims", [(2, 2, 2), (2, 2, 4), (2, 4, 2, 2)])
def test_dense_assembly_matches_kron_oracle(dims):
    terms = (
        ProductTerm(0.7, ((0, "z"),)),
        ProductTerm(-1.3, ((1, "x"), (len(dims) - 1, "z"))),
        ProductTerm(0.25, ((0, "y"), (1, "y"))),
    )
    op = OperatorSum(dims, terms)
    expected = sum(
        t.coeff * _kron_chain(dims, {s: local_op(dims[s], w) for s, w in t.factors})
        for t in terms
    )
    assert np.allclose(op.to_dense(), expected, atol=1e-14)


@pytest.mark.parametrize("dims", [(2, 2, 2), (2, 2, 4)])
def test_matrix_free_apply_matches_dense(dims):
    dim = int(np.prod(dims))
    terms = (
        ProductTerm(0.5, ((0, "z"),)),
        ProductTerm(1.1, ((0, "z"), (1, "z"))),
        ProductTerm(-0.4, ((0, "x"), (1, "x"))),
        ProductTerm(0.9, ((1, "y"), (len(dims) - 1, "y"))),
        ProductTerm(0.3, ((len(dims) - 1, "x"),)),
    )
    op = OperatorSum(dims, terms)
    H = op.to_dense()
    psi = _rand_c(dim)
    got = op.apply(Cplx.from_numpy(psi)).to_numpy()
    assert np.allclose(got, H @ psi, atol=1e-13)


def test_diagonal_part_extraction():
    dims = (2, 2, 2)
    terms = (
        ProductTerm(0.5, ((0, "z"),)),
        ProductTerm(1.5, ((1, "z"), (2, "z"))),
        ProductTerm(-0.4, ((0, "x"),)),  # off-diagonal, excluded
    )
    op = OperatorSum(dims, terms)
    diag = op.diagonal_part()
    dense_diag_terms = OperatorSum(dims, terms[:2]).to_dense()
    assert np.allclose(diag, np.real(np.diag(dense_diag_terms)), atol=1e-14)
    assert len(op.offdiagonal_terms()) == 1


def test_site_reduced_density_and_expectation():
    dims = (2, 4, 2)
    dim = int(np.prod(dims))
    psi = _rand_c(dim)
    psi /= np.linalg.norm(psi)
    cp = Cplx.from_numpy(psi)
    for site in range(3):
        rho = site_reduced_density(cp, dims, site).to_numpy()
        # oracle: rho_site by explicit partial trace
        t = psi.reshape(dims)
        axes = [k for k in range(3) if k != site]
        t_moved = np.moveaxis(t, site, 0).reshape(dims[site], -1)
        rho_exp = t_moved @ t_moved.conj().T
        assert np.allclose(rho, rho_exp, atol=1e-13)
        assert np.isclose(np.trace(rho).real, 1.0, atol=1e-12)
        for which in "xyz":
            op = local_op(dims[site], which)
            full = _kron_chain(dims, {site: op})
            want = np.real(psi.conj() @ full @ psi)
            got = float(expect_site(cp, dims, site, which))
            assert np.isclose(got, want, atol=1e-12)


def test_to_dense_device_matches_host():
    dims = (2, 2, 4, 2)
    terms = (
        ProductTerm(0.7, ((0, "z"),)),
        ProductTerm(1.9, ((1, "z"), (3, "z"))),
        ProductTerm(-1.3, ((1, "x"), (2, "y"))),
        ProductTerm(0.25, ((0, "y"), (3, "y"))),
        ProductTerm(0.4, ((2, "x"),)),
    )
    op = OperatorSum(dims, terms)
    host = op.to_dense()
    dev = op.to_dense_device().to_numpy()
    assert np.allclose(dev, host, atol=1e-14)


def test_cplx_complex_scalar_add_sub():
    a = _rand_c(4, 3)
    ca = Cplx.from_numpy(a)
    assert np.allclose((ca + (1 + 2j)).to_numpy(), a + (1 + 2j))
    assert np.allclose((ca - (0.5 - 1j)).to_numpy(), a - (0.5 - 1j))
    assert (ca + 1j).re.dtype == ca.re.dtype  # planes stay real


def test_to_dense_device_partial_tail_block():
    """dim not a multiple of col_block: the tail must not clamp-corrupt."""
    dims = (2, 2, 3)  # dim = 12
    terms = (
        ProductTerm(0.7, ((0, "z"),)),
        ProductTerm(-1.1, ((0, "x"), (2, "y"))),
        ProductTerm(0.4, ((1, "y"),)),
    )
    op = OperatorSum(dims, terms)
    host = op.to_dense()
    dev = op.to_dense_device(col_block=5).to_numpy()  # 12 = 2*5 + 2
    assert np.allclose(dev, host, atol=1e-14)


@pytest.mark.parametrize("dims", [(2, 2, 2), (2, 4, 2), (2, 2, 2, 4)])
def test_to_dense_index_arithmetic_matches_kron(dims):
    terms = (
        ProductTerm(0.7, ((0, "z"),)),
        ProductTerm(-1.3, ((0, "x"), (1, "x"))),
        ProductTerm(0.25, ((0, "y"), (len(dims) - 1, "y"))),
        ProductTerm(1.9, ((1, "z"), (len(dims) - 1, "z"))),
        ProductTerm(0.5, ((len(dims) - 1, "x"),)),
        ProductTerm(-0.8, ((1, "p"),)),
    )
    op = OperatorSum(dims, terms)
    assert np.allclose(op.to_dense(), op.to_dense_kron(), atol=1e-14)


def test_qubit_flip_apply_matches_dense():
    """The compile-friendly flip apply (ops/embed.py::make_qubit_flip_apply)
    must agree with the dense matrix on the dipolar model family, including
    the DQ pair term and both drives."""
    import jax.numpy as jnp

    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams
    from quantumsimulations_tpu.ops.embed import make_qubit_flip_apply

    gamma = 8.1812e7
    for n_sea, center in ((3, True), (4, False), (5, True)):
        p = DipolarRareParams(
            n_sea=n_sea, gamma_sea=gamma, gamma_rare=6.976e7,
            B0_sea=3.0, B0_rare=3.0,
            B1_sea=2 * np.pi * 5e4 / gamma,
            B1_rare=2 * np.pi * 70710.678 / 6.976e7,
            omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0,
            omega_rf_rare=6.976e7 * 3.0,
            phi_sea=np.pi / 2, phi_rare=np.pi / 2,
            dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
            t_final=1e-4, steps=3, drive_sea=True, drive_rare=True,
            is_spin_three_half=False, is_center_rare=center,
        )
        m = build_model(p)
        H = m.hamiltonian
        fa = make_qubit_flip_apply(H)
        assert fa is not None
        diag = jnp.asarray(H.diagonal_part())
        rng = np.random.default_rng(1)
        psi = rng.standard_normal(H.dim) + 1j * rng.standard_normal(H.dim)
        out = fa(Cplx.from_numpy(psi), diag)
        got = np.asarray(out.re) + 1j * np.asarray(out.im)
        want = H.to_dense() @ psi
        assert np.abs(got - want).max() <= 1e-12 * np.abs(want).max()

    # spin-3/2 rare site: flip apply must refuse (generic fallback)
    p32 = DipolarRareParams(
        n_sea=3, gamma_sea=gamma, gamma_rare=6.976e7,
        B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma,
        B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=0.0, phi_rare=0.0,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=1e-4, steps=3, drive_sea=True, drive_rare=True,
        is_spin_three_half=True, is_center_rare=True,
    )
    m32 = build_model(p32)
    assert make_qubit_flip_apply(m32.hamiltonian) is None


def test_to_coo_matches_to_dense():
    """The aggregated COO triplet must reproduce to_dense BIT-FOR-BIT (same
    accumulation order per entry) on both the all-qubit and spin-3/2 model
    variants, with duplicate-free indices (scatter-set safe)."""
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    for three_half in (False, True):
        p = DipolarRareParams(
            n_sea=4, gamma_sea=gamma, gamma_rare=6.976e7,
            B0_sea=3.0, B0_rare=3.0,
            B1_sea=2 * np.pi * 5e4 / gamma,
            B1_rare=2 * np.pi * 70710.678 / 6.976e7,
            omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0,
            omega_rf_rare=6.976e7 * 3.0,
            phi_sea=np.pi / 2, phi_rare=np.pi / 2,
            dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
            t_final=1e-4, steps=3, drive_sea=True, drive_rare=True,
            is_spin_three_half=three_half, is_center_rare=True,
        )
        H = build_model(p).hamiltonian
        rows, cols, vals = H.to_coo()
        # duplicate-free
        lin = rows * H.dim + cols
        assert len(np.unique(lin)) == len(lin)
        dense = np.zeros((H.dim, H.dim), dtype=np.complex128)
        dense[rows, cols] = vals
        ref = H.to_dense()
        np.testing.assert_array_equal(dense[ref != 0], ref[ref != 0])
        # dropped entries are exact zeros in the dense form
        assert np.all(dense[ref == 0] == 0)
