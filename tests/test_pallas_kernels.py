"""Pallas kernels in interpreter mode (hardware-independent, SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.ops.pallas_kernels import (
    cmatmul_f32,
    matmul_pallas,
    z_expectations_f32,
    z_sign_table,
)

rng = np.random.default_rng(9)


@pytest.mark.parametrize("shape", [(128, 128, 128), (64, 200, 96), (300, 513, 130)])
def test_cmatmul_matches_numpy(shape):
    M, K, N = shape
    a = (rng.standard_normal((M, K)) + 1j * rng.standard_normal((M, K))).astype(np.complex64)
    b = (rng.standard_normal((K, N)) + 1j * rng.standard_normal((K, N))).astype(np.complex64)
    cr, ci = cmatmul_f32(
        jnp.asarray(a.real), jnp.asarray(a.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag),
        tm=64, tn=128, tk=128, interpret=True,
    )
    want = a @ b
    got = np.asarray(cr) + 1j * np.asarray(ci)
    scale = np.abs(want).max()
    assert np.allclose(got, want, atol=5e-4 * scale)


def test_matmul_pallas_wrapper():
    a = rng.standard_normal((96, 64)) + 1j * rng.standard_normal((96, 64))
    b = rng.standard_normal((64, 32)) + 1j * rng.standard_normal((64, 32))
    got = matmul_pallas(Cplx.from_numpy(a), Cplx.from_numpy(b), interpret=True).to_numpy()
    assert np.allclose(got, a @ b, atol=1e-3 * np.abs(a @ b).max())


def test_z_sign_table():
    dims = (2, 2, 4)
    s = z_sign_table(dims)
    assert s.shape == (3, 16)
    # site 0: first half +1/2, second half -1/2
    assert np.allclose(s[0, :8], 0.5) and np.allclose(s[0, 8:], -0.5)
    # site 2 (spin 3/2): pattern 1.5, 0.5, -0.5, -1.5 repeating
    assert np.allclose(s[2, :4], [1.5, 0.5, -0.5, -1.5])


def test_z_expectations_kernel_matches_dense():
    dims = (2, 2, 2, 2)
    dim = 16
    T = 37
    psi = rng.standard_normal((dim, T)) + 1j * rng.standard_normal((dim, T))
    psi /= np.linalg.norm(psi, axis=0, keepdims=True)
    signs = z_sign_table(dims)
    got = np.asarray(
        z_expectations_f32(
            jnp.asarray(psi.real), jnp.asarray(psi.imag), jnp.asarray(signs),
            interpret=True,
        )
    )
    want = signs @ (np.abs(psi) ** 2)
    assert np.allclose(got, want, atol=1e-5)
