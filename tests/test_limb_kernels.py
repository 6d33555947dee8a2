"""Fused Pallas limb-matmul kernel (ops/limb_kernels.py) and the "extp"
arithmetic tier built on it.

Interpret-mode on CPU (SURVEY.md §4.4): the kernel's digit-window products
and carry cascade are checked against the pure-XLA limb-domain tier
(ops/split_apply_ext.py) and the f64 split apply, on the production model
family (reference term set: dipolar_ensemble_with_rare.py:453-588).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.ops.limb_kernels import limb_matmul_canon
from quantumsimulations_tpu.ops.split_apply import make_split_apply
from quantumsimulations_tpu.ops.split_apply_ext import (
    GRID_BITS,
    GRID_LIMBS,
    _make_grid_ops,
    _split_host,
    make_ext_apply,
    make_ext_apply_pallas,
)

from quantumsimulations_tpu.models.params import DipolarRareParams


def production_params(n_sea=5, t_final=0.005, steps=5):
    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f1A = 50_000.0
    f_Az = gamma_sea * B0 / (2 * np.pi)
    return DipolarRareParams(
        n_sea=n_sea,
        gamma_sea=gamma_sea,
        gamma_rare=gamma_rare,
        B0_sea=B0,
        B0_rare=B0,
        B1_sea=2 * np.pi * f1A / gamma_sea,
        B1_rare=2 * np.pi * f1A / gamma_rare,
        omega_rf_sea=2 * np.pi * (f_Az - 1000.0),
        omega_rf_rare=gamma_rare * B0,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        t_final=t_final,
        steps=steps,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )


def _rand_limbs(rng, shape, b, L, scale=1.0):
    x = scale * rng.standard_normal(shape)
    return x, jnp.asarray(_split_host(x, b, L))


class TestLimbMatmulCanon:
    def test_matches_xla_digit_product(self):
        """Kernel == _product_digits + carry + truncate, elementwise."""
        from quantumsimulations_tpu.ops.split_apply_ext import _product_digits

        b, L = GRID_BITS, GRID_LIMBS
        ops = _make_grid_ops(b, L)
        rng = np.random.default_rng(7)
        _, a = _rand_limbs(rng, (48, 32), b, L, 0.3)
        _, bb = _rand_limbs(rng, (32, 40), b, L, 0.3)
        ref = np.asarray(ops.carry(_product_digits(a, bb, L, 32, b))[:L])
        got = np.asarray(limb_matmul_canon(a, bb, bits=b, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_value_grade(self):
        """Kernel product value == f64 product to the grid resolution."""
        b, L = GRID_BITS, GRID_LIMBS
        ops = _make_grid_ops(b, L)
        rng = np.random.default_rng(3)
        xa, a = _rand_limbs(rng, (64, 48), b, L, 0.2)
        xb, bb = _rand_limbs(rng, (48, 32), b, L, 0.2)
        got = np.asarray(
            ops.val(limb_matmul_canon(a, bb, bits=b, interpret=True)))
        # end-to-end grade: input split truncation (~2^-55 per operand)
        # accumulates over the K=48 contraction -> f64-roundoff scale
        assert np.abs(got - xa @ xb).max() < 2e-15

    def test_transpose_out_layout(self):
        """M-tile i's product lands at columns [i*N, (i+1)*N)."""
        b, L = GRID_BITS, GRID_LIMBS
        rng = np.random.default_rng(5)
        tm, A, K, N = 16, 3, 16, 24
        _, a = _rand_limbs(rng, (A * tm, K), b, L, 0.3)
        _, bb = _rand_limbs(rng, (K, N), b, L, 0.3)
        plain = np.asarray(limb_matmul_canon(a, bb, bits=b, interpret=True))
        trans = np.asarray(limb_matmul_canon(
            a, bb, bits=b, tm=tm, transpose_out=True, interpret=True))
        assert trans.shape == (L, tm, A * N)
        for i in range(A):
            np.testing.assert_array_equal(
                trans[:, :, i * N:(i + 1) * N],
                plain[:, i * tm:(i + 1) * tm, :],
            )


class TestExtpApply:
    @pytest.mark.parametrize(
        "n_sea,s32,center",
        [(7, False, True), (6, True, True), (7, False, False)],
    )
    def test_matches_f64_and_ext(self, n_sea, s32, center):
        from quantumsimulations_tpu.models.dipolar import build_model

        p = production_params(n_sea=n_sea, t_final=0.01, steps=4)
        p = dataclasses.replace(
            p, is_spin_three_half=s32, is_center_rare=center)
        m = build_model(p)
        dim = int(np.prod(m.dims))
        lam = 2.6e6
        rng = np.random.default_rng(0)
        psi = rng.normal(size=dim) + 1j * rng.normal(size=dim)
        psi /= np.linalg.norm(psi)

        a_x, so, ops = make_ext_apply(m.hamiltonian, scale=1.0 / lam)
        a_p, _, _ = make_ext_apply_pallas(
            m.hamiltonian, scale=1.0 / lam, interpret=True)
        f64, _ = make_split_apply(m.hamiltonian, scale=1.0 / lam)
        pr = jnp.asarray(psi.real.reshape(so.DL, so.DR))
        pi = jnp.asarray(psi.imag.reshape(so.DL, so.DR))
        tr, ti = ops.split(pr), ops.split(pi)
        yr, yi = a_p(tr, ti)
        vp = np.asarray(ops.val(yr)) + 1j * np.asarray(ops.val(yi))
        fr = f64(Cplx(pr, pi))
        vf = np.asarray(fr.re) + 1j * np.asarray(fr.im)
        assert np.abs(vp - vf).max() < 1e-13
        xr, xi = a_x(tr, ti)
        vx = np.asarray(ops.val(xr)) + 1j * np.asarray(ops.val(xi))
        assert np.abs(vp - vx).max() < 1e-13

    def test_cheb_step_extp_tier(self):
        """Short trace through the public stepper, extp vs ext."""
        from quantumsimulations_tpu.dynamics.cheb_step import (
            chebyshev_step_traces,
        )
        from quantumsimulations_tpu.models.dipolar import build_model

        p = production_params(n_sea=5, t_final=0.005, steps=5)
        m = build_model(p)
        t = np.linspace(0.0, p.t_final, p.steps)
        kw = dict(steps_per_dispatch=2)
        rows_x = chebyshev_step_traces(
            m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
            m.idx_rare, arithmetic="ext", **kw)
        rows_p = chebyshev_step_traces(
            m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
            m.idx_rare, arithmetic="extp", **kw)
        assert np.abs(rows_p - rows_x).max() < 1e-11
        assert np.abs(rows_p[6] - 1.0).max() < 1e-11
