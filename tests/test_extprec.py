"""Limb-decomposed f64 matmul: accuracy vs numpy float64 (and longdouble)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.ops.extprec import cmatmul_f64, cmatmul_f64_cplx, matmul_f64

rng = np.random.default_rng(23)


@pytest.mark.parametrize("shape", [(64, 64, 64), (128, 300, 96), (57, 513, 33)])
def test_matmul_f64_accuracy(shape):
    M, K, N = shape
    a = rng.standard_normal((M, K))
    b = rng.standard_normal((K, N))
    got = np.asarray(matmul_f64(jnp.asarray(a), jnp.asarray(b)))
    # oracle in 80-bit longdouble: compare both against it
    want_ld = (a.astype(np.longdouble) @ b.astype(np.longdouble)).astype(np.float64)
    scale = np.abs(want_ld).max()
    err_ours = np.abs(got - want_ld).max() / scale
    err_np = np.abs(a @ b - want_ld).max() / scale
    # ours should be within a small factor of numpy's own f64 rounding
    assert err_ours < max(5e-15, 10 * err_np), (err_ours, err_np)


def test_matmul_f64_wide_dynamic_range():
    # entries spanning ~12 orders of magnitude
    a = rng.standard_normal((96, 128)) * np.exp(rng.uniform(-14, 14, (96, 128)))
    b = rng.standard_normal((128, 80)) * np.exp(rng.uniform(-14, 14, (128, 80)))
    got = np.asarray(matmul_f64(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(np.longdouble) @ b.astype(np.longdouble)).astype(np.float64)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13


def test_matmul_f64_zero_matrix():
    a = np.zeros((16, 16))
    b = rng.standard_normal((16, 16))
    got = np.asarray(matmul_f64(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(got == 0.0)


def test_cmatmul_f64_matches_complex():
    M, K, N = 64, 96, 48
    a = rng.standard_normal((M, K)) + 1j * rng.standard_normal((M, K))
    b = rng.standard_normal((K, N)) + 1j * rng.standard_normal((K, N))
    cre, cim = cmatmul_f64(
        jnp.asarray(a.real), jnp.asarray(a.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag),
    )
    want = a @ b
    got = np.asarray(cre) + 1j * np.asarray(cim)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-14

    got2 = cmatmul_f64_cplx(Cplx.from_numpy(a), Cplx.from_numpy(b)).to_numpy()
    assert np.allclose(got2, want, atol=1e-13 * np.abs(want).max())


def test_unitary_propagation_precision():
    """The actual use case: U @ U^dag ~ I for a random unitary at f64 precision."""
    n = 128
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = H + H.conj().T
    import scipy.linalg

    U = scipy.linalg.expm(-1j * H * 0.01)
    Uc = Cplx.from_numpy(U)
    Ud = Cplx.from_numpy(U.conj().T)
    I = cmatmul_f64_cplx(Uc, Ud).to_numpy()
    assert np.abs(I - np.eye(n)).max() < 1e-13


def test_expm_ozaki_traces_match_eig():
    """The Ozaki-backed step-operator path vs the exact eig path (CPU)."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched, eigh_host,
    )
    from quantumsimulations_tpu.dynamics.expm_propagator import (
        expm_traces_assembled_ozaki,
    )
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=3, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=4.0e-4, steps=37, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    m = build_model(p)
    t = np.linspace(0, p.t_final, p.steps)
    w, V = eigh_host(m.hamiltonian.to_dense())
    exact = eig_traces_assembled_batched(
        w[None], V[None], m.psi0[None], t, m.dims,
        np.asarray([m.n_sea_effective]), m.idx_rare,
    )[0]
    rows = expm_traces_assembled_ozaki(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare, block=8,
    )
    assert rows.shape == exact.shape
    # observables + norm rows
    assert np.allclose(rows[:7], exact[:7], atol=1e-10)


# ---------------------------------------------------------------------------
# Fixed-grid extended precision ("ext"): exactness against Python Fractions
# and the parity-grade ext expm chain.
# ---------------------------------------------------------------------------

from fractions import Fraction

import jax.numpy as jnp

from quantumsimulations_tpu.ops.extprec import (
    EXT_E,
    EXT_GUARD,
    EXT_LIMBS,
    ext_add,
    ext_cmatmul,
    ext_scalar_limbs,
    ext_scalar_mul,
    ext_split,
    ext_val,
)


def _frac_of(limbs):
    """Exact Fraction value of a limb stack (entrywise)."""
    lf = np.asarray(limbs, dtype=np.float64)
    L = lf.shape[0]
    out = [[Fraction(0)] * lf.shape[2] for _ in range(lf.shape[1])]
    for j in range(L):
        w = Fraction(2) ** (EXT_E - 5 * (j + 1))
        for r in range(lf.shape[1]):
            for c in range(lf.shape[2]):
                out[r][c] += Fraction(int(lf[j, r, c])) * w
    return out


def test_ext_split_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.1, 1.1, (16, 16))
    rt = np.asarray(ext_val(ext_split(jnp.asarray(x))))
    assert np.abs(rt - x).max() <= 2.0 ** (EXT_E - 5 * EXT_LIMBS)


def test_ext_cmatmul_exact_vs_fractions():
    """The ext complex matmul is exact to its truncation bound — verified
    against arbitrary-precision rational arithmetic."""
    rng = np.random.default_rng(1)
    M = 12
    ar, ai = rng.uniform(-1.1, 1.1, (2, M, M))
    br, bi = rng.uniform(-1.1, 1.1, (2, M, M))
    Are, Aim = ext_split(jnp.asarray(ar)), ext_split(jnp.asarray(ai))
    Bre, Bim = ext_split(jnp.asarray(br)), ext_split(jnp.asarray(bi))
    Cre, Cim = ext_cmatmul(Are, Aim, Bre, Bim, panel=M)
    fa_re, fa_im, fb_re, fb_im = map(_frac_of, (Are, Aim, Bre, Bim))
    fc_re, fc_im = _frac_of(Cre), _frac_of(Cim)
    wLG = Fraction(2) ** (EXT_E - 5 * (EXT_LIMBS + EXT_GUARD + 1))
    wL = Fraction(2) ** (EXT_E - 5 * (EXT_LIMBS + 1))
    tol = 2 * (EXT_LIMBS * M * 512 * wLG * 2 + EXT_GUARD * 16 * wL)
    worst = Fraction(0)
    for r in range(M):
        for c in range(M):
            er = sum(fa_re[r][k] * fb_re[k][c] - fa_im[r][k] * fb_im[k][c] for k in range(M))
            ei = sum(fa_re[r][k] * fb_im[k][c] + fa_im[r][k] * fb_re[k][c] for k in range(M))
            worst = max(worst, abs(fc_re[r][c] - er), abs(fc_im[r][c] - ei))
    assert worst < tol, float(worst)


def test_ext_scalar_mul_and_add_exact():
    rng = np.random.default_rng(2)
    M = 10
    a = ext_split(jnp.asarray(rng.uniform(-1.1, 1.1, (M, M))))
    b = ext_split(jnp.asarray(rng.uniform(-1.1, 1.1, (M, M))))
    cl = ext_scalar_limbs(Fraction(1, 7))
    cf = sum(Fraction(int(x)) * Fraction(2) ** (-5 * (i + 1)) for i, x in enumerate(cl))
    sf = _frac_of(ext_scalar_mul(a, cl))
    af = _frac_of(a)
    worst = max(
        abs(float(sf[r][c] - af[r][c] * cf)) for r in range(M) for c in range(M)
    )
    assert worst < 1e-21
    df = _frac_of(ext_add(a, b))
    bf = _frac_of(b)
    assert all(
        df[r][c] == af[r][c] + bf[r][c] for r in range(M) for c in range(M)
    )


def test_ext_expm_traces_parity():
    """The ext step-operator trace matches the eig path to parity grade on a
    horizon where the f64 eigensolver's own phase error is negligible
    (eigenvalue rounding ~eps*||H|| -> ~1e-9*t rad; see VERDICT r1 item 2)."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
        eigh_host,
    )
    from quantumsimulations_tpu.dynamics.expm_propagator import (
        expm_traces_assembled_ext,
    )
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=4, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=1.0, steps=400, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    m = build_model(p)
    t = np.linspace(0, p.t_final, p.steps)
    w, V = eigh_host(m.hamiltonian.to_dense())
    exact = eig_traces_assembled_batched(
        w[None], V[None], m.psi0[None], t, m.dims,
        np.asarray([m.n_sea_effective]), m.idx_rare,
    )[0]
    rows = expm_traces_assembled_ext(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare, block=64,
    )
    assert rows.shape == exact.shape
    assert np.abs(rows[:6] - exact[:6]).max() < 5e-9
    assert np.abs(rows[6] - 1.0).max() < 1e-12  # norm conservation


def test_ext_chunked_matches_fused(monkeypatch):
    """The chunked-dispatch ext chain (used at dim >= _EXT_CHUNK_DIM, where a
    single fused device program outlives the TPU tunnel's tolerance) is the
    same math in the same order as the fused program — results must match
    bit-for-bit."""
    from quantumsimulations_tpu.dynamics import expm_propagator as ep
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=4, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=0.2, steps=100, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    m = build_model(p)
    t = np.linspace(0, p.t_final, p.steps)
    args = (m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare)
    fused = ep.expm_traces_assembled_ext(*args, block=16)
    monkeypatch.setattr(ep, "_EXT_CHUNK_DIM", 1)  # force the large-dim branch
    monkeypatch.setattr(ep, "_EXT_ADV_CHUNK", 3)  # exercise padded tail too
    # large-dim path, COO f32-triple-split upload: bit-identical canonical
    # limbs to the small-dim dense-split upload of `fused`
    monkeypatch.setenv("QST_EXT_HOSTLIMB", "0")
    chunked = ep.expm_traces_assembled_ext(*args, block=16)
    np.testing.assert_array_equal(chunked, fused)
    # the one-program chain (default, QST_EXT_ONEPROG=1: horner + squarings
    # + doubling B-squarings all through `_ext_chain_step`) and the split
    # horner/square programs must BOTH be bit-identical to the fused program
    monkeypatch.setenv("QST_EXT_ONEPROG", "0")
    split_prog = ep.expm_traces_assembled_ext(*args, block=16)
    np.testing.assert_array_equal(split_prog, fused)
    monkeypatch.setenv("QST_EXT_ONEPROG", "1")
    oneprog = ep.expm_traces_assembled_ext(*args, block=16)
    np.testing.assert_array_equal(oneprog, fused)
    monkeypatch.delenv("QST_EXT_ONEPROG")
    # default large-dim path (host canonical split + scatter): an exact
    # decomposition of the SAME values whose limb-level tie-rounding may
    # differ, so results agree to the truncation floor, not bit-for-bit
    monkeypatch.setenv("QST_EXT_HOSTLIMB", "1")
    hostlimb = ep.expm_traces_assembled_ext(*args, block=16)
    assert np.abs(hostlimb - fused).max() < 1e-12
    monkeypatch.setenv("QST_EXT_HOSTLIMB", "0")
    # opt-in fused preamble at large dims (QST_EXT_FUSED=1; faults the real
    # TPU worker at dim 8192 but is exact — keep its math covered on CPU)
    monkeypatch.setenv("QST_EXT_FUSED", "1")
    large_fused = ep.expm_traces_assembled_ext(*args, block=16)
    np.testing.assert_array_equal(large_fused, fused)


def test_ext_carry_i32_value_exact():
    """The native-i32 carry cascade produces canonical limbs representing
    EXACTLY the same value as the f64 cascade (their tie-rounding may differ,
    but t = 32*carry + residual holds exactly in both).

    Digits respect the grid contract |sum_j d_j w_j| < 2^EXT_E (true for all
    real callers, whose chain values are bounded by ~e^theta): each digit is
    capped at its significance's share so the top limb stays in int8."""
    from quantumsimulations_tpu.ops.extprec import _ext_carry, _ext_carry_i32

    rng = np.random.default_rng(3)
    caps = [int(min(2**26, 32**j)) for j in range(EXT_LIMBS + EXT_GUARD)]
    d = np.stack([
        rng.integers(-c, c + 1, size=(8, 8)) for c in caps
    ])
    via_i32 = _ext_carry_i32(jnp.asarray(d, jnp.int32))
    via_f64 = _ext_carry(jnp.asarray(d, jnp.float64))
    fi, ff = _frac_of(via_i32), _frac_of(via_f64)
    assert all(fi[r][c] == ff[r][c] for r in range(8) for c in range(8))
    # canonical residual bound: every non-top limb fits the int8 range
    assert np.abs(np.asarray(via_i32, np.float64)[1:]).max() <= 16


def test_ext_site_obs_fused_matches_jnp():
    """The Pallas fused limb-pair observable kernel (interpret mode off-TPU)
    must reproduce the jnp reduction `_ext_site_obs` on canonical limb
    stacks of a random normalized state (all-spin-1/2 dims)."""
    import jax.numpy as jnp

    from quantumsimulations_tpu.dynamics.expm_propagator import (
        _ext_site_obs,
        _ext_site_obs_fused,
    )
    from quantumsimulations_tpu.ops.extprec import ext_split

    rng = np.random.default_rng(7)
    dims = (2, 2, 2, 2)
    dim, T = 16, 128  # T must be 128-lane aligned for the kernel
    psis = rng.standard_normal((dim, T)) + 1j * rng.standard_normal((dim, T))
    psis /= np.linalg.norm(psis, axis=0, keepdims=True)
    S_re = ext_split(jnp.asarray(psis.real))
    S_im = ext_split(jnp.asarray(psis.imag))

    xyz_ref, nr_ref = _ext_site_obs(S_re, S_im, dims)
    xyz_fus, nr_fus = _ext_site_obs_fused(S_re, S_im, dims)
    np.testing.assert_allclose(np.asarray(xyz_fus), np.asarray(xyz_ref),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(nr_fus), np.asarray(nr_ref),
                               rtol=0, atol=1e-13)
    # and against the dense-state oracle
    np.testing.assert_allclose(np.asarray(nr_fus), 1.0, rtol=0, atol=1e-12)


def test_ext_advance_checkpoint_resume_bit_identical(tmp_path, monkeypatch):
    """Kill the ext advance mid-run (abort hook) and resume: rows must be
    BIT-identical to an uninterrupted run (VERDICT r2 item 4)."""
    import quantumsimulations_tpu.dynamics.expm_propagator as ep
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=4, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=2.0e-4, steps=64, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    model = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    # force the chunked large-dim code path (dim 32 < _EXT_CHUNK_DIM
    # otherwise) so the ckpt-relevant branch is the one exercised
    monkeypatch.setattr(ep, "_EXT_CHUNK_DIM", 16)

    ref = ep.expm_traces_assembled_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, block=16,
    )

    ck = str(tmp_path / "ck")
    monkeypatch.setenv("QST_EXT_ABORT_AFTER_CHUNKS", "1")
    import pytest

    with pytest.raises(RuntimeError, match="aborted after 1 advance chunks"):
        ep.expm_traces_assembled_ext(
            model.hamiltonian, model.psi0, t, model.dims,
            model.n_sea_effective, model.idx_rare, block=16,
            ckpt_dir=ck, ckpt_every_blocks=1,
        )
    import os as _o
    assert _o.path.isfile(_o.path.join(ck, "ext_advance.npz"))

    monkeypatch.delenv("QST_EXT_ABORT_AFTER_CHUNKS")
    resumed = ep.expm_traces_assembled_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, block=16,
        ckpt_dir=ck, ckpt_every_blocks=1,
    )
    assert np.array_equal(resumed, ref), "resume must be bit-identical"
    # snapshot cleared after a successful run
    assert not _o.path.isfile(_o.path.join(ck, "ext_advance.npz"))


def test_ext_split_upload_matches_ext_split():
    """The f32 triple-split upload path must agree with the direct f64 split
    to the ext truncation floor (<= 2^(E-5L-1) absolute on the dropped
    tail), and produce canonical limbs."""
    import jax.numpy as jnp

    from quantumsimulations_tpu.ops.extprec import (
        EXT_E,
        EXT_LIMBS,
        ext_split,
        ext_split_upload,
        ext_val,
    )

    rng_l = np.random.default_rng(11)
    x = rng_l.standard_normal((64, 64)) * 1.9  # spans the |x| < 2^E grid
    sa = np.asarray(ext_split(jnp.asarray(x)), dtype=np.int64)
    sb = np.asarray(ext_split_upload(x), dtype=np.int64)

    def int_val(s):  # exact integer value in units of the last limb
        L = s.shape[0]
        so = s.astype(object)  # python big ints: 2^70 exceeds int64
        return sum(so[j] * (1 << (5 * (L - 1 - j))) for j in range(L))

    # the two paths may round the dropped sub-grid tail differently: at most
    # one unit of the last limb each
    assert np.abs(int_val(sa) - int_val(sb)).max() <= 2
    # f64 roundtrip: exact up to the f64 re-rounding of the stored value
    b = np.asarray(ext_val(ext_split_upload(x)))
    assert np.abs(b - x).max() <= 2.0**-50
    # canonical: |limbs| <= 16 beyond the fold limb
    assert np.abs(sb[1:]).max() <= 16


def test_ext_split_dispatch_fused_matches_jnp_path():
    """The cache-friendly split advance (matmul-only collect scan + one
    standalone fused obs kernel over the stacked states) must reproduce the
    single-scan jnp-reduction path at the SAME block size.  The limb matmuls
    are exact integer arithmetic, so any difference is the f64 combine order
    of the observable reduction — bounded well below the physics tolerance."""
    from quantumsimulations_tpu.dynamics import expm_propagator as ep
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=6, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0, omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=0.005, steps=256, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    m = build_model(p)  # dims (2,)*7: fused-kernel eligible
    t = np.linspace(0, p.t_final, p.steps)
    args = (m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare)
    rows_fused = ep.expm_traces_assembled_ext(*args, block=128, fused_obs=True)
    rows_jnp = ep.expm_traces_assembled_ext(*args, block=128, fused_obs=False)
    np.testing.assert_allclose(rows_fused, rows_jnp, rtol=0, atol=1e-12)
    assert np.abs(rows_fused[6] - 1.0).max() < 1e-12  # norm conservation


def test_ext_split_upload_coo_pair_matches_dense_pair():
    """The COO scatter upload path must produce the SAME canonical int8 limb
    stacks as the dense-plane triple-split path (same per-entry split, zeros
    exactly zero)."""
    from quantumsimulations_tpu.ops.extprec import (
        ext_split_upload_coo_pair,
        ext_split_upload_pair,
    )

    rng = np.random.default_rng(7)
    dim = 48
    a = np.zeros((dim, dim))
    b = np.zeros((dim, dim))
    nnz = 200
    r = rng.integers(0, dim, nnz)
    c = rng.integers(0, dim, nnz)
    a[r, c] = rng.standard_normal(nnz) * 2.0 ** rng.integers(-40, 3, nnz)
    b[r, c] = rng.standard_normal(nnz) * 2.0 ** rng.integers(-40, 3, nnz)
    rows, cols = np.nonzero(a + 1j * b)
    sa_d, sb_d = ext_split_upload_pair(a, b)
    sa_c, sb_c = ext_split_upload_coo_pair(
        rows.astype(np.int64), cols.astype(np.int64),
        a[rows, cols], b[rows, cols], dim,
    )
    np.testing.assert_array_equal(np.asarray(sa_c), np.asarray(sa_d))
    np.testing.assert_array_equal(np.asarray(sb_c), np.asarray(sb_d))


def test_ext_karatsuba_bit_identical_to_four_dot():
    """The Karatsuba 3-dot limb-pair product in `_ext_cpanel_product` is
    BIT-IDENTICAL to the plain 4-dot complex form (all arithmetic is exact
    i32 integers, so re = m1-m2 and im = m3-m1-m2 reproduce rr-ii and ri+ir
    digit for digit).  Guards the exactness claim the ext chain's checkpoint
    fingerprints rely on."""
    from quantumsimulations_tpu.ops.extprec import (
        _ext_carry_i32,
        _ext_cpanel_product,
    )

    rng = np.random.default_rng(7)
    M = 16
    ar, ai = rng.uniform(-1.1, 1.1, (2, M, M))
    br, bi = rng.uniform(-1.1, 1.1, (2, M, M))
    Are, Aim = ext_split(jnp.asarray(ar)), ext_split(jnp.asarray(ai))
    Bre, Bim = ext_split(jnp.asarray(br)), ext_split(jnp.asarray(bi))
    L = int(Are.shape[0])

    got_re, got_im = _ext_cpanel_product(Are, Aim, Bre, Bim, L)

    # reference: the pre-Karatsuba 4-dot pyramid, verbatim
    d_re, d_im = [], []
    for s in range(L + EXT_GUARD):
        acc_re = None
        acc_im = None
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            rr = jnp.dot(Are[j], Bre[i], preferred_element_type=jnp.int32)
            ii = jnp.dot(Aim[j], Bim[i], preferred_element_type=jnp.int32)
            ri = jnp.dot(Are[j], Bim[i], preferred_element_type=jnp.int32)
            ir = jnp.dot(Aim[j], Bre[i], preferred_element_type=jnp.int32)
            re_c = rr - ii
            im_c = ri + ir
            acc_re = re_c if acc_re is None else acc_re + re_c
            acc_im = im_c if acc_im is None else acc_im + im_c
        d_re.append(acc_re)
        d_im.append(acc_im)
    ref_re = _ext_carry_i32(jnp.stack(d_re))[:L]
    ref_im = _ext_carry_i32(jnp.stack(d_im))[:L]

    assert np.array_equal(np.asarray(got_re), np.asarray(ref_re))
    assert np.array_equal(np.asarray(got_im), np.asarray(ref_im))


def test_ext_pairscan_bit_identical(monkeypatch):
    """QST_EXT_PAIRSCAN=1 (fori_loop over limb pairs, ~20x smaller
    executable) produces bit-identical limbs to the unrolled pyramid."""
    from quantumsimulations_tpu.ops.extprec import _ext_cpanel_product

    rng = np.random.default_rng(11)
    M = 16
    ar, ai = rng.uniform(-1.1, 1.1, (2, M, M))
    br, bi = rng.uniform(-1.1, 1.1, (2, M, M))
    Are, Aim = ext_split(jnp.asarray(ar)), ext_split(jnp.asarray(ai))
    Bre, Bim = ext_split(jnp.asarray(br)), ext_split(jnp.asarray(bi))
    L = int(Are.shape[0])

    monkeypatch.delenv("QST_EXT_PAIRSCAN", raising=False)
    ref_re, ref_im = _ext_cpanel_product(Are, Aim, Bre, Bim, L)
    monkeypatch.setenv("QST_EXT_PAIRSCAN", "1")
    got_re, got_im = _ext_cpanel_product(Are, Aim, Bre, Bim, L)

    assert np.array_equal(np.asarray(got_re), np.asarray(ref_re))
    assert np.array_equal(np.asarray(got_im), np.asarray(ref_im))
