"""Cross-validation of the krylov / expm / dopri steppers against the exact
eig propagator, plus an analytic time-dependent-drive case for dopri."""

import numpy as np
import pytest

from quantumsimulations_tpu.dynamics.eig_propagator import eig_propagate_traces, eigh_host
from quantumsimulations_tpu.dynamics.expm_propagator import expm_propagate_traces
from quantumsimulations_tpu.dynamics.krylov import (
    krylov_propagate_traces,
    make_krylov_step,
    spectral_norm_bound,
)
from quantumsimulations_tpu.dynamics.dopri import (
    TimeDependentHamiltonian,
    dopri_propagate_traces,
)
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.params import DipolarRareParams
from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.ops.embed import OperatorSum, ProductTerm


def _params(**kw):
    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f1A = 50e3
    base = dict(
        n_sea=3,
        gamma_sea=gamma_sea,
        gamma_rare=gamma_rare,
        B0_sea=B0,
        B0_rare=B0,
        B1_sea=2 * np.pi * f1A / gamma_sea,
        B1_rare=2 * np.pi * 70710.678 / gamma_rare,
        omega_rf_sea=gamma_sea * B0 - 2 * np.pi * 1000.0,
        omega_rf_rare=gamma_rare * B0,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        t_final=5.0e-4,
        steps=51,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )
    base.update(kw)
    return DipolarRareParams(**base)


@pytest.fixture(scope="module")
def reference_solution():
    params = _params()
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    w, V = eigh_host(model.hamiltonian.to_dense())
    out = eig_propagate_traces(w, V, model.psi0, t, model.dims)
    return params, model, t, out


def test_krylov_matches_eig(reference_solution):
    params, model, t, exact = reference_solution
    out = krylov_propagate_traces(model.hamiltonian, model.psi0, t, model.dims)
    assert np.allclose(out["site_xyz"], exact["site_xyz"], atol=1e-10)
    assert np.allclose(out["norm"], 1.0, atol=1e-12)
    assert np.allclose(out["energy"], exact["energy"][0], atol=1e-6 * max(1, abs(exact["energy"][0])))


def test_krylov_step_unitary(reference_solution):
    params, model, t, _ = reference_solution
    dt = float(t[1] - t[0])
    step, n_sub = make_krylov_step(model.hamiltonian, dt)
    assert n_sub >= 1
    rng = np.random.default_rng(3)
    psi = rng.standard_normal(model.psi0.shape) + 1j * rng.standard_normal(model.psi0.shape)
    psi /= np.linalg.norm(psi)
    out = step(Cplx.from_numpy(psi)).to_numpy()
    assert np.isclose(np.linalg.norm(out), 1.0, atol=1e-11)


def test_spectral_norm_bound_is_upper_bound(reference_solution):
    _, model, _, _ = reference_solution
    bound = spectral_norm_bound(model.hamiltonian)
    H = model.hamiltonian.to_dense()
    true_norm = np.linalg.norm(H, 2)
    assert bound >= true_norm * 0.999


def test_expm_matches_eig(reference_solution):
    params, model, t, exact = reference_solution
    out = expm_propagate_traces(model.hamiltonian, model.psi0, t, model.dims, block=16)
    assert np.allclose(out["site_xyz"], exact["site_xyz"], atol=1e-10)
    assert np.allclose(out["norm"], 1.0, atol=1e-11)


def test_expm_nonpow2_block_and_short_grid():
    params = _params(steps=7, t_final=1e-4)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    w, V = eigh_host(model.hamiltonian.to_dense())
    exact = eig_propagate_traces(w, V, model.psi0, t, model.dims)
    out = expm_propagate_traces(model.hamiltonian, model.psi0, t, model.dims, block=3)
    assert out["site_xyz"].shape == exact["site_xyz"].shape
    assert np.allclose(out["site_xyz"], exact["site_xyz"], atol=1e-11)


def test_dopri_matches_eig(reference_solution):
    params, model, t, exact = reference_solution
    out = dopri_propagate_traces(
        model.hamiltonian, model.psi0, t, model.dims, atol=1e-12, rtol=1e-11
    )
    assert out["n_accepted"] > 0
    assert np.allclose(out["site_xyz"], exact["site_xyz"], atol=1e-8)
    assert np.allclose(out["norm"], 1.0, atol=1e-9)


def test_dopri_time_dependent_rabi():
    """Lab-frame cosine drive on one spin, RWA-free analytic check:
    H(t) = (w0/2) sz + w1 cos(w0 t) sx.  With w1 << w0 the rotating-wave
    solution gives <Sz>(t) = -0.5 cos(w1/2 * ... ) — instead of relying on
    RWA accuracy we compare against scipy's DOP853 at tight tolerance."""
    from scipy.integrate import solve_ivp

    w0 = 2 * np.pi * 1.0e5
    w1 = 2 * np.pi * 4.0e3
    dims = (2,)
    H0 = OperatorSum(dims, (ProductTerm(w0, ((0, "z"),)),))
    V = OperatorSum(dims, (ProductTerm(2 * w1, ((0, "x"),)),))
    import jax.numpy as jnp

    Ht = TimeDependentHamiltonian(H0, [(V, lambda t: jnp.cos(w0 * t))])

    psi0 = np.array([1.0, 0.0], dtype=np.complex128)
    t = np.linspace(0.0, 2.5e-4, 101)
    out = dopri_propagate_traces(Ht, psi0, t, dims, atol=1e-12, rtol=1e-11)

    sz = 0.5 * np.array([[1, 0], [0, -1]], dtype=complex)
    sx = 0.5 * np.array([[0, 1], [1, 0]], dtype=complex)
    H0d = w0 * sz
    Vd = 2 * w1 * sx

    def rhs(tt, y):
        psi = y[:2] + 1j * y[2:]
        d = -1j * ((H0d + np.cos(w0 * tt) * Vd) @ psi)
        return np.concatenate([d.real, d.imag])

    sol = solve_ivp(rhs, (0, t[-1]), np.concatenate([psi0.real, psi0.imag]),
                    t_eval=t, method="DOP853", rtol=1e-12, atol=1e-14)
    psis = sol.y[:2] + 1j * sol.y[2:]
    want_z = np.real(np.einsum("it,ij,jt->t", psis.conj(), sz, psis))
    got_z = out["site_xyz"][0, 2, :]
    assert np.allclose(got_z, want_z, atol=5e-8)
    # the drive actually does something
    assert want_z.min() < 0.45


def test_eig32_speed_mode_close_to_f64():
    """f32 speed mode (Pallas fused matmul, interpret off-TPU): ~1e-4 accuracy."""
    from quantumsimulations_tpu.dynamics.evolve import simulate_rare as sim

    p64 = _params(t_final=2.0e-4, steps=41)
    import dataclasses

    p32 = dataclasses.replace(p64, solver_method="eig32")
    t, ref = sim(dataclasses.replace(p64, solver_method="eig"))
    t2, fast = sim(p32)
    for key in ("Iz_sea", "Iz_R", "Ix_R"):
        assert np.allclose(fast[key], ref[key], atol=2e-4), key
    assert np.allclose(fast["state_norm"], 1.0, atol=1e-4)


def test_dopri_nan_divergence_exits_gracefully():
    """A NaN-producing coefficient function must not spin the while_loop to
    the iteration cap; the integrator exits via the step-size floor with the
    stall visible in n_accepted/n_rejected."""
    import time

    import jax.numpy as jnp

    dims = (2,)
    H0 = OperatorSum(dims, (ProductTerm(1.0e5, ((0, "z"),)),))
    V = OperatorSum(dims, (ProductTerm(1.0e4, ((0, "x"),)),))
    bad = TimeDependentHamiltonian(
        H0, [(V, lambda t: jnp.where(t > 1e-5, jnp.nan, 1.0))]
    )
    psi0 = np.array([1.0, 0.0], dtype=np.complex128)
    t = np.linspace(0.0, 1e-3, 11)
    t0 = time.time()
    out = dopri_propagate_traces(bad, psi0, t, dims, atol=1e-10, rtol=1e-9)
    assert time.time() - t0 < 120  # no multi-hour spin
    total = out["n_accepted"] + out["n_rejected"]
    assert total < 20_000_000  # exited via the h floor, not the cap


def test_krylov_assembled_segmented_dispatch(reference_solution, monkeypatch):
    """Both dispatch modes of the assembled Krylov trace produce identical
    rows: whole-output-steps-per-dispatch and (when one step exceeds the
    substep budget, as at production ||H||) substeps segmented INSIDE an
    output step with the observable row computed between dispatches."""
    from quantumsimulations_tpu.dynamics.krylov import krylov_traces_assembled

    params, model, t, _ = reference_solution
    args = (model.hamiltonian, model.psi0, t, model.dims,
            model.n_sea_effective, model.idx_rare)
    whole = krylov_traces_assembled(*args)
    monkeypatch.setenv("QST_KRYLOV_DISPATCH_SUBSTEPS", "1")  # force segmented
    segmented = krylov_traces_assembled(*args)
    np.testing.assert_allclose(segmented, whole, rtol=0, atol=1e-13)


def test_chebyshev_matches_eig(reference_solution):
    """The Chebyshev basis-sweep propagator (one sweep, all output times)
    must match the exact eig path at parity grade."""
    from quantumsimulations_tpu.dynamics.chebyshev import (
        chebyshev_traces_assembled,
    )

    params, model, t, exact = reference_solution
    rows = chebyshev_traces_assembled(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare,
        phi_block=16, terms_per_dispatch=64,
    )
    xyz = exact["site_xyz"]
    n = xyz.shape[0]
    import numpy as _np
    sea = xyz[: model.n_sea_effective].sum(axis=0)
    assert _np.allclose(rows[0], sea[0], atol=1e-10)
    assert _np.allclose(rows[2], sea[2], atol=1e-10)
    assert _np.allclose(rows[6], 1.0, atol=1e-11)


def test_auto_method_dispatch():
    """auto routes each Hilbert size to the measured winner (VERDICT r3 #2):
    eig while the host eigensolve is cheap, the benched parity-grade ext
    chain at dense dims (N=12 measured 437-530 s vs ~3,900 s for eig,
    BASELINE.md), matrix-free chebyshev beyond dense reach."""
    from quantumsimulations_tpu.dynamics.evolve import _auto_method

    assert _auto_method(128) == "eig"
    assert _auto_method(2048) == "eig"
    assert _auto_method(4096) == "ext"
    assert _auto_method(8192) == "ext"
    assert _auto_method(16384) == "cheb_step"
