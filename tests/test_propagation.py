"""Propagator parity: eig path vs scipy exact expm and high-accuracy ODE.

These are the oracle tests SURVEY.md §4 calls for (the CPU stand-in for
``qutip.sesolve`` parity; QuTiP itself wraps the same SciPy integrators).
"""

import numpy as np
import pytest
import scipy.linalg

from quantumsimulations_tpu.dynamics.eig_propagator import (
    eig_propagate_traces,
    eig_propagate_traces_batched,
    eigh_host,
)
from quantumsimulations_tpu.dynamics.evolve import simulate_rare
from quantumsimulations_tpu.dynamics.phase import reduced_angles
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.params import DipolarRareParams

import jax.numpy as jnp


def _mini_params(**kw):
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
        B1_rare=2 * np.pi * f1A / gamma_rare,
        omega_rf_sea=gamma_sea * B0 - 2 * np.pi * 777.0,
        omega_rf_rare=gamma_rare * B0,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        t_final=2.0e-3,
        steps=401,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )
    base.update(kw)
    return DipolarRareParams(**base)


def _oracle_traces(H, psi0, t, dims):
    """Exact traces via scipy expm at each output time (small dims only)."""
    from quantumsimulations_tpu.ops.spin import spin_matrix

    def embed(op, site):
        out = np.array([[1.0 + 0j]])
        for k, d in enumerate(dims):
            out = np.kron(out, op if k == site else np.eye(d, dtype=complex))
        return out

    obs = {}
    n = len(dims)
    for site in range(n):
        s = (dims[site] - 1) / 2.0
        for w in "xyz":
            obs[(site, w)] = embed(spin_matrix(s, w), site)

    # eigen-based exact evolution (oracle independent of framework phase path)
    w_, V_ = scipy.linalg.eigh(H)
    c = V_.conj().T @ psi0
    out = {k: np.zeros(len(t)) for k in obs}
    norms = np.zeros(len(t))
    for i, ti in enumerate(t):
        psi_t = V_ @ (np.exp(-1j * w_ * ti) * c)
        norms[i] = np.linalg.norm(psi_t)
        for k, O in obs.items():
            out[k][i] = np.real(psi_t.conj() @ O @ psi_t)
    return out, norms


def _exact_mod_2pi(x_decimal):
    from decimal import Decimal, getcontext

    getcontext().prec = 60
    two_pi = Decimal("6.283185307179586476925286766559005768394338798750211641949889")
    n = (x_decimal / two_pi).quantize(Decimal(1), rounding="ROUND_HALF_EVEN")
    return float(x_decimal - n * two_pi)


def test_phase_reduction_accuracy():
    # angles ~1e8 rad: naive w*t mod 2pi loses ~1e-8; ours must stay <1e-12
    from decimal import Decimal

    w = np.array([3.7e6, -2.9e6, 1.234567e5])
    t = np.array([29.99, 17.3, 3.0])
    got = np.asarray(reduced_angles(jnp.asarray(w), jnp.asarray(t)))
    for i in range(len(w)):
        for j in range(len(t)):
            r = _exact_mod_2pi(Decimal(w[i]) * Decimal(t[j]))
            d = (got[i, j] - r + np.pi) % (2 * np.pi) - np.pi
            assert abs(d) < 1e-12, (i, j, d)


def test_grid_phase_accuracy():
    """The production path: uniform-grid phases accurate to ~1e-11 rad at 30 s."""
    from decimal import Decimal

    from quantumsimulations_tpu.dynamics.phase import (
        grid_angles,
        reduce_wdt_host,
        uniform_grid_decomposition,
    )

    rng = np.random.default_rng(7)
    w = np.concatenate([[3.7e6, -2.9e6, 1.234567e5], rng.uniform(-4e6, 4e6, 13)])
    times = np.linspace(0.0, 30.0, 20000)[::197]  # spot-check subset of the grid
    full = np.linspace(0.0, 30.0, 20000)
    dt, eps = uniform_grid_decomposition(full)
    r = reduce_wdt_host(w, dt)
    idx = np.arange(len(full), dtype=np.float64)[::197]
    got = np.asarray(
        grid_angles(jnp.asarray(r), jnp.asarray(idx), jnp.asarray(w), jnp.asarray(eps[::197]))
    )
    for i in range(len(w)):
        for j, tj in enumerate(times):
            want = _exact_mod_2pi(Decimal(w[i]) * Decimal(tj))
            d = (got[i, j] - want + np.pi) % (2 * np.pi) - np.pi
            assert abs(d) < 1e-10, (i, j, d)


@pytest.mark.parametrize("drive_rare", [False, True])
def test_eig_traces_match_exact_oracle(drive_rare):
    params = _mini_params(drive_rare=drive_rare)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    H = model.hamiltonian.to_dense()
    w, V = eigh_host(H)
    out = eig_propagate_traces(w, V, model.psi0, t, model.dims)

    oracle, onorms = _oracle_traces(H, model.psi0, t, model.dims)
    n_sites = len(model.dims)
    for site in range(n_sites):
        for k, wch in enumerate("xyz"):
            got = out["site_xyz"][site, k]
            want = oracle[(site, wch)]
            assert np.allclose(got, want, atol=5e-13), (site, wch)
    assert np.allclose(out["norm"], onorms, atol=1e-12)
    assert np.allclose(out["norm"], 1.0, atol=1e-11)
    # energy conservation (H time-independent)
    assert np.allclose(out["energy"], out["energy"][0], atol=1e-9 * max(1.0, abs(out["energy"][0])))


def test_simulate_rare_against_ode_oracle():
    """Full-stack parity vs scipy solve_ivp (DOP853 at tight tol) — the
    sesolve stand-in: i dpsi/dt = -i H psi, observables to <=1e-8."""
    from scipy.integrate import solve_ivp

    params = _mini_params(n_sea=2, t_final=1.0e-3, steps=101, drive_rare=True)
    t, traces = simulate_rare(params)

    model = build_model(params)
    H = model.hamiltonian.to_dense()

    def rhs(_t, y):
        psi = y[: len(y) // 2] + 1j * y[len(y) // 2 :]
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    y0 = np.concatenate([model.psi0.real, model.psi0.imag])
    sol = solve_ivp(rhs, (0, params.t_final), y0, t_eval=t, method="DOP853",
                    rtol=1e-12, atol=1e-14)
    assert sol.success
    psis = sol.y[: len(model.psi0)] + 1j * sol.y[len(model.psi0):]

    from quantumsimulations_tpu.ops.spin import spin_matrix

    def embed(op, site):
        out = np.array([[1.0 + 0j]])
        for k, d in enumerate(model.dims):
            out = np.kron(out, op if k == site else np.eye(d, dtype=complex))
        return out

    n_sea_eff = model.n_sea_effective
    Iz_sea = sum(embed(spin_matrix(0.5, "z"), j) for j in range(n_sea_eff))
    want = np.real(np.einsum("it,ij,jt->t", psis.conj(), Iz_sea, psis))
    assert np.allclose(traces["Iz_sea"], want, atol=1e-8)

    s_r = 1.5 if (params.is_spin_three_half and params.is_center_rare) else 0.5
    Iz_R = embed(spin_matrix(s_r, "z"), model.idx_rare)
    want_r = np.real(np.einsum("it,ij,jt->t", psis.conj(), Iz_R, psis))
    assert np.allclose(traces["Iz_R"], want_r, atol=1e-8)
    assert set(traces.keys()) == {
        "Ix_sea", "Iy_sea", "Iz_sea", "Iz_R", "Ix_R", "Iy_R", "state_norm",
    }


def test_batched_matches_single():
    p1 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 500.0)
    p2 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 1500.0, drive_rare=True)
    t = np.linspace(0.0, p1.t_final, p1.steps)
    singles = []
    ws, Vs, psis = [], [], []
    for p in (p1, p2):
        m = build_model(p)
        H = m.hamiltonian.to_dense()
        w, V = eigh_host(H)
        singles.append(eig_propagate_traces(w, V, m.psi0, t, m.dims))
        ws.append(w); Vs.append(V); psis.append(m.psi0)
    dims = build_model(p1).dims
    batched = eig_propagate_traces_batched(
        np.stack(ws), np.stack(Vs), np.stack(psis), t, dims
    )
    for b in range(2):
        assert np.allclose(batched["site_xyz"][b], singles[b]["site_xyz"], atol=1e-12)
        assert np.allclose(batched["norm"][b], singles[b]["norm"], atol=1e-12)


def test_two_spin_rabi_analytic():
    """Single driven spin (n_sea=1, no couplings beyond tiny dipolar):
    on-resonance Rabi flopping of <Iz> at frequency omega1 — analytic check
    with dipolar couplings zeroed via dipolar_scale=0."""
    gamma = 1.0e6
    f1 = 1.0e3
    p = DipolarRareParams(
        n_sea=1,
        gamma_sea=gamma,
        gamma_rare=gamma,
        B0_sea=1.0,
        B0_rare=1.0,
        B1_sea=2 * np.pi * f1 / gamma,
        B1_rare=0.0,
        dipolar_scale=0.0,
        shell_scale=1.0,
        t_final=2.0e-3,
        steps=501,
        drive_sea=True,
        drive_rare=False,
        is_spin_three_half=False,
        is_center_rare=True,
        phi_sea=0.0,
    )
    t, traces = simulate_rare(p)
    omega1 = 2 * np.pi * f1
    # sea starts in |down> (init_x_sign=-1): <Iz>(t) = -0.5 cos(omega1 t)
    assert np.allclose(traces["Iz_sea"], -0.5 * np.cos(omega1 * t), atol=1e-10)
    # rare spin untouched: <Iz_R> = +0.5 constant
    assert np.allclose(traces["Iz_R"], 0.5, atol=1e-12)


def test_assembled_batched_grouped_fetch_bit_identical(monkeypatch):
    """The grouped overlapped-fetch path (QST_N6_FETCH_GROUPS > 1) must
    return bit-identical traces to the single-dispatch path, including when
    the chunk count does not divide evenly into groups."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
    )

    p1 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 500.0)
    p2 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 1500.0,
                      drive_rare=True)
    t = np.linspace(0.0, p1.t_final, 700)
    ws, Vs, psis, nse = [], [], [], []
    for p in (p1, p2):
        m = build_model(p)
        w, V = eigh_host(m.hamiltonian.to_dense())
        ws.append(w); Vs.append(V); psis.append(m.psi0)
        nse.append(m.n_sea_effective)
    m0 = build_model(p1)
    args = (np.stack(ws), np.stack(Vs), np.stack(psis), t, m0.dims,
            np.asarray(nse), m0.idx_rare)

    monkeypatch.setenv("QST_N6_FETCH_GROUPS", "1")
    base = eig_traces_assembled_batched(*args, t_chunk=64)  # 11 chunks
    for groups in ("4", "3"):  # 3 does not divide 11: exercises padding
        monkeypatch.setenv("QST_N6_FETCH_GROUPS", groups)
        got = eig_traces_assembled_batched(*args, t_chunk=64)
        assert got.shape == base.shape
        assert np.array_equal(got, base)


def test_assembled_batched_packed_transfer(monkeypatch):
    """The byte-packed transfer format (48-bit fixed-point observables +
    f32 norm/energy residuals, eig_propagator._PACK_BITS) must reproduce
    the raw-f64 traces to its documented quantization bound in both the
    single-dispatch and grouped paths: |obs err| <= scale*2^-46 per row,
    norm row err ~1e-20 (f32 of the drift value), energy row err
    <= |e0|*2^-52 + f32 roundoff of the residual."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        _pack_scales,
        eig_traces_assembled_batched,
    )

    p1 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 500.0)
    p2 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 1500.0,
                      drive_rare=True)
    t = np.linspace(0.0, p1.t_final, 700)
    ws, Vs, psis, nse = [], [], [], []
    for p in (p1, p2):
        m = build_model(p)
        w, V = eigh_host(m.hamiltonian.to_dense())
        ws.append(w); Vs.append(V); psis.append(m.psi0)
        nse.append(m.n_sea_effective)
    m0 = build_model(p1)
    args = (np.stack(ws), np.stack(Vs), np.stack(psis), t, m0.dims,
            np.asarray(nse), m0.idx_rare)

    scales = _pack_scales(np.asarray(nse), m0.dims, m0.idx_rare)
    for groups in ("1", "4"):
        monkeypatch.setenv("QST_N6_FETCH_GROUPS", groups)
        raw = eig_traces_assembled_batched(*args, t_chunk=64, pack=False)
        packed = eig_traces_assembled_batched(*args, t_chunk=64, pack=True)
        assert packed.shape == raw.shape
        q = scales * 2.0 ** -46  # (B, 6) quantization bound per row
        for b in range(raw.shape[0]):
            for row in range(6):
                assert np.abs(packed[b, row] - raw[b, row]).max() <= q[b, row]
        # norm: f32 residual of a ~1e-13 drift — sub-1e-15 absolute
        assert np.abs(packed[:, 6] - raw[:, 6]).max() < 1e-15
        # energy: e0 exact f64 + f32 residual of roundoff-level fluctuation
        e_scale = np.abs(raw[:, 7]).max()
        assert np.abs(packed[:, 7] - raw[:, 7]).max() < 1e-7 * max(e_scale, 1.0)


def test_packed_transfer_preserves_fault_visibility(monkeypatch):
    """Corruption must never ship as plausible finite values: a non-finite
    observable (device fault, NaN input) or one outside its physics bound
    (unrepresentable in the fixed-point format) unpacks to NaN — the same
    visibility the raw-f64 path gives a NaN, rather than the
    implementation-defined result of casting NaN/Inf to int32."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
    )

    p1 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 500.0)
    p2 = _mini_params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * 1500.0,
                      drive_rare=True)
    t = np.linspace(0.0, p1.t_final, 700)
    ws, Vs, psis, nse = [], [], [], []
    for p in (p1, p2):
        m = build_model(p)
        w, V = eigh_host(m.hamiltonian.to_dense())
        ws.append(w); Vs.append(V); psis.append(m.psi0)
        nse.append(m.n_sea_effective)
    m0 = build_model(p1)

    # Sim 0: NaN in the state (the documented TPU-worker fault class).
    bad_psi = psis[0].copy()
    bad_psi[0] = np.nan
    args = (np.stack(ws), np.stack(Vs), np.stack([bad_psi, psis[1]]), t,
            m0.dims, np.asarray(nse), m0.idx_rare)
    for groups in ("1", "4"):
        monkeypatch.setenv("QST_N6_FETCH_GROUPS", groups)
        packed = eig_traces_assembled_batched(*args, t_chunk=64, pack=True)
        assert np.isnan(packed[0, :6]).all()   # corrupted sim: visible
        assert np.isfinite(packed[1]).all()    # healthy sim: untouched

    # Sim 0: finite but out of the physics bound the scale encodes
    # (norm ~1e3 state -> observables ~1e6x the bound): unrepresentable,
    # ships as NaN rather than a silently wrapped finite value.
    huge_psi = psis[0] * 1e3
    args = (np.stack(ws), np.stack(Vs), np.stack([huge_psi, psis[1]]), t,
            m0.dims, np.asarray(nse), m0.idx_rare)
    monkeypatch.setenv("QST_N6_FETCH_GROUPS", "1")
    from quantumsimulations_tpu.dynamics.eig_propagator import _pack_scales

    raw = eig_traces_assembled_batched(*args, t_chunk=64, pack=False)
    packed = eig_traces_assembled_batched(*args, t_chunk=64, pack=True)
    scales = _pack_scales(np.asarray(nse), m0.dims, m0.idx_rare)
    # Every value past its row's bound is NaN (none wrap to finite garbage);
    # values still inside the representable range (zero crossings) survive.
    over = np.abs(raw[0, :6]) > scales[0][:, None] * 1.0001
    assert over.any()
    assert np.isnan(packed[0, :6][over]).all()
    assert np.isfinite(packed[1]).all()
