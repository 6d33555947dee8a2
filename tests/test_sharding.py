"""Multi-device sharding on the virtual 8-device CPU mesh (SURVEY.md §4.4):
sharded-statevector H apply + Krylov step vs dense, and dp-sharded sweeps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from quantumsimulations_tpu.dynamics.eig_propagator import (
    eig_propagate_traces_batched,
    eigh_host,
)
from quantumsimulations_tpu.dynamics.krylov import make_krylov_step, spectral_norm_bound
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.params import DipolarRareParams
from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.parallel.mesh import make_mesh
from quantumsimulations_tpu.parallel.state_sharded import make_sharded_apply
from quantumsimulations_tpu.parallel.sweep_shard import eig_traces_assembled_sharded

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _params(n_sea=4, **kw):
    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f1A = 50e3
    base = dict(
        n_sea=n_sea,
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
        t_final=2.0e-4,
        steps=21,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )
    base.update(kw)
    return DipolarRareParams(**base)


@requires_8
@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sharded_apply_matches_dense(sp):
    params = _params(n_sea=4)
    model = build_model(params)
    H = model.hamiltonian
    dim = int(np.prod(model.dims))
    mesh = make_mesh(sp, sp=sp)

    apply_fn, _diag, sharding, _sh = make_sharded_apply(H, mesh, axis="sp")
    rng = np.random.default_rng(11)
    psi = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    psi /= np.linalg.norm(psi)

    re = jax.device_put(jnp.asarray(psi.real), sharding)
    im = jax.device_put(jnp.asarray(psi.imag), sharding)
    out_re, out_im = apply_fn(re, im)
    got = np.asarray(out_re) + 1j * np.asarray(out_im)
    want = H.to_dense() @ psi
    assert np.allclose(got, want, atol=1e-12 * max(1, np.abs(want).max()))


@requires_8
def test_sharded_apply_spin32_rare_local():
    """Rare site (dim 4) stays local; sharded qubits are the sea."""
    params = _params(n_sea=3, is_spin_three_half=True)
    model = build_model(params)
    dim = int(np.prod(model.dims))
    mesh = make_mesh(2, sp=2)
    apply_fn, _d, sharding, _s = make_sharded_apply(model.hamiltonian, mesh, axis="sp")
    rng = np.random.default_rng(5)
    psi = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    re = jax.device_put(jnp.asarray(psi.real), sharding)
    im = jax.device_put(jnp.asarray(psi.imag), sharding)
    out_re, out_im = apply_fn(re, im)
    got = np.asarray(out_re) + 1j * np.asarray(out_im)
    want = model.hamiltonian.to_dense() @ psi
    assert np.allclose(got, want, atol=1e-12 * max(1, np.abs(want).max()))


@requires_8
def test_sharded_krylov_step_matches_unsharded():
    """Full sharded time step: Lanczos with psum inner products on a sharded
    statevector equals the single-device step."""
    from functools import partial

    params = _params(n_sea=4)
    model = build_model(params)
    H = model.hamiltonian
    dim = int(np.prod(model.dims))
    sp = 4
    mesh = make_mesh(sp, sp=sp)
    dt = 2.0e-5

    # unsharded step
    step, n_sub = make_krylov_step(H, dt, m=24)
    psi0 = model.psi0
    want = step(Cplx.from_numpy(psi0)).to_numpy()

    # sharded step: same Lanczos inside shard_map with the sharded apply
    _, _, sharding, sh = make_sharded_apply(H, mesh, axis="sp")
    diag_dev = jax.device_put(jnp.asarray(sh.diag), sharding)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp")),
        out_specs=(P("sp"), P("sp")),
    )
    def sharded_step(psi_re, psi_im, diag):
        local_apply = lambda p: sh.local_apply(p, diag, "sp")
        stp, _ = make_krylov_step(
            H, dt, m=24, apply_h=local_apply, axis_name="sp",
            norm_bound=spectral_norm_bound(H),
        )
        out = stp(Cplx(psi_re, psi_im))
        return out.re, out.im

    re = jax.device_put(jnp.asarray(psi0.real), sharding)
    im = jax.device_put(jnp.asarray(psi0.imag), sharding)
    out_re, out_im = jax.jit(sharded_step)(re, im, diag_dev)
    got = np.asarray(out_re) + 1j * np.asarray(out_im)
    assert np.allclose(got, want, atol=1e-11)
    assert np.isclose(np.linalg.norm(got), 1.0, atol=1e-11)


@requires_8
@pytest.mark.parametrize("batch", [4, 6])  # 6 tests padding (8 devices, dp=8)
def test_dp_sharded_sweep_matches_unsharded(batch):
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
    )

    mesh = make_mesh(8, sp=1)
    params = [
        _params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * (500.0 * (i + 1)))
        for i in range(batch)
    ]
    models = [build_model(p) for p in params]
    t = np.linspace(0.0, params[0].t_final, params[0].steps)
    ws, Vs = zip(*[eigh_host(m.hamiltonian.to_dense()) for m in models])
    w = np.stack(ws)
    V = np.stack(Vs)
    psi0 = np.stack([m.psi0 for m in models])
    dims = models[0].dims
    nse = np.asarray([m.n_sea_effective for m in models])
    idx_rare = models[0].idx_rare

    plain = eig_traces_assembled_batched(w, V, psi0, t, dims, nse, idx_rare)
    sharded = eig_traces_assembled_sharded(
        w, V, psi0, t, dims, nse, idx_rare, mesh
    )
    assert sharded.shape == plain.shape == (batch, 8, len(t))
    assert np.allclose(sharded, plain, atol=1e-12)
    # norm row is exactly 1
    assert np.allclose(plain[:, 6, :], 1.0, atol=1e-11)


@requires_8
def test_assembled_rows_match_per_site_assembly():
    """Device-side assembly equals host-side assembly from per-site traces."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
        eig_propagate_traces_batched,
        TRACE_ROWS,
    )
    from quantumsimulations_tpu.dynamics.observables import assemble_traces

    params = [_params(), _params(drive_rare=False, is_center_rare=False)]
    models = [build_model(p) for p in params]
    t = np.linspace(0.0, params[0].t_final, params[0].steps)
    ws, Vs = zip(*[eigh_host(m.hamiltonian.to_dense()) for m in models])
    w, V = np.stack(ws), np.stack(Vs)
    psi0 = np.stack([m.psi0 for m in models])
    dims = models[0].dims
    nse = np.asarray([m.n_sea_effective for m in models])

    rows = eig_traces_assembled_batched(w, V, psi0, t, dims, nse, models[0].idx_rare)
    per_site = eig_propagate_traces_batched(w, V, psi0, t, dims)
    for b, m in enumerate(models):
        named = assemble_traces(
            per_site["site_xyz"][b], per_site["norm"][b], m.n_sea_effective, m.idx_rare
        )
        for i, key in enumerate(TRACE_ROWS[:7]):
            want = named["state_norm" if key == "state_norm" else key]
            assert np.allclose(rows[b, i], want, atol=1e-12), key


@requires_8
@pytest.mark.parametrize("batch", [4, 6])  # 6 tests padding
def test_dp_sharded_eig32_matches_unsharded32(batch):
    """eig32 under mesh sharding (VERDICT r1 item 7): the Pallas f32 path
    sharded over 'dp' via shard_map matches the single-device f32 path and
    stays within the f32 envelope of the f64 truth."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
        eig_traces_assembled_batched32,
    )
    from quantumsimulations_tpu.parallel.sweep_shard import (
        eig_traces_assembled_sharded32,
    )

    mesh = make_mesh(8, sp=1)
    params = [
        _params(omega_rf_sea=8.1812e7 * 3.0 - 2 * np.pi * (500.0 * (i + 1)))
        for i in range(batch)
    ]
    models = [build_model(p) for p in params]
    t = np.linspace(0.0, params[0].t_final, params[0].steps)
    ws, Vs = zip(*[eigh_host(m.hamiltonian.to_dense()) for m in models])
    w, V = np.stack(ws), np.stack(Vs)
    psi0 = np.stack([m.psi0 for m in models])
    dims = models[0].dims
    nse = np.asarray([m.n_sea_effective for m in models])
    idx_rare = models[0].idx_rare

    plain32 = eig_traces_assembled_batched32(w, V, psi0, t, dims, nse, idx_rare)
    sharded32 = eig_traces_assembled_sharded32(
        w, V, psi0, t, dims, nse, idx_rare, mesh
    )
    truth = eig_traces_assembled_batched(w, V, psi0, t, dims, nse, idx_rare)
    assert sharded32.shape == plain32.shape == (batch, 8, len(t))
    # identical f32 arithmetic, just partitioned: near-bitwise
    assert np.allclose(sharded32, plain32, atol=1e-6)
    # f32 envelope vs the f64 truth (observables are O(n_sea))
    assert np.allclose(sharded32[:, :7], truth[:, :7], atol=5e-4)
    assert np.allclose(sharded32[:, 6, :], 1.0, atol=1e-4)  # norm row


@requires_8
def test_grid2d_eig32_sharded(tmp_path):
    """grid2d with solver_method='eig32' + mesh runs end to end on the
    virtual mesh and produces the standard artifact tree."""
    import json
    import os

    from quantumsimulations_tpu.sweep.grid2d import run_grid2d

    mesh = make_mesh(8, sp=1)
    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f_Az = gamma_sea * B0 / (2 * np.pi)
    dirs = run_grid2d(
        f_Az=f_Az,
        f1A_values_Hz=[30e3, 50e3],
        gamma_sea=gamma_sea,
        gamma_rare=gamma_rare,
        n_detunings=3,
        n_sea=4,
        t_final=2e-4,
        steps=40,
        out_root=str(tmp_path / "grid"),
        coarse_window=4,
        solver_method="eig32",
        make_plots=False,
        mesh=mesh,
    )
    assert len(dirs) == 2
    for d in dirs:
        with open(os.path.join(d, "summary.json")) as f:
            s = json.load(f)
        assert len(s["sweep_results"]) == 3
        for row in s["sweep_results"]:
            assert np.isfinite(row["delta_Hz"])


@requires_8
@pytest.mark.parametrize("sp", [2, 8])
def test_sharded_krylov_full_trace_matches_eig(sp):
    """Full sharded Krylov trace (observables + substeps in one shard_map
    program) against the dense-eig oracle — the large-bath engine's
    correctness anchor (SURVEY.md §5)."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
    )
    from quantumsimulations_tpu.parallel.state_sharded import (
        krylov_traces_assembled_sharded,
    )

    params = _params(n_sea=5, steps=12, t_final=12 * 1e-5)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    mesh = make_mesh(sp, sp=sp)

    rows = krylov_traces_assembled_sharded(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, mesh,
    )
    w, V = eigh_host(model.hamiltonian.to_dense())
    ref = eig_traces_assembled_batched(
        w[None], V[None], model.psi0[None], t, model.dims,
        np.asarray([model.n_sea_effective]), model.idx_rare,
    )[0]
    assert rows.shape == ref.shape == (8, len(t))
    assert np.abs(rows[:7] - ref[:7]).max() < 1e-10
    assert np.allclose(rows[6], 1.0, atol=1e-11)  # norm conservation
    assert np.allclose(rows[7], ref[7][0], atol=1e-8)  # energy constant


def test_krylov_traces_assembled_matches_eig():
    """Single-device assembled Krylov trace vs the eig propagator."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
    )
    from quantumsimulations_tpu.dynamics.krylov import krylov_traces_assembled

    params = _params(n_sea=5, steps=12, t_final=12 * 1e-5)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    rows = krylov_traces_assembled(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare,
    )
    w, V = eigh_host(model.hamiltonian.to_dense())
    ref = eig_traces_assembled_batched(
        w[None], V[None], model.psi0[None], t, model.dims,
        np.asarray([model.n_sea_effective]), model.idx_rare,
    )[0]
    assert np.abs(rows[:7] - ref[:7]).max() < 1e-10


@requires_8
@pytest.mark.parametrize("sp", [2, 4])
def test_cheb_sharded_matches_single_chip(sp):
    """DR-column-sharded limb-domain Chebyshev stepping
    (parallel/cheb_sharded.py) vs the single-chip ext tier: the digit
    arithmetic regroups exactly across the psum, so traces agree to f64
    roundoff of the (identical) accumulator arithmetic."""
    from quantumsimulations_tpu.dynamics.cheb_step import chebyshev_step_traces
    from quantumsimulations_tpu.parallel.cheb_sharded import (
        chebyshev_step_traces_sharded,
    )

    p = _params(n_sea=4, t_final=2e-3, steps=24)
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    ref = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        steps_per_dispatch=8, arithmetic="ext",
    )
    mesh = make_mesh(sp, sp=sp)
    rows = chebyshev_step_traces_sharded(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        mesh=mesh, axis="sp", steps_per_dispatch=8,
    )
    np.testing.assert_allclose(rows, ref, rtol=0.0, atol=1e-13)
    assert np.abs(rows[6] - 1.0).max() < 1e-12
