"""Split-matmul apply (ops/split_apply.py) and the Chebyshev stepping
propagator (dynamics/cheb_step.py): decomposition exactness, apply parity
with the dense oracle, trace parity with the eig propagator, mid-run
checkpoint resume, and the evolve-API dispatch.

Reference anchor: these paths replace qt.sesolve
(dipolar_ensemble_with_rare.py:653-666) beyond dense-operator reach.
"""

import os
import tempfile

import numpy as np
import pytest

from quantumsimulations_tpu.dynamics.cheb_step import chebyshev_step_traces
from quantumsimulations_tpu.dynamics.eig_propagator import (
    eig_traces_assembled_batched,
    eigh_host,
)
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.params import DipolarRareParams
from quantumsimulations_tpu.ops.cplx import Cplx
from quantumsimulations_tpu.ops.split_apply import (
    default_split,
    make_split_apply,
    split_operator,
)


def _params(n_sea=4, *, s32=False, center=True, t_final=2e-3, steps=40):
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
        is_spin_three_half=s32,
        is_center_rare=center,
    )


CASES = [
    pytest.param(dict(n_sea=4), id="n4-spinhalf"),
    pytest.param(dict(n_sea=3, s32=True), id="n3-spin32"),
    pytest.param(dict(n_sea=4, center=False), id="n4-control-geometry"),
]


@pytest.mark.parametrize("kw", CASES)
def test_split_operator_dense_exact(kw):
    """The split decomposition reassembles the dense H bit-for-bit (the
    buckets partition the term set; every plane stays real by i-folding)."""
    m = build_model(_params(**kw))
    H = m.hamiltonian
    so = split_operator(H)
    assert np.array_equal(so.to_dense(), so.to_dense())
    np.testing.assert_allclose(
        so.to_dense(), H.to_dense(), rtol=0.0, atol=1e-12 * np.abs(H.to_dense()).max()
    )
    # the dipolar family's cross bucket is real (x-x and y-y pair terms only)
    assert so.cross_im_L.shape[0] == 0


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("kw", CASES)
def test_split_apply_matches_dense_matvec(kw, fused):
    m = build_model(_params(**kw))
    H = m.hamiltonian
    Hd = H.to_dense()
    ap, so = make_split_apply(H, scale=0.25, fused=fused)
    rng = np.random.default_rng(7)
    psi = rng.standard_normal(so.DL * so.DR) + 1j * rng.standard_normal(so.DL * so.DR)
    import jax.numpy as jnp

    out = ap(Cplx(jnp.asarray(psi.real.reshape(so.DL, so.DR)),
                  jnp.asarray(psi.imag.reshape(so.DL, so.DR))))
    got = (np.asarray(out.re) + 1j * np.asarray(out.im)).reshape(-1)
    ref = 0.25 * (Hd @ psi)
    np.testing.assert_allclose(got, ref, rtol=0.0, atol=1e-13 * np.abs(ref).max())


def test_default_split_balances():
    assert default_split((2,) * 14) == 7
    # mixed dims: 2*2*2*4 = 32 -> split after site 2 gives 8 x 4... the
    # balanced choice minimizes DL*DR*(DL+DR)
    s = default_split((2, 2, 2, 4))
    DL = int(np.prod((2, 2, 2, 4)[:s]))
    DR = int(np.prod((2, 2, 2, 4)[s:]))
    assert {DL, DR} == {4, 8}


@pytest.mark.parametrize("arith", ["f64", "limb", "ext"])
@pytest.mark.parametrize("kw", CASES)
def test_cheb_step_matches_eig(kw, arith):
    p = _params(**kw)
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    w, V = eigh_host(m.hamiltonian.to_dense())
    ref = eig_traces_assembled_batched(
        w[None], V[None], m.psi0[None], t, m.dims,
        np.asarray([m.n_sea_effective]), m.idx_rare,
    )[0]
    rows = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        steps_per_dispatch=16, arithmetic=arith,
    )
    np.testing.assert_allclose(rows[:7], ref[:7], rtol=0.0, atol=5e-12)
    # energy row: the conserved t=0 constant
    np.testing.assert_allclose(rows[7], ref[7, 0], rtol=1e-9)
    assert np.abs(rows[6] - 1.0).max() < 1e-12  # norm drift


@pytest.mark.parametrize("kw", CASES)
def test_split_apply_limb_matches_dense_matvec(kw):
    """The int8-limb apply (ops/split_apply_limb.py) equals the dense
    matvec to f64 roundoff — the arithmetic tier behind
    ``arithmetic="limb"``."""
    from quantumsimulations_tpu.ops.split_apply_limb import make_split_apply_limb

    m = build_model(_params(**kw))
    H = m.hamiltonian
    Hd = H.to_dense()
    ap, so = make_split_apply_limb(H, scale=0.25)
    rng = np.random.default_rng(7)
    psi = rng.standard_normal(so.DL * so.DR) + 1j * rng.standard_normal(so.DL * so.DR)
    import jax.numpy as jnp

    out = ap(Cplx(jnp.asarray(psi.real.reshape(so.DL, so.DR)),
                  jnp.asarray(psi.imag.reshape(so.DL, so.DR))))
    got = (np.asarray(out.re) + 1j * np.asarray(out.im)).reshape(-1)
    ref = 0.25 * (Hd @ psi)
    np.testing.assert_allclose(got, ref, rtol=0.0, atol=2e-15 * np.abs(ref).max())


def test_cheb_step_resume_bit_identical(monkeypatch):
    """Kill after the first dispatch, rerun with the same ckpt_dir: the
    resumed trace must equal the uninterrupted one EXACTLY (the state
    round-trips as exact f64 planes; recomputation is deterministic)."""
    p = _params(n_sea=4)
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    full = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        steps_per_dispatch=16,
    )
    with tempfile.TemporaryDirectory() as ck:
        monkeypatch.setenv("QST_CHEB_ABORT_AFTER_DISPATCHES", "1")
        with pytest.raises(RuntimeError, match="aborted after 1"):
            chebyshev_step_traces(
                m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
                m.idx_rare, steps_per_dispatch=16, ckpt_dir=ck,
            )
        monkeypatch.delenv("QST_CHEB_ABORT_AFTER_DISPATCHES")
        resumed = chebyshev_step_traces(
            m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
            m.idx_rare, steps_per_dispatch=16, ckpt_dir=ck,
        )
    assert np.array_equal(full, resumed)


def test_cheb_step_cooperative_stop_resumes_lossless(monkeypatch, tmp_path):
    """A stop flag makes the run checkpoint and raise CooperativeStop at the
    next dispatch boundary; removing the flag and rerunning completes the
    trace bit-identically (the eviction path bench.py uses to claim the
    device from a multi-hour background trace)."""
    from quantumsimulations_tpu.dynamics.cheb_step import CooperativeStop

    p = _params(n_sea=4)
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    full = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        steps_per_dispatch=16,
    )
    stop = tmp_path / "stop_flag"
    ck = tmp_path / "ckpt"
    monkeypatch.setenv("QST_STOP_FILE", str(stop))
    stop.write_text("claimed\n")
    with pytest.raises(CooperativeStop, match="stop file .* at step 16/40"):
        chebyshev_step_traces(
            m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
            m.idx_rare, steps_per_dispatch=16, ckpt_dir=str(ck),
        )
    stop.unlink()
    resumed = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective,
        m.idx_rare, steps_per_dispatch=16, ckpt_dir=str(ck),
    )
    assert np.array_equal(full, resumed)


def test_grid_ops_roundtrip_and_carry():
    """Direct unit tests of the limb-domain grid primitives
    (ops/split_apply_ext.py): split->val round-trip at grid resolution,
    carry cascade vs direct evaluation, host/device split agreement."""
    import jax.numpy as jnp

    from quantumsimulations_tpu.ops.split_apply_ext import (
        GRID_BITS,
        GRID_LIMBS,
        _make_grid_ops,
        _split_host,
    )

    ops = _make_grid_ops(GRID_BITS, GRID_LIMBS)
    rng = np.random.default_rng(3)
    x = rng.uniform(-3.0, 3.0, size=(64, 32))  # recurrence-range values
    res = 2.0 ** (GRID_BITS - GRID_BITS * GRID_LIMBS)

    # split -> val round-trip: exact to the grid resolution
    limbs_d = ops.split(jnp.asarray(x))
    err = np.abs(np.asarray(ops.val(limbs_d)) - x).max()
    assert err <= res, (err, res)

    # host and device splits produce identical canonical limbs
    np.testing.assert_array_equal(
        np.asarray(limbs_d), _split_host(x, GRID_BITS, GRID_LIMBS))

    # carry of doubled digits == value doubled (the recurrence's 2*P - T)
    y = rng.uniform(-1.0, 1.0, size=(64, 32))
    ly = ops.split(jnp.asarray(y))
    d = 2 * np.asarray(limbs_d, np.int32) - np.asarray(ly, np.int32)
    got = np.asarray(ops.val(ops.carry(jnp.asarray(d))))
    np.testing.assert_allclose(got, 2 * x - y, rtol=0.0, atol=4 * res)


def test_simulate_rare_cheb_step_dispatch():
    """The public API runs the engine end to end (reference-compatible keys,
    dipolar_ensemble_with_rare.py:669-680)."""
    from dataclasses import replace

    from quantumsimulations_tpu.dynamics.evolve import simulate_rare

    p = replace(_params(n_sea=3, steps=12, t_final=5e-4), solver_method="cheb_step")
    t, traces = simulate_rare(p)
    assert set(traces) == {
        "Ix_sea", "Iy_sea", "Iz_sea", "Iz_R", "Ix_R", "Iy_R", "state_norm"
    }
    assert len(t) == 12
    p2 = replace(p, solver_method="eig")
    _, ref = simulate_rare(p2)
    for k in traces:
        np.testing.assert_allclose(traces[k], ref[k], rtol=0.0, atol=5e-12)


def test_default_arith_per_backend(monkeypatch):
    """The shipped default apply tier tracks the measured winner per backend
    (experiments/arith_ladder_n13.json, dim 16384 warm steps/s through the
    public entry): fused-Pallas limb-domain "extp" on TPU, plain f64 dots
    elsewhere; QST_CHEB_ARITH overrides."""
    from quantumsimulations_tpu.dynamics.cheb_step import _default_arith

    assert _default_arith("tpu") == "extp"
    assert _default_arith("axon") == "extp"
    assert _default_arith("cpu") == "f64"
    assert _default_arith("gpu") == "f64"

    # env override wins over the backend default (exercised on CPU where
    # the default would be f64)
    monkeypatch.setenv("QST_CHEB_ARITH", "ext")
    p = _params(n_sea=3, steps=6, t_final=2e-4)
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, p.steps)
    rows = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare,
        steps_per_dispatch=6,
    )
    w, V = eigh_host(m.hamiltonian.to_dense())
    ref = eig_traces_assembled_batched(
        w[None], V[None], m.psi0[None], t, m.dims,
        np.asarray([m.n_sea_effective]), m.idx_rare,
    )[0]
    np.testing.assert_allclose(rows[:7], ref[:7], rtol=0.0, atol=1e-11)
    np.testing.assert_allclose(rows[7], ref[7, 0], rtol=1e-9)


def test_engine_cache_reuse_and_clear():
    """Repeated calls on the same operator reuse one cached engine (the
    warm-up/measure and sweep-resume pattern); clear_engine_cache releases
    the pinned device buffers and H references."""
    from quantumsimulations_tpu.dynamics import cheb_step as cs

    p = _params()
    m = build_model(p)
    t = np.linspace(0.0, p.t_final, 8)
    cs.clear_engine_cache()
    rows1 = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare)
    assert len(cs._ENGINE_CACHE) == 1
    (entry,) = cs._ENGINE_CACHE.values()
    assert entry["H"] is m.hamiltonian
    rows2 = chebyshev_step_traces(
        m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare)
    assert len(cs._ENGINE_CACHE) == 1  # same engine, not a rebuild
    np.testing.assert_array_equal(rows1, rows2)
    assert cs.clear_engine_cache() == 1
    assert len(cs._ENGINE_CACHE) == 0


def test_engine_cache_bounded():
    """The FIFO bound holds: distinct operators never pin more than
    _ENGINE_CACHE_MAX engines' device buffers."""
    from quantumsimulations_tpu.dynamics import cheb_step as cs

    cs.clear_engine_cache()
    t = np.linspace(0.0, 2e-4, 3)
    models = []
    for k in range(cs._ENGINE_CACHE_MAX + 2):
        p = _params(t_final=2e-4, steps=3)
        m = build_model(p)
        models.append(m)  # keep H alive: ids must stay distinct
        chebyshev_step_traces(
            m.hamiltonian, m.psi0, t, m.dims, m.n_sea_effective, m.idx_rare)
    assert len(cs._ENGINE_CACHE) == cs._ENGINE_CACHE_MAX
    cs.clear_engine_cache()


def test_default_steps_per_dispatch_table():
    """The dim-aware dispatch sizing must stay inside the measured-safe
    envelope (docs/ROUND4.md fault record: spd=64 crashes the TPU worker at
    dim 16384 and spd=8 at dim 32768; 64/8/1 are proven by multi-hour runs)."""
    from quantumsimulations_tpu.dynamics.cheb_step import (
        _default_steps_per_dispatch,
    )

    assert _default_steps_per_dispatch(128) == 64
    assert _default_steps_per_dispatch(8192) == 64
    assert _default_steps_per_dispatch(16384) == 8
    assert _default_steps_per_dispatch(32768) == 1
    assert _default_steps_per_dispatch(1 << 16) == 1
