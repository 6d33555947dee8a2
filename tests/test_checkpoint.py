"""Checkpoint/resume of stepping propagation and multihost init fallback."""

import numpy as np

from quantumsimulations_tpu.dynamics.checkpoint import (
    krylov_propagate_traces_checkpointed,
    latest_snapshot,
    save_snapshot,
)
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.models.params import DipolarRareParams
from quantumsimulations_tpu.parallel.distributed import global_mesh, initialize_multihost


def _params():
    gamma = 8.1812e7
    return DipolarRareParams(
        n_sea=2,
        gamma_sea=gamma,
        gamma_rare=6.976e7,
        B0_sea=3.0,
        B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma,
        B1_rare=2 * np.pi * 7e4 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 800.0,
        omega_rf_rare=6.976e7 * 3.0,
        dipolar_scale=1e-7 * 1.054571817e-34,
        shell_scale=0.282393e-9,
        t_final=2.0e-4,
        steps=21,
        drive_sea=True,
        drive_rare=True,
        is_spin_three_half=False,
        is_center_rare=True,
    )


def test_snapshot_roundtrip(tmp_path):
    psi = np.arange(8, dtype=np.complex128) + 1j
    save_snapshot(str(tmp_path), 5, psi)
    save_snapshot(str(tmp_path), 10, 2 * psi)
    step, got = latest_snapshot(str(tmp_path))
    assert step == 10
    assert np.allclose(got, 2 * psi)


def test_snapshot_pruning(tmp_path):
    psi = np.ones(4, dtype=np.complex128)
    for k in (1, 2, 3, 4):
        save_snapshot(str(tmp_path), k, psi, keep_last=2)
    import os

    snaps = [f for f in os.listdir(tmp_path) if f.startswith("state_")]
    assert len(snaps) == 2


def test_checkpointed_krylov_resume_matches_uninterrupted(tmp_path):
    params = _params()
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)

    full = krylov_propagate_traces_checkpointed(
        model.hamiltonian, model.psi0, t, model.dims,
        ckpt_dir=str(tmp_path / "a"), ckpt_every=0, m=24,
    )

    # interrupted run: checkpoint every 7 steps, stop after step 14
    ck = str(tmp_path / "b")
    partial = krylov_propagate_traces_checkpointed(
        model.hamiltonian, model.psi0, t[:15], model.dims,
        ckpt_dir=ck, ckpt_every=7, m=24,
    )
    step, _psi = latest_snapshot(ck)
    assert step == 14
    # resume against the full grid
    resumed = krylov_propagate_traces_checkpointed(
        model.hamiltonian, model.psi0, t, model.dims,
        ckpt_dir=ck, ckpt_every=7, m=24,
    )
    assert np.allclose(resumed["site_xyz"], full["site_xyz"], atol=1e-10)
    assert np.allclose(resumed["norm"], full["norm"], atol=1e-12)


def _load_extractor():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments", "extract_partial_trace.py")
    spec = importlib.util.spec_from_file_location("extract_partial_trace", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_extract_partial_trace_roundtrip(tmp_path):
    """Partial extraction returns the exact prefix rows of the checkpoint."""
    from quantumsimulations_tpu.dynamics.checkpoint import save_ext_advance

    mod = _load_extractor()
    steps, done = 50, 12
    rng = np.random.default_rng(7)
    # one flat of 8 row values per dispatched step (spd=1 layout)
    flats = [rng.normal(size=8) for _ in range(done)]
    for f in flats:
        f[6] = 1.0 + 1e-12  # norm row
    fp = {"engine": "cheb-step", "T": steps, "dim": 64, "arith": "extp",
          "dt": 30.0 / (steps - 1)}
    ckpt = save_ext_advance(
        str(tmp_path), fp, done, flats,
        np.zeros(4, np.int8), np.zeros(4, np.int8))

    trace = str(tmp_path / "partial.npz")
    rec = mod.extract_partial(ckpt, trace, n_sea=5, t_final=30.0, steps=steps)
    assert rec["status"] == "partial" and rec["steps_done"] == done
    data = np.load(trace)
    assert data["rows"].shape == (8, done)
    np.testing.assert_allclose(data["rows"].T, np.stack(flats), rtol=0, atol=0)
    np.testing.assert_allclose(
        data["t"], np.linspace(0.0, 30.0, steps)[:done], rtol=0, atol=0)

    # a checkpoint for a different workload must be refused
    import pytest

    with pytest.raises(SystemExit):
        mod.extract_partial(ckpt, trace, n_sea=5, t_final=30.0, steps=steps + 1)
    # same step count on a stretched grid (T_FINAL-customized run): the
    # declared horizon must match the checkpoint's own dt or the committed
    # NPZ would mislabel the time axis
    with pytest.raises(SystemExit):
        mod.extract_partial(ckpt, trace, n_sea=5, t_final=60.0, steps=steps)


def test_initialize_multihost_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False


def test_global_mesh_axes():
    import jax

    mesh = global_mesh(sp=2)
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.shape["sp"] == 2
    assert mesh.shape["dp"] * 2 == len(jax.devices())
