"""End-to-end miniature sweep: artifact tree vs SURVEY.md §2.5 and the
reference post-processing scripts running UNCHANGED on our output."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from quantumsimulations_tpu.sweep.runner import run_sweep_sea_detuning

GAMMA_SEA, GAMMA_RARE = 8.1812e7, 6.976e7
B0 = 3.0
F_AZ = GAMMA_SEA * B0 / (2 * np.pi)
F1A = 50e3


@pytest.fixture(scope="module")
def sweep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep_out")
    base = run_sweep_sea_detuning(
        f_Az=F_AZ,
        f1A=F1A,
        target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA,
        gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[0.0, 25_000.0, 50_000.0],
        n_sea=6,
        t_final=0.02,
        steps=800,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        out_root=str(root),
        is_spin_three_half=False,
        solver_atol=1e-10,
        solver_rtol=1e-9,
        coarse_window=20,
    )
    return base


def test_artifact_tree_schema(sweep_dir):
    base = sweep_dir
    assert os.path.basename(base).startswith("sea_detuning_sweep_")
    for f in (
        "geometry_and_couplings.npz",
        "global_params.json",
        "summary.json",
        "sweep_results.csv",
        "sea_detuning_report.pdf",
        "contrast_rare_center_vs_DeltaOmega_over_geff.png",
    ):
        assert os.path.isfile(os.path.join(base, f)), f

    geo = np.load(os.path.join(base, "geometry_and_couplings.npz"))
    assert set(geo.files) == {
        "positions", "b", "sea_indices", "idx_rare", "sea_rare_vals", "sea_sea_vals",
    }
    assert geo["positions"].shape == (7, 3)
    assert geo["b"].shape == (7, 7)

    with open(os.path.join(base, "global_params.json")) as f:
        gp = json.load(f)
    for key in (
        "f_Az_Hz", "f_Rz_Hz", "f1A_Hz", "f1R_Hz", "gamma_sea", "gamma_rare",
        "B0_common_T", "B1_sea_T", "B1_rare_T", "dipolar_scale_SI", "shell_scale_m",
        "t_final_s", "steps", "n_sea", "phi_sea_rad", "phi_rare_rad",
        "sea_detunings_Hz", "sea_spin_type", "rare_spin_type", "solver_atol",
        "solver_rtol", "solver_nsteps", "solver_max_step", "target_sea_detuning",
        "coarse_window", "avg_b_AR_Hz", "rms_b_AR_Hz", "avg_b_AA_Hz", "rms_b_AA_Hz",
    ):
        assert key in gp, key
    assert gp["n_sea"] == 6
    assert np.isclose(gp["f1R_Hz"], np.hypot(F1A, F1A))

    # per-detuning dirs with the exact label convention
    for delta, label in [(0.0, "delta_p0.0Hz"), (25000.0, "delta_p25000.0Hz"),
                         (50000.0, "delta_p50000.0Hz")]:
        det_dir = os.path.join(base, label)
        assert os.path.isdir(det_dir), label
        for tag in ("center_off", "center_on", "shell_off"):
            npz = np.load(os.path.join(det_dir, f"time_and_obs_{tag}.npz"))
            assert set(npz.files) == {
                "t", "Ix_sea", "Iy_sea", "Iz_sea", "Iz_R", "Ix_R", "Iy_R", "state_norm",
            }
            assert len(npz["t"]) == 800
            assert np.abs(npz["state_norm"] - 1.0).max() < 1e-10
            with open(os.path.join(det_dir, f"params_{tag}.json")) as f:
                pj = json.load(f)
            assert pj["n_sea"] == 6
            assert "solver_method" not in pj  # reference-compatible record
            with open(os.path.join(det_dir, f"freqs_{tag}.json")) as f:
                fj = json.load(f)
            assert "delta_sea_Hz" in fj
        with open(os.path.join(det_dir, "metrics.json")) as f:
            mm = json.load(f)
        assert set(mm.keys()) == {
            "delta_Hz", "f_rf_sea_Hz",
            "I_z_slope_off_center", "R_off_center", "t_off_center",
            "I_z_slope_on_center", "R_on_center", "t_on_center",
            "contrast_rare_center",
            "I_z_slope_off_sea_center", "R_off_sea_center", "t_off_sea_center",
            "contrast_sea_center",
            "DeltaOmega_Hz", "g_eff_Hz", "DeltaOmega_over_geff",
        }
        assert mm["delta_Hz"] == delta
        for png in (
            "Iz_sea_off_on_center.png",
            "Iz_sea_detection_envelopes_center.png",
            "Iz_sea_detection_envelopes_sea_center.png",
            "state_norm_off_on_center.png",
        ):
            assert os.path.isfile(os.path.join(det_dir, png)), png

    with open(os.path.join(base, "summary.json")) as f:
        summary = json.load(f)
    assert len(summary["sweep_results"]) == 3
    assert summary["global_params"]["n_sea"] == 6


def test_detuning_physics_sanity(sweep_dir):
    """On-resonance (delta=0) Hartmann-Hahn matched: contrast should register
    the rare drive's effect; detuning metrics finite."""
    with open(os.path.join(sweep_dir, "summary.json")) as f:
        rows = json.load(f)["sweep_results"]
    by_delta = {r["delta_Hz"]: r for r in rows}
    assert np.isfinite(by_delta[0.0]["I_z_slope_on_center"])
    assert np.isfinite(by_delta[0.0]["DeltaOmega_over_geff"])
    # f1R is chosen to satisfy Hartmann-Hahn at the TARGET detuning (50 kHz),
    # so the effective-field mismatch eta vanishes there and is largest at 0
    assert np.isclose(by_delta[50000.0]["DeltaOmega_Hz"], 0.0, atol=1e-6)
    assert (
        abs(by_delta[0.0]["DeltaOmega_over_geff"])
        > abs(by_delta[50000.0]["DeltaOmega_over_geff"])
    )


def test_sweep_csv(sweep_dir):
    import csv

    with open(os.path.join(sweep_dir, "sweep_results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert float(rows[1]["delta_Hz"]) == 25000.0
    assert "contrast_rare_center" in rows[0]


REFERENCE = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_2d_report_runs_unchanged(sweep_dir, tmp_path):
    """Contract test (SURVEY.md §4.3): the reference's aggregation script is a
    pure consumer of the artifact tree and must run unchanged on our output."""
    out_pdf = tmp_path / "report2d.pdf"
    env = dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "2D_sweep_report.py"),
         os.path.dirname(sweep_dir), "-o", str(out_pdf)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out_pdf.is_file()
    graphs = os.path.join(os.path.dirname(str(out_pdf)), "graphs")
    # the script writes PNGs next to the output PDF
    assert os.path.isdir(graphs)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_stable_region_runs_unchanged(sweep_dir, tmp_path):
    out_pdf = tmp_path / "stable.pdf"
    env = dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "2D_sweep_report_stable_region.py"),
         os.path.dirname(sweep_dir), "-o", str(out_pdf),
         "--add-stability-page"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out_pdf.is_file()
    # default --stable-json location is <root>/stable_region_stats.json
    stats = os.path.join(os.path.dirname(sweep_dir), "stable_region_stats.json")
    assert os.path.isfile(stats)


def test_resume_skips_existing(sweep_dir, capsys):
    base = run_sweep_sea_detuning(
        f_Az=F_AZ,
        f1A=F1A,
        target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA,
        gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[0.0, 25_000.0, 50_000.0],
        n_sea=6,
        t_final=0.02,
        steps=800,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        out_root="unused",
        base_dir=sweep_dir,
        is_spin_three_half=False,
        coarse_window=20,
        resume=True,
        make_plots=False,
    )
    out = capsys.readouterr().out
    assert out.count("resume: skipping") == 3
    with open(os.path.join(base, "summary.json")) as f:
        assert len(json.load(f)["sweep_results"]) == 3


@pytest.fixture(scope="module")
def spin32_dir(tmp_path_factory):
    """Full sweep with is_spin_three_half=True — the mode the reference's own
    spin-3/2 path cannot run self-consistently (SURVEY.md §2.1 latent
    inconsistency note; dipolar_ensemble_with_rare.py:486-501)."""
    root = tmp_path_factory.mktemp("sweep_spin32")
    return run_sweep_sea_detuning(
        f_Az=F_AZ,
        f1A=F1A,
        target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA,
        gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[0.0, 50_000.0],
        n_sea=4,
        t_final=0.01,
        steps=300,
        out_root=str(root),
        is_spin_three_half=True,
        coarse_window=10,
        make_plots=False,
    )


def test_sweep_spin32_mixed_dims(spin32_dir):
    """Spin-3/2 rare: center variants have a dim-4 rare site while the
    sea-center control is all-qubit — the runner must batch the two Hilbert
    dims separately."""
    base = spin32_dir
    import numpy as np

    for tag, dim_expect, iz_r0 in (
        ("center_on", 2**4 * 4, 1.5),   # spin-3/2 rare: starts at +3/2
        ("shell_off", 2**5, -0.5),      # control: center is a sea spin (down)
    ):
        z = np.load(os.path.join(base, "delta_p0.0Hz", f"time_and_obs_{tag}.npz"))
        assert np.isclose(z["Iz_R"][0], iz_r0), tag
        assert np.abs(z["state_norm"] - 1).max() < 1e-10
    with open(os.path.join(base, "summary.json")) as f:
        rows = json.load(f)["sweep_results"]
    assert len(rows) == 2
    assert all(np.isfinite(r["I_z_slope_on_center"]) for r in rows)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_reprocessor_on_spin32_sweep(spin32_dir, tmp_path):
    """VERDICT r3 weak #5: the spin-3/2 mode must survive the FULL chain —
    runner -> artifact tree -> the reference's reprocess_sweep_results.py
    running UNCHANGED on the output (metric parity with our reprocessor)."""
    from test_reprocess_e2e import _QUTIP_STUB

    from quantumsimulations_tpu.sweep.reprocess import reprocess_sweep

    ours = reprocess_sweep(spin32_dir, coarse_window=15, make_plots=False)
    with open(ours) as f:
        ours_rows = json.load(f)["sweep_results"]

    stub_dir = tmp_path / "stub"
    stub_dir.mkdir()
    (stub_dir / "qutip.py").write_text(_QUTIP_STUB)
    env = dict(
        os.environ,
        MPLBACKEND="Agg",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=f"{stub_dir}{os.pathsep}{REFERENCE}",
    )
    code = (
        "import reprocess_sweep_results as r; "
        f"r.reprocess_sweep({str(spin32_dir)!r}, window=15)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(os.path.join(spin32_dir, "summary_reprocessed_win15.json")) as f:
        ref_rows = json.load(f)["sweep_results"]
    assert len(ref_rows) == len(ours_rows) == 2
    for a, b in zip(ours_rows, ref_rows):
        for k in ("I_z_slope_on_center", "I_z_slope_off_center",
                  "contrast_rare_center", "delta_Hz"):
            assert np.isclose(a[k], b[k], rtol=1e-12, atol=1e-15), (k, a[k], b[k])


@pytest.mark.parametrize("method", ["krylov", "dopri", "expm"])
def test_sweep_honors_stepping_solvers(tmp_path, method):
    """--solver krylov/dopri/expm must actually use those backends (they were
    silently ignored before); results must match the eig sweep."""
    kwargs = dict(
        f_Az=F_AZ, f1A=F1A, target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA, gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[0.0], n_sea=3, t_final=2e-4, steps=21,
        out_root=str(tmp_path / method), coarse_window=5, make_plots=False,
    )
    base_eig = run_sweep_sea_detuning(solver_method="eig", **kwargs)
    base_m = run_sweep_sea_detuning(solver_method=method, **kwargs)
    z1 = np.load(os.path.join(base_eig, "delta_p0.0Hz", "time_and_obs_center_on.npz"))
    z2 = np.load(os.path.join(base_m, "delta_p0.0Hz", "time_and_obs_center_on.npz"))
    tol = 1e-7 if method == "dopri" else 1e-9
    assert np.allclose(z1["Iz_sea"], z2["Iz_sea"], atol=tol)
    assert np.allclose(z2["state_norm"], 1.0, atol=1e-8)


def test_negative_detunings_label_and_artifacts(tmp_path):
    """Negative detunings exercise the 'delta_mXXX' label path end to end."""
    base = run_sweep_sea_detuning(
        f_Az=F_AZ, f1A=F1A, target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA, gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[-25_000.0, 25_000.0],
        n_sea=6, t_final=0.01, steps=300,
        out_root=str(tmp_path), coarse_window=10, make_plots=False,
    )
    assert os.path.isdir(os.path.join(base, "delta_m25000.0Hz"))
    assert os.path.isdir(os.path.join(base, "delta_p25000.0Hz"))
    from quantumsimulations_tpu.sweep.reprocess import reprocess_sweep

    out = reprocess_sweep(base, coarse_window=15)
    with open(out) as f:
        rows = json.load(f)["sweep_results"]
    assert [r["delta_Hz"] for r in rows] == [-25000.0, 25000.0]
