"""Reprocess layer e2e: run a mini sweep, then exercise the framework's
reprocess / exponential / report2d CLIs against the artifact tree."""

import json
import os

import numpy as np
import pytest

from quantumsimulations_tpu.sweep.runner import run_sweep_sea_detuning
from quantumsimulations_tpu.sweep.reprocess import find_sweep_dirs, reprocess_sweep
from quantumsimulations_tpu.sweep.reprocess_exponential import reprocess_exponential

GAMMA_SEA, GAMMA_RARE = 8.1812e7, 6.976e7
B0 = 3.0
F_AZ = GAMMA_SEA * B0 / (2 * np.pi)
F1A = 50e3


@pytest.fixture(scope="module")
def sweep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("reproc")
    return run_sweep_sea_detuning(
        f_Az=F_AZ,
        f1A=F1A,
        target_sea_detuning=F1A,
        gamma_sea=GAMMA_SEA,
        gamma_rare=GAMMA_RARE,
        sea_detunings_Hz=[0.0, 50_000.0],
        n_sea=6,
        t_final=0.02,
        steps=600,
        phi_sea=np.pi / 2,
        phi_rare=np.pi / 2,
        out_root=str(root),
        is_spin_three_half=False,
        coarse_window=20,
        make_plots=False,
    )


def test_reprocess_new_window(sweep_dir):
    out_path = reprocess_sweep(sweep_dir, coarse_window=30)
    assert out_path.endswith("summary_reprocessed_win30.json")
    with open(out_path) as f:
        rp = json.load(f)
    assert rp["global_params"]["coarse_window_reprocessed"] == 30
    rows = rp["sweep_results"]
    assert len(rows) == 2
    for row in rows:
        assert "delta_I_z_slope_center" in row
        assert "abs_delta_I_z_slope_center" in row
        assert row["abs_delta_I_z_slope_center"] >= 0 or np.isnan(
            row["abs_delta_I_z_slope_center"]
        )


def test_reprocess_same_window_matches_original(sweep_dir):
    """Reprocessing with the original window must reproduce the sweep's own
    metrics exactly (same code path, same traces)."""
    out_path = reprocess_sweep(sweep_dir, coarse_window=0)  # keep original (20)
    with open(out_path) as f:
        rp = json.load(f)
    with open(os.path.join(sweep_dir, "summary.json")) as f:
        orig = json.load(f)
    for new_row, old_row in zip(rp["sweep_results"], orig["sweep_results"]):
        for key in (
            "I_z_slope_off_center", "I_z_slope_on_center", "t_on_center",
            "contrast_rare_center", "DeltaOmega_over_geff",
        ):
            a, b = new_row[key], old_row[key]
            assert (np.isnan(a) and np.isnan(b)) or np.isclose(a, b, rtol=1e-12), key


def test_find_sweep_dirs(sweep_dir):
    found = find_sweep_dirs(os.path.dirname(sweep_dir))
    assert sweep_dir in found


def test_reprocess_exponential(sweep_dir):
    out_path = reprocess_exponential(sweep_dir, coarse_window=20, make_plots=True)
    assert out_path.endswith("summary_exponential_metrics.json")
    with open(out_path) as f:
        data = json.load(f)
    rows = data["rows"]
    assert len(rows) == 2
    for row in rows:
        assert "status_off" in row and "status_on" in row
        assert row["status_off"] in ("OK", "FLAT", "CENSORED", "BAD_FIT", "TOO_FEW", "MISSING")
    assert os.path.isfile(os.path.join(sweep_dir, "exponential_metrics_report.pdf"))
    assert os.path.isdir(os.path.join(sweep_dir, "graphs_exponential"))


def test_report2d_cli(sweep_dir, tmp_path, capsys):
    from quantumsimulations_tpu.cli.report2d import main

    out_pdf = str(tmp_path / "agg.pdf")
    main([os.path.dirname(sweep_dir), "-o", out_pdf, "--stable",
          "--c-min", "0.1", "--p-min", "0.5", "--bin-decimals", "2"])
    out = capsys.readouterr().out
    assert "Aggregated" in out
    assert os.path.isfile(out_pdf)
    assert os.path.isfile(os.path.join(tmp_path, "graphs", "01_contrast_vs_eta.png"))
    assert os.path.isfile(
        os.path.join(os.path.dirname(sweep_dir), "stable_region_stats.json")
    )


def test_reprocess_cli(sweep_dir, capsys):
    from quantumsimulations_tpu.cli.reprocess import main

    main([os.path.dirname(sweep_dir), "--window", "40"])
    out = capsys.readouterr().out
    assert "[ok]" in out
    assert os.path.isfile(os.path.join(sweep_dir, "summary_reprocessed_win40.json"))


def test_reprocess_full_pdf_regeneration(sweep_dir):
    out_path = reprocess_sweep(sweep_dir, coarse_window=25, make_plots=True)
    assert out_path.endswith("summary_reprocessed_win25.json")
    pdf = os.path.join(sweep_dir, "reprocessed_win25_report.pdf")
    assert os.path.isfile(pdf)
    # 2 points x 4 plot pages + summary table + contrast-vs-eta: a real PDF
    assert os.path.getsize(pdf) > 20_000
