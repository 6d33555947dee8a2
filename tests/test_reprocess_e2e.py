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


def _pdf_page_count(path: str) -> int:
    import re

    with open(path, "rb") as f:
        data = f.read()
    return len(re.findall(rb"/Type\s*/Page[^s]", data))


def test_reprocess_full_pdf_regeneration(sweep_dir):
    out_path = reprocess_sweep(sweep_dir, coarse_window=25, make_plots=True)
    assert out_path.endswith("summary_reprocessed_win25.json")
    pdf = os.path.join(sweep_dir, "reprocessed_win25_report.pdf")
    assert os.path.isfile(pdf)
    # params page + 2 points x 4 plot pages + 2 table pages + 2 scatter pages
    # (reference reprocess_sweep_results.py:436-786)
    assert _pdf_page_count(pdf) == 1 + 2 * 4 + 2 + 2


# Minimal qutip shim: just enough for the reference modules to import
# (module-level operator constants); the reprocessor itself never solves.
_QUTIP_STUB = """
import numpy as np

def sigmax(): return np.array([[0, 1], [1, 0]], dtype=complex)
def sigmay(): return np.array([[0, -1j], [1j, 0]], dtype=complex)
def sigmaz(): return np.array([[1, 0], [0, -1]], dtype=complex)
def qeye(n): return np.eye(n, dtype=complex)

def jmat(j, which):
    d = int(round(2 * j + 1))
    m = j - np.arange(d)
    jp = np.zeros((d, d), dtype=complex)
    for k in range(d - 1):
        jp[k, k + 1] = np.sqrt(j * (j + 1) - m[k + 1] * (m[k + 1] + 1))
    jm = jp.conj().T
    if which == "x":
        return (jp + jm) / 2
    if which == "y":
        return (jp - jm) / 2j
    if which == "z":
        return np.diag(m).astype(complex)
    raise ValueError(which)
"""

REFERENCE = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_reprocessor_page_and_metric_parity(sweep_dir, tmp_path):
    """Run the reference's reprocess_sweep UNCHANGED on our sweep dir and
    demand (a) identical PDF page count and (b) identical recomputed metrics
    (the reprocess pipeline is the behavioral contract, SURVEY.md §2.4)."""
    import subprocess
    import sys

    ours = reprocess_sweep(sweep_dir, coarse_window=35, make_plots=True)
    with open(ours) as f:
        ours_rows = json.load(f)["sweep_results"]
    ours_pdf = os.path.join(sweep_dir, "reprocessed_win35_report.pdf")
    n_ours = _pdf_page_count(ours_pdf)

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
        f"r.reprocess_sweep({str(sweep_dir)!r}, window=35)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    ref_pdf = os.path.join(sweep_dir, "sea_detuning_report_reprocessed_win35.pdf")
    assert os.path.isfile(ref_pdf)
    assert _pdf_page_count(ref_pdf) == n_ours

    # the reference overwrote summary_reprocessed_win35.json with its rows
    with open(os.path.join(sweep_dir, "summary_reprocessed_win35.json")) as f:
        ref_rows = json.load(f)["sweep_results"]
    assert len(ref_rows) == len(ours_rows)
    for mine, ref in zip(ours_rows, ref_rows):
        for key, val in ref.items():
            if key not in mine:
                continue
            a, b = float(mine[key]), float(val)
            assert (np.isnan(a) and np.isnan(b)) or np.isclose(a, b, rtol=1e-10), (
                key, a, b,
            )
        # the delta-slope fields must be present and match
        for key in ("delta_I_z_slope_center", "abs_delta_I_z_slope_center"):
            a, b = float(mine[key]), float(ref[key])
            assert (np.isnan(a) and np.isnan(b)) or np.isclose(a, b, rtol=1e-10)


def test_scatter_gray_missing_color():
    """Points with non-finite f1A color are drawn gray with a legend entry
    (2D_sweep_report.py:180-189)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from quantumsimulations_tpu.cli.report2d import _scatter_points

    fig, ax = plt.subplots()
    n_gray = _scatter_points(
        ax,
        np.array([0.0, 1.0, 2.0]),
        np.array([1.0, 2.0, 3.0]),
        np.array([10.0, np.nan, 20.0]),
    )
    assert n_gray == 1
    legend = ax.get_legend()
    assert legend is not None
    assert any(t.get_text() == "color missing" for t in legend.get_texts())
    plt.close(fig)


def test_report2d_skips_slope_pages_on_legacy_summaries(tmp_path):
    """Legacy summaries without slope fields: pages 3-4 are skipped entirely,
    matching the reference (2D_sweep_report.py:405-411)."""
    from quantumsimulations_tpu.cli.report2d import main

    sweep = tmp_path / "sea_detuning_sweep_legacy"
    sweep.mkdir()
    rows = [
        {"delta_Hz": d, "contrast_rare_center": 0.1 * i,
         "DeltaOmega_over_geff": 0.5 * i}
        for i, d in enumerate([0.0, 1000.0, 2000.0])
    ]
    with open(sweep / "summary.json", "w") as f:
        json.dump({"global_params": {"f1A_Hz": 50e3}, "sweep_results": rows}, f)

    out_pdf = str(tmp_path / "legacy.pdf")
    main([str(tmp_path), "-o", out_pdf])
    assert _pdf_page_count(out_pdf) == 2  # pages 1-2 only
    assert not os.path.isfile(
        os.path.join(tmp_path, "graphs", "03_abs_slope_diff_vs_eta_zoom.png")
    )
