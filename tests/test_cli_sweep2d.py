"""CLI surface test for the 2D grid sweep entry point.

Drives ``quantumsimulations_tpu.cli.sweep2d.main`` end to end at a tiny
workload — the command-line analogue of editing the reference's __main__
constants (/root/reference/sweep_sea_detuning.py:1201-1252) — and checks
the multi-row artifact tree plus the aggregation/stable-region report it
chains into.

n_sea=5 exercises the Fibonacci-shell fallback; n_sea=4 (tetrahedron)
would put every sea-rare pair at the dipolar magic angle (1-3cos^2 = 0),
making g_eff = 0 and eta NaN, so the aggregator would drop every point
(/root/reference/2D_sweep_report.py:255-273 drops non-finite rows too).
"""

import json
import os

from quantumsimulations_tpu.cli.sweep2d import main


def test_sweep2d_cli_end_to_end(tmp_path, capsys):
    root = str(tmp_path / "grid")
    main([
        "--f1a-khz", "30", "50",
        "--n-detunings", "2",
        "--n-sea", "5",
        "--t-final", "0.01",
        "--steps", "200",
        "--coarse-window", "10",
        "--no-plots",
        "--platform", "cpu",
        "--out-root", root,
    ])
    out = capsys.readouterr().out
    assert "grid2d complete: 2 sweep rows" in out

    # Two sweep rows, each a full §2.5 artifact tree root.
    rows = sorted(
        os.path.join(r, d)
        for r, dirs, _ in os.walk(root)
        for d in dirs
        if d.startswith("sea_detuning_sweep_")
    )
    assert len(rows) == 2
    for d in rows:
        assert os.path.isfile(os.path.join(d, "summary.json"))
        assert os.path.isfile(os.path.join(d, "sweep_results.csv"))

    # The chained report2d --stable run wrote the aggregation artifacts.
    assert os.path.isfile(os.path.join(root, "contrast_vs_coupling_summary.pdf"))
    stats_path = os.path.join(root, "stable_region_stats.json")
    assert os.path.isfile(stats_path)
    with open(stats_path, encoding="utf-8") as f:
        stats = json.load(f)
    assert "criteria" in stats and "per_bin" in stats


def test_sweep2d_cli_skip_report(tmp_path):
    root = str(tmp_path / "grid")
    main([
        "--f1a-khz", "40",
        "--n-detunings", "2",
        "--n-sea", "5",
        "--t-final", "0.01",
        "--steps", "200",
        "--coarse-window", "10",
        "--no-plots",
        "--skip-report",
        "--platform", "cpu",
        "--out-root", root,
    ])
    assert not os.path.isfile(
        os.path.join(root, "contrast_vs_coupling_summary.pdf"))
