"""2D (f1A x detuning) grid sweep: multi-row artifact tree + aggregation."""

import os

import numpy as np

from quantumsimulations_tpu.analysis.aggregate import aggregate_points
from quantumsimulations_tpu.sweep.grid2d import run_grid2d

GAMMA_SEA, GAMMA_RARE = 8.1812e7, 6.976e7
F_AZ = GAMMA_SEA * 3.0 / (2 * np.pi)


def test_grid2d_rows_and_aggregation(tmp_path):
    dirs = run_grid2d(
        f_Az=F_AZ,
        f1A_values_Hz=[30e3, 50e3],
        gamma_sea=GAMMA_SEA,
        gamma_rare=GAMMA_RARE,
        n_detunings=2,
        n_sea=6,
        t_final=0.01,
        steps=300,
        out_root=str(tmp_path),
        coarse_window=10,
        make_plots=False,
    )
    assert len(dirs) == 2
    for d in dirs:
        assert os.path.isfile(os.path.join(d, "summary.json"))
        assert os.path.isfile(os.path.join(d, "sweep_results.csv"))
    pts = aggregate_points(str(tmp_path))
    assert len(pts["eta"]) == 4  # 2 rows x 2 detunings
    assert set(np.unique(pts["f1A_Hz"])) == {30e3, 50e3}
    # detuning rows scale with their own f1A target
    assert pts["delta_Hz"].max() == 3.0 * 50e3
