"""Benchmark: the reference's shipped production sweep workload on one chip.

Workload (matches sweep_sea_detuning.py __main__, :1201-1252): n_sea=6
(Hilbert dim 128), 13 detunings x 3 variants = 39 independent time evolutions
to t_final=30 s with 20,000 output samples, float64 (QuTiP-parity grade),
full observable traces (6 expectations + state norm).

Metric: time-evolutions per second per chip over the whole batch
(includes host eigendecompositions, device transfer, trace computation and
readback — everything but artifact/plot IO).

vs_baseline: measured speedup per evolution against the CPU ODE oracle that
stands in for QuTiP's sesolve (scipy DOP853 at the reference tolerances,
atol=1e-10/rtol=1e-9) on this host.  The oracle integrates a short horizon
and is extrapolated linearly in t (ODE cost is linear in horizon length);
the extrapolation factor is printed to stderr.

Prints exactly one JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)

    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
        eigh_host,
    )
    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams
    from quantumsimulations_tpu.analysis.metrics import f1R_for_resonance

    log(f"devices: {jax.devices()}")

    # ---- reference production configuration ----
    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f_Az = gamma_sea * B0 / (2 * np.pi)
    f1A = 50_000.0
    f1R = f1R_for_resonance(f1A, f1A, 0.0)
    n_sea = 6
    t_final, steps = 30.0, 20_000
    detunings = np.linspace(0.0, 3.0 * f1A, 13)

    def params_for(delta_Hz, drive_rare, is_center_rare):
        return DipolarRareParams(
            n_sea=n_sea,
            gamma_sea=gamma_sea,
            gamma_rare=gamma_rare,
            B0_sea=B0,
            B0_rare=B0,
            B1_sea=2 * np.pi * f1A / gamma_sea,
            B1_rare=2 * np.pi * f1R / gamma_rare,
            omega_rf_sea=2 * np.pi * (f_Az - delta_Hz),
            omega_rf_rare=gamma_rare * B0,
            phi_sea=np.pi / 2,
            phi_rare=np.pi / 2,
            dipolar_scale=1e-7 * 1.054571817e-34,
            shell_scale=0.282393e-9,
            t_final=t_final,
            steps=steps,
            drive_sea=True,
            drive_rare=drive_rare,
            is_spin_three_half=False,
            is_center_rare=is_center_rare,
        )

    variants = [
        params_for(d, dr, cc)
        for d in detunings
        for (dr, cc) in ((False, True), (True, True), (False, False))
    ]
    models = [build_model(p) for p in variants]
    dims = models[0].dims
    t = np.linspace(0.0, t_final, steps)
    n_sims = len(models)
    log(f"workload: {n_sims} evolutions, dim {int(np.prod(dims))}, T={steps}, horizon {t_final}s")

    # ---- our pipeline (timed end to end, incl. host eigh) ----
    t0 = time.perf_counter()
    ws, Vs = [], []
    for m in models:
        w, V = eigh_host(m.hamiltonian.to_dense())
        ws.append(w)
        Vs.append(V)
    t_eigh = time.perf_counter() - t0
    psi0 = np.stack([m.psi0 for m in models])
    rows = eig_traces_assembled_batched(
        np.stack(ws), np.stack(Vs), psi0, t, dims,
        np.asarray([m.n_sea_effective for m in models]), models[0].idx_rare,
    )
    wall = time.perf_counter() - t0
    # sanity: exact propagation must conserve the norm (row 6)
    norm_drift = float(np.abs(rows[:, 6, :] - 1.0).max())
    assert norm_drift < 1e-9, f"norm drift {norm_drift}"
    evo_per_sec = n_sims / wall
    log(f"ours: {wall:.2f}s total ({t_eigh:.2f}s host eigh) "
        f"-> {evo_per_sec:.3f} evolutions/s, norm drift {norm_drift:.1e}")

    # ---- CPU ODE oracle (sesolve stand-in), short horizon extrapolated ----
    from scipy.integrate import solve_ivp

    m0 = models[1]  # center_on at delta=0 (drives active: representative cost)
    H = m0.hamiltonian.to_dense()
    y0 = np.concatenate([m0.psi0.real, m0.psi0.imag])
    dimc = H.shape[0]

    def rhs(_t, y):
        psi = y[:dimc] + 1j * y[dimc:]
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    horizon = 0.02  # s; cost is linear in horizon
    t_eval = np.linspace(0.0, horizon, int(steps * horizon / t_final) + 2)
    t1 = time.perf_counter()
    sol = solve_ivp(rhs, (0, horizon), y0, t_eval=t_eval, method="DOP853",
                    rtol=1e-9, atol=1e-10)
    oracle_short = time.perf_counter() - t1
    assert sol.success
    scale = t_final / horizon
    oracle_per_sim = oracle_short * scale
    log(f"oracle: {oracle_short:.2f}s for {horizon}s horizon "
        f"-> {oracle_per_sim:.1f}s/evolution extrapolated x{scale:.0f}")

    ours_per_sim = wall / n_sims
    vs_baseline = oracle_per_sim / ours_per_sim
    log(f"speedup per evolution: {vs_baseline:.1f}x")

    print(json.dumps({
        "metric": "evolutions_per_sec_per_chip_n6sea_30s_f64",
        "value": round(evo_per_sec, 4),
        "unit": "evolutions/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
