"""Benchmark: the reference's production workloads on one chip.

Two workloads:

1. Headline (always): the reference's shipped production sweep
   (sweep_sea_detuning.py __main__, :1201-1252): n_sea=6 (Hilbert dim 128),
   13 detunings x 3 variants = 39 independent 30 s evolutions with 20,000
   output samples, float64 (QuTiP-parity grade), full observable traces.
   Metric: time-evolutions per second per chip, end to end.

2. North star (default, skipped with --quick): one n_sea=12 (dim 8192) 30 s
   evolution through the limb-matmul step-operator propagator — the N the
   reference's QuTiP engine cannot reach in practice (BASELINE.json metric:
   time-evolutions/sec/chip at N=12).

vs_baseline: measured speedup per evolution against the CPU ODE oracle that
stands in for QuTiP's sesolve (scipy DOP853 at the reference tolerances,
atol=1e-10/rtol=1e-9) on this host.  The oracle integrates a short horizon at
dim 128 and is extrapolated linearly in horizon length (ODE cost is linear in
t) and quadratically in Hilbert dimension for N=12 (dense matvec cost is
dim^2 per RHS evaluation; the adaptive step count is set by ||H||, which is
the same workload physics at both sizes).

Prints one JSON line per metric to stdout, the HEADLINE LINE LAST:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Modes:
  --quick      small version of the headline workload (no oracle, no N=12):
               the per-commit regression probe (SURVEY.md §4.6)
  --log FILE   append one JSONL row per metric (ts, git rev, metric fields)
               default: bench_history.jsonl next to this file (tracked)
  --no-log     disable the JSONL append
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=HERE,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _params_production(n_sea, delta_Hz, drive_rare, is_center_rare, t_final, steps):
    from quantumsimulations_tpu.analysis.metrics import f1R_for_resonance
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f_Az = gamma_sea * B0 / (2 * np.pi)
    f1A = 50_000.0
    f1R = f1R_for_resonance(f1A, f1A, 0.0)
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


def bench_sweep_n6(t_final: float, steps: int) -> dict:
    """The production sweep batch; returns measurement dict (no oracle)."""
    from quantumsimulations_tpu.dynamics.eig_propagator import (
        eig_traces_assembled_batched,
        eigh_host,
    )
    from quantumsimulations_tpu.models.dipolar import build_model

    f1A = 50_000.0
    detunings = np.linspace(0.0, 3.0 * f1A, 13)
    variants = [
        _params_production(6, d, dr, cc, t_final, steps)
        for d in detunings
        for (dr, cc) in ((False, True), (True, True), (False, False))
    ]
    models = [build_model(p) for p in variants]
    dims = models[0].dims
    t = np.linspace(0.0, t_final, steps)
    n_sims = len(models)
    log(f"workload: {n_sims} evolutions, dim {int(np.prod(dims))}, "
        f"T={steps}, horizon {t_final}s")

    t0 = time.perf_counter()
    ws, Vs = [], []
    for m in models:
        w, V = eigh_host(m.hamiltonian.to_dense())
        ws.append(w)
        Vs.append(V)
    t_eigh = time.perf_counter() - t0
    rows = eig_traces_assembled_batched(
        np.stack(ws), np.stack(Vs), np.stack([m.psi0 for m in models]), t, dims,
        np.asarray([m.n_sea_effective for m in models]), models[0].idx_rare,
    )
    wall = time.perf_counter() - t0
    norm_drift = float(np.abs(rows[:, 6, :] - 1.0).max())
    assert norm_drift < 1e-9, f"norm drift {norm_drift}"
    log(f"ours: {wall:.2f}s total ({t_eigh:.2f}s host eigh) "
        f"-> {n_sims / wall:.3f} evolutions/s, norm drift {norm_drift:.1e}")
    return {"wall": wall, "n_sims": n_sims, "models": models, "steps": steps,
            "t_final": t_final}


def measure_oracle_per_sim(models, t_final: float, steps: int) -> float:
    """CPU DOP853 oracle seconds/evolution at dim 128, extrapolated in t."""
    from scipy.integrate import solve_ivp

    m0 = models[1]  # center_on at delta=0 (drives active: representative)
    H = m0.hamiltonian.to_dense()
    y0 = np.concatenate([m0.psi0.real, m0.psi0.imag])
    dimc = H.shape[0]

    def rhs(_t, y):
        psi = y[:dimc] + 1j * y[dimc:]
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    horizon = 0.02
    t_eval = np.linspace(0.0, horizon, int(steps * horizon / t_final) + 2)
    t1 = time.perf_counter()
    sol = solve_ivp(rhs, (0, horizon), y0, t_eval=t_eval, method="DOP853",
                    rtol=1e-9, atol=1e-10)
    oracle_short = time.perf_counter() - t1
    assert sol.success
    scale = t_final / horizon
    log(f"oracle: {oracle_short:.2f}s for {horizon}s horizon "
        f"-> {oracle_short * scale:.1f}s/evolution extrapolated x{scale:.0f}")
    return oracle_short * scale


def bench_n12(t_final: float = 30.0, steps: int = 20_000) -> dict:
    """One n_sea=12 (dim 8192) evolution via the exact-limb (parity-grade)
    expm propagator — measured 677 s on one v5e chip (norm drift 8.7e-11,
    energy exactly conserved), the same wall-clock as the earlier 5e-6-grade
    ozaki path it replaces."""
    from quantumsimulations_tpu.dynamics.expm_propagator import (
        expm_traces_assembled_ext,
    )
    from quantumsimulations_tpu.models.dipolar import build_model

    p = _params_production(12, 1000.0, True, True, t_final, steps)
    model = build_model(p)
    t = np.linspace(0.0, t_final, steps)
    dim = int(np.prod(model.dims))
    log(f"n12 workload: 1 evolution, dim {dim}, T={steps}, horizon {t_final}s")
    t0 = time.perf_counter()
    rows = expm_traces_assembled_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare,
    )
    wall = time.perf_counter() - t0
    norm_drift = float(np.abs(rows[6] - 1.0).max())
    log(f"n12: {wall:.1f}s/evolution, norm drift {norm_drift:.1e}")
    assert norm_drift < 1e-9, f"norm drift {norm_drift}"
    return {"wall": wall, "dim": dim}


def emit(metric: dict, log_path: str | None, rev: str) -> None:
    print(json.dumps(metric), flush=True)
    if log_path:
        row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "git": rev, **metric}
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="small headline workload only; no oracle, no N=12")
    ap.add_argument("--log", default=os.path.join(HERE, "bench_history.jsonl"))
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()
    log_path = None if args.no_log else args.log
    rev = _git_rev()

    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: the big fused limb programs cost minutes
    # of (remote) XLA compile; cached executables make round-over-round bench
    # runs measure compute, not the compiler
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    if args.quick:
        meas = bench_sweep_n6(t_final=3.0, steps=2_000)
        emit({
            "metric": "quick_evolutions_per_sec_per_chip_n6sea_3s_f64",
            "value": round(meas["n_sims"] / meas["wall"], 4),
            "unit": "evolutions/s",
            "vs_baseline": None,
        }, log_path, rev)
        return

    # ---- north-star N=12 line first (headline line must be LAST) ----
    n12_err = None
    try:
        n12 = bench_n12()
    except Exception as exc:  # keep the headline metric alive regardless
        n12_err = exc
        log(f"n12 bench FAILED: {exc!r}")

    # ---- headline production sweep ----
    meas = bench_sweep_n6(t_final=30.0, steps=20_000)
    oracle_per_sim = measure_oracle_per_sim(
        meas["models"], meas["t_final"], meas["steps"]
    )
    ours_per_sim = meas["wall"] / meas["n_sims"]
    vs_baseline = oracle_per_sim / ours_per_sim
    log(f"speedup per evolution: {vs_baseline:.1f}x")

    if n12_err is None:
        # oracle at N=12 = dim-128 oracle scaled by (8192/128)^2 (dense matvec
        # cost per RHS; adaptive step count is governed by ||H||, which is the
        # same physics at both sizes) — QuTiP-CPU cannot run this workload.
        n12_oracle = oracle_per_sim * (n12["dim"] / 128) ** 2
        emit({
            "metric": "evolutions_per_sec_per_chip_n12_30s",
            "value": round(1.0 / n12["wall"], 6),
            "unit": "evolutions/s",
            "vs_baseline": round(n12_oracle / n12["wall"], 1),
        }, log_path, rev)

    emit({
        "metric": "evolutions_per_sec_per_chip_n6sea_30s_f64",
        "value": round(meas["n_sims"] / meas["wall"], 4),
        "unit": "evolutions/s",
        "vs_baseline": round(vs_baseline, 2),
    }, log_path, rev)


if __name__ == "__main__":
    main()
