"""Anchor the CPU ODE oracle with MEASUREMENT, not scaling assumptions.

The bench's `vs_baseline` compares our per-evolution wall against the CPU
adaptive-RK oracle that stands in for QuTiP's `qt.sesolve`
(reference: dipolar_ensemble_with_rare.py:653-666 at the tolerances from
sweep_sea_detuning.py:1247-1250).  Round 3 derived the N=12 ratio from a
dim-128 oracle measurement scaled *by assumption* (linear in horizon,
quadratic in Hilbert dim).  This experiment replaces both assumptions with
measurements (VERDICT r3 missing #4):

  1. dim 128 at three horizons -> validates (or refutes) linear-in-t;
  2. dim 8192 (the N=12 workload itself) at a short horizon -> a measured
     per-second-of-physics cost, extrapolated linearly (validated in 1)
     to the 30 s production horizon.

Writes experiments/oracle_anchor.json; bench.py prefers this measured anchor
over the quadratic-scaling fallback.

CPU-only by construction: sets JAX_PLATFORMS=cpu before any jax import so a
concurrently running TPU workload is never disturbed.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from scipy.integrate import solve_ivp  # noqa: E402

from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def _params(n_sea: int, delta_Hz: float):
    from quantumsimulations_tpu.analysis.metrics import f1R_for_resonance
    from quantumsimulations_tpu.models.params import DipolarRareParams

    gamma_sea, gamma_rare = 8.1812e7, 6.976e7
    B0 = 3.0
    f_Az = gamma_sea * B0 / (2 * np.pi)
    f1A = 50_000.0
    f1R = f1R_for_resonance(f1A, f1A, 0.0)
    return DipolarRareParams(
        n_sea=n_sea, gamma_sea=gamma_sea, gamma_rare=gamma_rare,
        B0_sea=B0, B0_rare=B0,
        B1_sea=2 * np.pi * f1A / gamma_sea,
        B1_rare=2 * np.pi * f1R / gamma_rare,
        omega_rf_sea=2 * np.pi * (f_Az - delta_Hz),
        omega_rf_rare=gamma_rare * B0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=30.0, steps=20_000,
        drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )


def _integrate(H: np.ndarray, psi0: np.ndarray, horizon: float) -> dict:
    """One DOP853 run at the reference tolerances; returns wall + nfev."""
    dimc = H.shape[0]
    y0 = np.concatenate([psi0.real, psi0.imag])

    def rhs(_t, y):
        psi = y[:dimc] + 1j * y[dimc:]
        d = -1j * (H @ psi)
        return np.concatenate([d.real, d.imag])

    t0 = time.perf_counter()
    sol = solve_ivp(rhs, (0.0, horizon), y0, method="DOP853",
                    rtol=1e-9, atol=1e-10)
    wall = time.perf_counter() - t0
    if not sol.success:
        raise RuntimeError(f"oracle failed at horizon {horizon}: {sol.message}")
    return {"horizon_s": horizon, "wall_s": round(wall, 3),
            "nfev": int(sol.nfev),
            "nfev_per_physics_s": round(sol.nfev / horizon, 1),
            "wall_per_physics_s": round(wall / horizon, 2)}


def main() -> None:
    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "method": "DOP853", "rtol": 1e-9, "atol": 1e-10}

    # --- 1. dim 128 at three horizons: validate linear-in-t -----------------
    m = build_model(_params(6, 0.0))
    H = m.hamiltonian.to_dense()
    runs = [_integrate(H, m.psi0, h) for h in (0.005, 0.01, 0.02)]
    out["dim128"] = {"dim": H.shape[0], "runs": runs}
    rates = [r["wall_per_physics_s"] for r in runs]
    out["dim128"]["wall_per_physics_s_spread"] = round(
        (max(rates) - min(rates)) / max(rates), 3
    )
    out["dim128"]["linear_in_t"] = bool(out["dim128"]["wall_per_physics_s_spread"] < 0.2)
    out["dim128"]["oracle_30s_s"] = round(30.0 * float(np.median(rates)), 1)
    print(f"[dim128] {runs}", flush=True)
    print(f"[dim128] linear-in-t spread "
          f"{out['dim128']['wall_per_physics_s_spread']:.1%}; "
          f"30 s extrapolation {out['dim128']['oracle_30s_s']} s", flush=True)

    # --- 2. dim 8192 (the N=12 bench workload, bench.py:_params_production) --
    m12 = build_model(_params(12, 1000.0))
    H12 = m12.hamiltonian.to_dense()
    dim = H12.shape[0]
    # time one RHS-equivalent matvec to size the probe horizon
    psi = m12.psi0.astype(np.complex128)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = H12 @ psi
    t_mv = (time.perf_counter() - t0) / 3
    nfev_rate = np.median([r["nfev_per_physics_s"] for r in runs])
    budget_s = float(os.environ.get("ORACLE_N12_BUDGET_S", "420"))
    h8 = max(1e-4, min(2e-3, budget_s / (nfev_rate * t_mv)))
    print(f"[dim8192] matvec {t_mv * 1e3:.1f} ms; expected nfev rate "
          f"{nfev_rate:.0f}/s -> probe horizon {h8:.2e} s", flush=True)
    r8 = _integrate(H12, m12.psi0, h8)
    out["dim8192"] = {"dim": dim, "runs": [r8],
                      "matvec_s": round(t_mv, 4)}
    out["dim8192"]["oracle_30s_s"] = round(30.0 * r8["wall_per_physics_s"], 1)
    # the quadratic-in-dim assumption the measurement replaces, for the record
    out["dim8192"]["quadratic_scaling_prediction_30s_s"] = round(
        out["dim128"]["oracle_30s_s"] * (dim / 128) ** 2, 1
    )
    print(f"[dim8192] {r8}", flush=True)
    print(f"[dim8192] measured 30 s extrapolation: "
          f"{out['dim8192']['oracle_30s_s']} s "
          f"(quadratic-scaling assumption said "
          f"{out['dim8192']['quadratic_scaling_prediction_30s_s']} s)",
          flush=True)

    path = os.path.join(HERE, "oracle_anchor.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
