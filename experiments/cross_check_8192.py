"""Hardware cross-check: cheb-step vs the exact-limb (ext) engine at dim 8192.

Two INDEPENDENT propagators — the restarted-Chebyshev stepper on the fused
split-matmul apply (`dynamics/cheb_step.py`, the measured N=13 engine) and
the parity-grade exact-int8-limb expm chain (`dynamics/expm_propagator.py`,
the measured N=12 engine) — run the same N=12 production physics
(reference config: sweep_sea_detuning.py:1201-1252 at n_sea=12) over a short
horizon at the production output spacing, and their assembled observable
rows are compared elementwise.

Purpose: a production-scale agreement datum for the Chebyshev engine class
that produced the N=13 trace (at dim 16384 no second engine exists to
cross-check against — this is the largest dim where one does).  Over a short
horizon the f64 phase-resolution floor (~5e-6 at 30 s) does not bite, so
the two engines must agree near roundoff; norm drift is reported for both.

Writes experiments/cross_check_8192.json.

Usage: python experiments/cross_check_8192.py [--steps 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from quantumsimulations_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(os.path.join(os.path.dirname(HERE), ".jax_cache"))

from experiments.large_bath import production_params  # noqa: E402
from quantumsimulations_tpu.dynamics.cheb_step import (  # noqa: E402
    _lambda_bound,
    chebyshev_step_traces,
)
from quantumsimulations_tpu.dynamics.expm_propagator import (  # noqa: E402
    expm_traces_assembled_ext,
)
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sea", type=int, default=12)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(HERE, "cross_check_8192.json"))
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    p = production_params(args.n_sea, 30.0, 20_000)
    m = build_model(p)
    dim = int(np.prod(m.dims))
    # the production output grid, truncated: same dt the 30 s run uses
    times = np.linspace(0.0, 30.0, 20_000)[: args.steps]
    print(f"n_sea={args.n_sea} dim={dim} steps={args.steps} "
          f"dt={times[1] - times[0]:.6g}s", flush=True)

    t0 = time.perf_counter()
    rows_ext = expm_traces_assembled_ext(
        m.hamiltonian, m.psi0, times, m.dims, m.n_sea_effective, m.idx_rare,
    )
    wall_ext = time.perf_counter() - t0
    print(f"[ext]  {wall_ext:.1f}s, norm drift "
          f"{np.abs(rows_ext[6] - 1.0).max():.2e}", flush=True)

    lam = _lambda_bound(m.hamiltonian, dim)
    t0 = time.perf_counter()
    rows_cheb = chebyshev_step_traces(
        m.hamiltonian, m.psi0, times, m.dims, m.n_sea_effective, m.idx_rare,
        norm_bound=lam, progress=True,
    )
    wall_cheb = time.perf_counter() - t0
    print(f"[cheb] {wall_cheb:.1f}s, norm drift "
          f"{np.abs(rows_cheb[6] - 1.0).max():.2e}", flush=True)

    # rows: Ix/Iy/Iz_sea, Iz/Ix/Iy_R, norm, energy(t=0 const)
    diff_obs = float(np.abs(rows_ext[:6] - rows_cheb[:6]).max())
    out = {
        "n_sea": args.n_sea, "dim": dim, "steps": args.steps,
        "dt_s": float(times[1] - times[0]),
        "max_abs_observable_diff": diff_obs,
        "norm_drift_ext": float(np.abs(rows_ext[6] - 1.0).max()),
        "norm_drift_cheb": float(np.abs(rows_cheb[6] - 1.0).max()),
        "energy_row_diff": float(np.abs(rows_ext[7] - rows_cheb[7]).max()),
        "wall_ext_s": round(wall_ext, 1), "wall_cheb_s": round(wall_cheb, 1),
        "lambda": lam,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
