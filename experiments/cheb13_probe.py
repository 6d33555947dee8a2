"""Hardware probe: split-matmul Chebyshev stepping rate at n_sea=13 (dim 16384).

Measures steps/s of dynamics/cheb_step.py on the production N=13 workload
(reference physics: sweep_sea_detuning.py:1201-1252 at a larger bath) for a
handful of output steps, to decide whether the full 30 s / 20,000-step trace
fits in single-digit hours on one chip, and which apply arithmetic to use.

Usage: python experiments/cheb13_probe.py [--steps 4] [--spd 2] [--n-sea 13]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from quantumsimulations_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)

from experiments.large_bath import production_params  # noqa: E402
from quantumsimulations_tpu.dynamics.cheb_step import (  # noqa: E402
    _lambda_bound,
    chebyshev_step_traces,
)
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sea", type=int, default=13)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--spd", type=int, default=2)
    ap.add_argument("--arith", default="f64",
                    choices=["f64", "limb", "ext", "extp"])
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    p = production_params(args.n_sea, 30.0, 20_000)
    m = build_model(p)
    dim = int(np.prod(m.dims))
    t_full = np.linspace(0.0, 30.0, 20_000)
    times = t_full[: args.steps]
    lam = _lambda_bound(m.hamiltonian, dim)
    dt = t_full[1] - t_full[0]
    print(f"n_sea={args.n_sea} dim={dim} lam={lam:.4g} dt={dt:.6g}", flush=True)

    t0 = time.perf_counter()
    rows = chebyshev_step_traces(
        m.hamiltonian, m.psi0, times, m.dims, m.n_sea_effective, m.idx_rare,
        norm_bound=lam, steps_per_dispatch=args.spd, progress=True,
        arithmetic=args.arith,
    )
    wall = time.perf_counter() - t0
    drift = float(np.abs(rows[6] - 1.0).max())
    rate = args.steps / wall
    print(
        f"PROBE: {args.steps} steps in {wall:.1f}s -> {rate:.4f} steps/s "
        f"(incl. compile), norm drift {drift:.2e}", flush=True,
    )
    print(f"projected 20000-step wall at this rate: {20000 / rate / 3600:.2f} h",
          flush=True)


if __name__ == "__main__":
    main()
