"""Same-harness arithmetic-tier ladder at a production-dt workload.

Measures WARM steps/s for each apply tier of the Chebyshev stepping engine
(dynamics/cheb_step.py) through the PUBLIC ``chebyshev_step_traces`` at the
shipped steps_per_dispatch for the dim — the measurement that decides
``_default_arith`` (VERDICT r4 item 1: the round-4 snapshot shipped an
unmeasured "extp" default that the driver then measured 4.3x slower than
the documented "ext" tier; every default must trace to a recorded number
from THIS harness).

Per tier: one warm-up call with a perturbed initial state (compile +
executable load + host prep; the engine cache makes the measured call reuse
the loaded executables, exactly as a real multi-evolution sweep would),
then a measured call of ``--steps`` production-dt steps, fetch-synced by
the assembled-row download.

Because every tier's measured call evolves the SAME initial state over the
SAME production-dt grid, the pairwise row diffs double as the dim-16384
cross-engine agreement check (VERDICT r4 missing #2: the committed N=13
trace was verified only by norm drift; here two independent arithmetic
implementations — XLA-emulated f64 dots vs exact int8-limb integer
recurrence — must agree near roundoff over the measured window).  With
--cross-check-out the f64-vs-ext comparison is also written in the
cross_check_8192.py record format.

Usage: python experiments/arith_ladder.py [--n-sea 13] [--steps 24]
                                          [--tiers ext,extp,f64]
Writes experiments/arith_ladder_n{n_sea}.json.
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
    _default_steps_per_dispatch,
    _lambda_bound,
    chebyshev_step_traces,
)
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sea", type=int, default=13)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--warmup-steps", type=int, default=8)
    ap.add_argument("--tiers", default="ext,extp,f64")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cross-check-out", default=None,
                    help="also write the f64-vs-ext row comparison here")
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        HERE, f"arith_ladder_n{args.n_sea}.json")

    print(f"devices: {jax.devices()}", flush=True)
    p = production_params(args.n_sea, 30.0, 20_000)
    m = build_model(p)
    dim = int(np.prod(m.dims))
    dt = 30.0 / 19_999  # the production output spacing
    t0 = time.perf_counter()
    lam = _lambda_bound(m.hamiltonian, dim)
    lam_wall = time.perf_counter() - t0
    print(f"n_sea={args.n_sea} dim={dim} lambda={lam:.4g} "
          f"({lam_wall:.1f}s host)", flush=True)

    # Align both windows to whole dispatches: the n-step scan is jitted per
    # n, so a remainder dispatch (steps % spd != 0) or a warm-up shorter
    # than one dispatch runs a DISTINCT executable whose first-dispatch
    # load (40-260 s, docs/ROUND4.md) would land inside the measured wall —
    # the exact pre-engine-cache measurement bug this harness exists to
    # avoid.
    spd = int(os.environ.get("QST_CHEB_STEPS_PER_DISPATCH", "0")
              ) or _default_steps_per_dispatch(dim)
    warmup_steps = max(spd, ((args.warmup_steps + spd - 1) // spd) * spd)
    measured_steps = max(spd, ((args.steps + spd - 1) // spd) * spd)
    if (warmup_steps, measured_steps) != (args.warmup_steps, args.steps):
        print(f"aligned to spd={spd} dispatches: warmup "
              f"{args.warmup_steps}->{warmup_steps}, measured "
              f"{args.steps}->{measured_steps}", flush=True)

    warm_psi = m.psi0 * complex(1.0, 1e-9)
    warm_psi /= np.linalg.norm(warm_psi)

    def run(tier: str, n_steps: int, psi0: np.ndarray) -> np.ndarray:
        times = dt * np.arange(n_steps)
        return chebyshev_step_traces(
            m.hamiltonian, psi0, times, m.dims, m.n_sea_effective,
            m.idx_rare, norm_bound=lam, arithmetic=tier,
        )

    results: dict = {
        "n_sea": args.n_sea, "dim": dim, "dt_s": dt, "lambda": lam,
        "lambda_wall_s": round(lam_wall, 1),
        "measured_steps": measured_steps,
        "steps_per_dispatch": spd,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
        "tiers": {},
    }
    tier_rows: dict[str, np.ndarray] = {}
    tier_walls: dict[str, float] = {}
    for tier in args.tiers.split(","):
        tier = tier.strip()
        print(f"[{tier}] warm-up ({warmup_steps} steps)...", flush=True)
        t0 = time.perf_counter()
        try:
            run(tier, warmup_steps, warm_psi)
            warmup_wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = run(tier, measured_steps, m.psi0)
            wall = time.perf_counter() - t0
            tier_rows[tier] = rows
            tier_walls[tier] = wall
            entry = {
                "status": "ok",
                "warmup_wall_s": round(warmup_wall, 1),
                "wall_s": round(wall, 2),
                "steps_per_s": round(measured_steps / wall, 3),
                "norm_drift": float(np.abs(rows[6] - 1.0).max()),
            }
        except Exception as exc:
            entry = {"status": "failed", "error": repr(exc)[:500]}
        print(f"[{tier}] {entry}", flush=True)
        results["tiers"][tier] = entry
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=1)

    # pairwise agreement over the measured window: same psi0, same grid —
    # independent arithmetic implementations must match near roundoff
    names = list(tier_rows)
    diffs = {}
    for i, a in enumerate(names):
        for b_name in names[i + 1:]:
            d = float(np.abs(tier_rows[a][:6] - tier_rows[b_name][:6]).max())
            diffs[f"{a}_vs_{b_name}"] = d
            print(f"max |obs diff| {a} vs {b_name}: {d:.3e}", flush=True)
    results["max_abs_observable_diffs"] = diffs
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)

    if args.cross_check_out and "f64" in tier_rows and "ext" in tier_rows:
        cc = {
            "n_sea": args.n_sea, "dim": dim, "steps": measured_steps,
            "dt_s": dt,
            "engines": "cheb_step/f64 (XLA-emulated f64 dots) vs "
                       "cheb_step/ext (exact int8-limb integer recurrence)",
            "max_abs_observable_diff": diffs.get("ext_vs_f64",
                                                 diffs.get("f64_vs_ext")),
            "norm_drift_f64": float(np.abs(tier_rows["f64"][6] - 1.0).max()),
            "norm_drift_ext": float(np.abs(tier_rows["ext"][6] - 1.0).max()),
            "energy_row_diff": float(
                np.abs(tier_rows["f64"][7] - tier_rows["ext"][7]).max()),
            "wall_f64_s": round(tier_walls["f64"], 1),
            "wall_ext_s": round(tier_walls["ext"], 1),
            "lambda": lam,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(args.cross_check_out, "w", encoding="utf-8") as f:
            json.dump(cc, f, indent=1)
        print(f"wrote {args.cross_check_out}", flush=True)


if __name__ == "__main__":
    main()
