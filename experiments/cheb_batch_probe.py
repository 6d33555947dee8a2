"""Hardware probe: BATCHED Chebyshev stepping throughput at dim 16384.

A single N=13 cheb-step trace is latency-bound: each Chebyshev term is ~10
small (~128^3) matmuls inside a sequential recurrence, measured ~3% of the
f64-emulation roofline.  A production sweep runs 39 INDEPENDENT evolutions
(13 detunings x 3 variants, reference sweep_sea_detuning.py:611), so the
deployment-relevant number is per-evolution throughput when B states share
each dispatch: psi becomes (B, DL, DR) via jax.vmap of the identical apply,
multiplying the arithmetic intensity of every matmul by B while the
recurrence depth stays unchanged.

This probe measures steps/s at B in {1, 2, 4, 8} (same H — the kernel-shape
question; a real sweep also vmaps the small per-variant matrices, which
changes memory not utilization) and reports the per-evolution speedup vs
B=1.  Writes experiments/cheb_batch_probe.json.

Usage: python experiments/cheb_batch_probe.py [--n-sea 13] [--steps 2]
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
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)

from quantumsimulations_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(os.path.join(os.path.dirname(HERE), ".jax_cache"))

from experiments.large_bath import production_params  # noqa: E402
from quantumsimulations_tpu.dynamics.cheb_step import (  # noqa: E402
    _lambda_bound,
    _make_step_scan,
)
from quantumsimulations_tpu.dynamics.chebyshev import chebyshev_coefficients  # noqa: E402
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402
from quantumsimulations_tpu.ops.split_apply import make_split_apply  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sea", type=int, default=13)
    ap.add_argument("--steps", type=int, default=2, help="output steps per timing")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--out", default=os.path.join(HERE, "cheb_batch_probe.json"))
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    p = production_params(args.n_sea, 30.0, 20_000)
    m = build_model(p)
    dim = int(np.prod(m.dims))
    dt = 30.0 / 19_999  # production output spacing
    lam = _lambda_bound(m.hamiltonian, dim)
    C = chebyshev_coefficients(lam, np.asarray([dt]))[0]
    K = max(2, len(C))
    c_re = np.zeros(K)
    c_im = np.zeros(K)
    c_re[: len(C)] = np.real(C)
    c_im[: len(C)] = np.imag(C)
    crd, cid = jnp.asarray(c_re), jnp.asarray(c_im)

    apply_ht, so = make_split_apply(m.hamiltonian, scale=1.0 / lam)
    DL, DR = so.DL, so.DR
    print(f"n_sea={args.n_sea} dim={dim} K={K} DLxDR={DL}x{DR}", flush=True)

    # batched apply: vmap over the leading state axis; the matrices broadcast
    apply_b = jax.vmap(apply_ht)
    run_b = _make_step_scan(apply_b, DL, DR, K)

    rng = np.random.default_rng(0)
    results = []
    for B in args.batches:
        # B normalized random states (a sweep's psi0 set differs per variant;
        # identical shapes/work)
        psis = rng.standard_normal((B, dim)) + 1j * rng.standard_normal((B, dim))
        psis /= np.linalg.norm(psis, axis=1, keepdims=True)
        p_re = jnp.asarray(np.ascontiguousarray(psis.real).reshape(B, DL, DR))
        p_im = jnp.asarray(np.ascontiguousarray(psis.imag).reshape(B, DL, DR))
        # warm-up dispatch (compile + executable load), then measure
        o_re, o_im, s_re, s_im = run_b(p_re, p_im, crd, cid, args.steps)
        _ = np.asarray(o_re)[..., 0, 0]  # value fetch = honest sync
        t0 = time.perf_counter()
        o_re, o_im, s_re, s_im = run_b(o_re, o_im, crd, cid, args.steps)
        nrm = np.asarray(
            jnp.sum(o_re * o_re + o_im * o_im, axis=(1, 2))
        )  # fetch-synced
        wall = time.perf_counter() - t0
        sps = args.steps / wall
        row = {
            "B": B, "wall_s": round(wall, 3),
            "steps_per_s": round(sps, 4),
            "evolution_steps_per_s": round(sps * B, 4),
            "norm_drift": float(np.abs(np.sqrt(nrm) - 1.0).max()),
        }
        results.append(row)
        print(f"[B={B}] {wall:.2f}s for {args.steps} steps -> "
              f"{row['evolution_steps_per_s']} evolution-steps/s "
              f"(norm drift {row['norm_drift']:.1e})", flush=True)

    base = results[0]["evolution_steps_per_s"]
    out = {
        "n_sea": args.n_sea, "dim": dim, "K": K, "lambda": lam,
        "steps_per_timing": args.steps,
        "results": results,
        "speedup_vs_B1": [round(r["evolution_steps_per_s"] / base, 2)
                          for r in results],
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
