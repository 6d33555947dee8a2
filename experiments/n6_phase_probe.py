"""Hardware probe: where does the n6 headline's measured wall go?

bench.py's headline (39 production evolutions, dim 128, f64) measured
14.36 s (2.72 ev/s) in the round-3 driver run against an eigh cost of
~0.35 s and a device program that is a few MXU matmuls.  VERDICT r3 weak #8
asks for a fetch-synced phase profile of the other ~13 s and a >= 4 ev/s
headline.  Phases measured here (each boundary is a VALUE fetch — on this
backend block_until_ready returns at dispatch acceptance):

  eigh        host eigensolves (39x complex 128)
  phase-red   host phase reduction of w*dt
  upload      device_put of V/psi/w/r + coeffs kernel
  program     the assembled-traces device program (sync: one element)
  download    the flat (NC*B*8*Tc,) f64 trace fetch (~50 MB)

Run on the real chip between N=13 dispatch windows (or any idle slot):
  python experiments/n6_phase_probe.py [--repeat 2]
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

import jax.numpy as jnp  # noqa: E402

from quantumsimulations_tpu.dynamics.eig_propagator import (  # noqa: E402
    _batched_assembled_all_kernel,
    _batched_coeffs_kernel,
    _flatten_kernel,
    _pad_grid,
    default_time_chunk,
    eigh_host,
)
from quantumsimulations_tpu.dynamics.phase import reduce_wdt_host  # noqa: E402
from quantumsimulations_tpu.models.dipolar import build_model  # noqa: E402
from quantumsimulations_tpu.ops.cplx import Cplx  # noqa: E402


def _fetch(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    print(f"devices: {jax.devices()}", flush=True)
    f1A = 50_000.0
    detunings = np.linspace(0.0, 3.0 * f1A, 13)
    variants = [
        bench._params_production(6, d, dr, cc, 30.0, 20_000)
        for d in detunings
        for (dr, cc) in ((False, True), (True, True), (False, False))
    ]
    models = [build_model(p) for p in variants]
    dims = models[0].dims
    idx_rare = models[0].idx_rare
    t = np.linspace(0.0, 30.0, 20_000)
    B = len(models)
    psi0_all = np.stack([m.psi0 for m in models])
    nse = np.asarray([m.n_sea_effective for m in models])

    for rep in range(args.repeat):
        marks = {}
        t0 = time.perf_counter()

        def mark(name):
            nonlocal t0
            now = time.perf_counter()
            marks[name] = now - t0
            t0 = now

        ws, Vs = [], []
        for m in models:
            w, V = eigh_host(m.hamiltonian.to_dense())
            ws.append(w)
            Vs.append(V)
        w_all, V_all = np.stack(ws), np.stack(Vs)
        mark("eigh")

        dim = w_all.shape[1]
        T = len(t)
        t_chunk = default_time_chunk(dim, T, batch=B)
        dt, k_chunks, eps_chunks = _pad_grid(t, t_chunk)
        r = np.stack([reduce_wdt_host(wb, dt) for wb in w_all])
        sea_mask = (
            np.arange(len(dims))[None, :] < nse[:, None]
        ).astype(np.float64)
        mark("phase-red")

        # perturb per rep so the tunnel's dispatch memoization cannot
        # return a previous rep's result
        psic = psi0_all * (1.0 + 1e-9 * (rep + 1))
        wd = jnp.asarray(w_all)
        rd = jnp.asarray(r)
        Vc = Cplx(jnp.asarray(V_all.real), jnp.asarray(V_all.imag))
        pc = Cplx(jnp.asarray(psic.real), jnp.asarray(psic.imag))
        mask_d = jnp.asarray(sea_mask)
        kc = jnp.asarray(k_chunks)
        ec = jnp.asarray(eps_chunks)
        c = _batched_coeffs_kernel(Vc, pc)
        _fetch(c.re)
        mark("upload+coeffs")

        out = _batched_assembled_all_kernel(
            wd, rd, Vc, c, mask_d, kc, ec, dims, idx_rare
        )
        flat = _flatten_kernel(out)
        _fetch(flat)
        mark("program")

        arr = np.asarray(flat)
        n_chunks, Bk, _, Tc = out.shape
        traces = np.moveaxis(
            arr.reshape(n_chunks, Bk, 8, Tc), 0, 2
        ).reshape(B, 8, -1)[:, :, :T]
        mark("download")

        total = sum(marks.values())
        drift = float(np.abs(traces[:, 6, :] - 1.0).max())
        print(f"[rep {rep}] total {total:.2f}s -> {B / total:.2f} ev/s, "
              f"norm drift {drift:.1e}", flush=True)
        for k, v in marks.items():
            print(f"    {k:14s} {v:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
