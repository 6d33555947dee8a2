"""Top-level evolution API: reference-compatible `simulate_rare`.

Returns ``(t, traces)`` with the exact key set the reference's solver wrapper
produces (dipolar_ensemble_with_rare.py:611-680): Ix/Iy/Iz_sea, Iz/Ix/Iy_R
(real expectation traces) and state_norm.

Solver dispatch (params.solver_method):
  * "eig"    — dense eigendecomposition propagator (exact; default for
               Hilbert dims where a host eigensolve is cheap).
  * "expm"   — on-device scaling-and-squaring step operator + blocked matmul
               propagation (exact to ~1e-13; large dense dims).
  * "ext"    — exact-limb (75-bit) step-operator chain: parity-grade (~1e-9)
               at large dense dims where the f64 squaring chain floors out.
  * "krylov" — matrix-free Lanczos expm-multiply (sharded-state dims).
  * "chebyshev" — matrix-free Chebyshev basis sweep (single-chip huge dims:
               no inner products, so it dodges the TPU backend's ~20 ms
               dependent-f64-dot latency and emulated-dot rounding).
  * "cheb_step" — Chebyshev stepping on the split-matmul apply (MXU-shaped
               matmuls only; the beyond-dense default: bounded working set
               for arbitrarily long traces, checkpointable).
  * "dopri"  — adaptive Dormand–Prince (time-dependent Hamiltonians).
  * "auto"   — pick by Hilbert dimension.

The reference's solver tolerances (solver_atol/rtol/nsteps/max_step) are
accepted for config compatibility; the exact propagators do not need them and
they are recorded as provenance only.  The "dopri" path honors atol/rtol.
"""

from __future__ import annotations

import numpy as np

from ..models.dipolar import build_model
from ..models.params import DipolarRareParams
from .eig_propagator import eigh_host
from .observables import assemble_traces

_EIG_MAX_DIM = 2048  # host eigh is cheap up to here (seconds on one core)
_EXT_MAX_DIM = 8192  # dense ext limb chain fits HBM up to here


def _auto_method(dim: int) -> str:
    # eig: host eigendecomposition is exact and amortizes over the whole
    #   trace; cheap on the host up to ~dim 2048 (zheevd is O(dim^3): ~1 min
    #   at 2048 on one core, ~48 min at 8192).
    # ext: the parity-grade exact-limb step-operator chain — the MEASURED
    #   winner at dim 8192 (N=12): 437-530 s fresh-process end to end vs
    #   ~3,900 s for eig (host-eigensolve-bound; BASELINE.md rounds 1-3).
    #   Routing auto here makes the public `simulate_rare` at N=12 run the
    #   same path bench.py measures.
    # chebyshev: matrix-free beyond dense reach on one chip (krylov remains
    #   the sharded-state engine: its psum inner products shard; Chebyshev's
    #   apply shards too but the single-chip default favors no-dot stepping).
    # expm: opt-in only — square f64 matmuls exceed 16 GB HBM at dim 8192
    #   under the TPU x64 rewriter's limb expansion.
    # cheb_step: the split-matmul Chebyshev stepper (dynamics/cheb_step.py)
    #   — MXU-shaped matmuls only, restarted per output interval, bounded
    #   working set; subsumes both "chebyshev" (global sweep: (T, dim)
    #   accumulator OOMs long traces) and "krylov" (dependent-dot latency)
    #   as the beyond-dense single-chip default.
    if dim <= _EIG_MAX_DIM:
        return "eig"
    if dim <= _EXT_MAX_DIM:
        return "ext"
    return "cheb_step"


def simulate_rare(params: DipolarRareParams) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Run one time evolution; reference-compatible signature and outputs."""
    if params.steps < 2 or params.t_final <= 0.0:
        raise ValueError("Bad time grid: steps >= 2 and t_final > 0.")

    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    dims = model.dims
    dim = int(np.prod(dims))

    method = params.solver_method
    if method == "auto":
        method = _auto_method(dim)

    if method in ("eig", "eig32"):
        from .eig_propagator import (
            dense_matrix_host,
            eig_traces_assembled_batched,
            eig_traces_assembled_batched32,
            traces_dict,
        )

        H = dense_matrix_host(model.hamiltonian)
        w, V = eigh_host(H)
        fn = eig_traces_assembled_batched32 if method == "eig32" else eig_traces_assembled_batched
        rows = fn(
            w[None], V[None], model.psi0[None], t, dims,
            np.asarray([model.n_sea_effective]), model.idx_rare,
        )
        named = traces_dict(rows[0])
        named.pop("energy", None)
        return t, named
    elif method == "ext":
        # parity-grade dense step operator: exact-limb (75-bit) Taylor +
        # squaring chain — no rounding amplification across the squarings
        # (ops/extprec.py "ext" tier); the large-dense-dim 1e-8 path.
        from .eig_propagator import traces_dict
        from .expm_propagator import expm_traces_assembled_ext

        rows = expm_traces_assembled_ext(
            model.hamiltonian, model.psi0, t, dims,
            model.n_sea_effective, model.idx_rare,
        )
        named = traces_dict(rows)
        named.pop("energy", None)
        return t, named
    elif method == "expm":
        import jax

        if dim >= 2048 and jax.default_backend() != "cpu":
            # square f64 matmuls through the XLA x64 rewriter OOM at these
            # sizes; the limb-decomposed step operator is the viable path
            from .eig_propagator import traces_dict
            from .expm_propagator import expm_traces_assembled_ozaki

            rows = expm_traces_assembled_ozaki(
                model.hamiltonian, model.psi0, t, dims,
                model.n_sea_effective, model.idx_rare,
            )
            named = traces_dict(rows)
            named.pop("energy", None)
            return t, named
        from .expm_propagator import expm_propagate_traces

        out = expm_propagate_traces(model.hamiltonian, model.psi0, t, dims)
    elif method == "krylov":
        from .eig_propagator import traces_dict
        from .krylov import krylov_traces_assembled

        rows = krylov_traces_assembled(
            model.hamiltonian, model.psi0, t, dims,
            model.n_sea_effective, model.idx_rare,
        )
        named = traces_dict(rows)
        named.pop("energy", None)
        return t, named
    elif method == "chebyshev":
        from .chebyshev import chebyshev_traces_assembled
        from .eig_propagator import traces_dict

        rows = chebyshev_traces_assembled(
            model.hamiltonian, model.psi0, t, dims,
            model.n_sea_effective, model.idx_rare,
        )
        named = traces_dict(rows)
        named.pop("energy", None)
        return t, named
    elif method == "cheb_step":
        from .cheb_step import chebyshev_step_traces
        from .eig_propagator import traces_dict

        rows = chebyshev_step_traces(
            model.hamiltonian, model.psi0, t, dims,
            model.n_sea_effective, model.idx_rare,
        )
        named = traces_dict(rows)
        named.pop("energy", None)
        return t, named
    elif method == "dopri":
        from .dopri import dopri_propagate_traces

        out = dopri_propagate_traces(
            model.hamiltonian,
            model.psi0,
            t,
            dims,
            atol=params.solver_atol or 1e-10,
            rtol=params.solver_rtol or 1e-9,
        )
    else:
        raise ValueError(f"unknown solver_method: {params.solver_method!r}")

    traces = assemble_traces(
        out["site_xyz"], out["norm"], model.n_sea_effective, model.idx_rare
    )
    return t, traces
