"""Multi-chip beyond-dense Chebyshev stepping: DR-sharded limb-domain apply.

Config-5 form of the fastest measured beyond-dense engine
(`dynamics/cheb_step.py` with ``arithmetic="ext"``, docs/ROUND4.md ladder):
the statevector plane (DL, DR) is column-sharded over a mesh axis, every
device advances its DR/P slice through the recurrence, and the two buckets
that contract over the global DR axis exchange ONE exact integer ``psum``
of canonical limb stacks per apply (ops/split_apply_ext.py::
make_ext_apply_sharded) — value-identical to the single-chip engine
(integer digit sums regroup exactly; no f64 rounding rides the wire).

Communication per apply is O(DL * DR) digit words vs O(DL * DR * K_terms)
compute, so the ratio improves with bath size — the engine for N >= 15
(dim 65536+: one chip's HBM still fits the state, but not the wall-clock).

Replaces qt.sesolve (reference: dipolar_ensemble_with_rare.py:653-666) at
bath sizes beyond any single chip's patience: SURVEY.md §5 long-context
slot, alongside the row-sharded exact-limb expm chain
(`parallel/expm_sharded.py`, the dense-tier scaling engine).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..dynamics.cheb_step import _lambda_bound, _rows_of_stack
from ..dynamics.chebyshev import chebyshev_coefficients
from ..ops.embed import OperatorSum
from ..ops.split_apply_ext import make_ext_apply_sharded


def chebyshev_step_traces_sharded(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    mesh,
    axis: str = "sp",
    split: int | None = None,
    norm_bound: float | None = None,
    steps_per_dispatch: int | None = None,
) -> np.ndarray:
    """Assembled rows (8, T), TRACE_ROWS layout — same contract and (to f64
    roundoff) same values as the single-chip
    ``chebyshev_step_traces(..., arithmetic="ext")``."""
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("chebyshev stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0
    dim = int(np.prod(dims))
    n_shards = mesh.shape[axis]

    lam = float(norm_bound) if norm_bound is not None else _lambda_bound(H, dim)
    C = chebyshev_coefficients(lam, np.asarray([dt]))[0] if dt > 0.0 else np.ones(1)
    K = max(2, len(C))
    c_re = np.zeros(K)
    c_im = np.zeros(K)
    c_re[: len(C)] = np.real(C)
    c_im[: len(C)] = np.imag(C)

    apply_local, so, ops = make_ext_apply_sharded(
        H, axis, n_shards, split=split, scale=1.0 / lam
    )
    DL, DR = so.DL, so.DR

    def step_scan_local(p_re, p_im, crd, cid, n_steps: int):
        """Per-device recurrence over the local (DL, DR/P) column slice —
        the limb-domain scan of dynamics/cheb_step.py with the sharded
        apply (splits/evaluations are elementwise, hence local)."""

        def step(carry, _):
            pr, pi = carry
            t0_re = ops.split(pr)
            t0_im = ops.split(pi)
            h_re, h_im = apply_local(t0_re, t0_im)
            v1r = ops.val(h_re)
            v1i = ops.val(h_im)
            acc_re = crd[0] * pr - cid[0] * pi + crd[1] * v1r - cid[1] * v1i
            acc_im = crd[0] * pi + cid[0] * pr + crd[1] * v1i + cid[1] * v1r

            def term(k, st):
                tp_re, tp_im, tc_re, tc_im, a_re, a_im = st
                hh_re, hh_im = apply_local(tc_re, tc_im)
                n_re = ops.carry(
                    2 * hh_re.astype(jnp.int32) - tp_re.astype(jnp.int32))
                n_im = ops.carry(
                    2 * hh_im.astype(jnp.int32) - tp_im.astype(jnp.int32))
                vr = ops.val(n_re)
                vi = ops.val(n_im)
                cr = crd[k]
                ci = cid[k]
                return (tc_re, tc_im, n_re, n_im,
                        a_re + cr * vr - ci * vi, a_im + cr * vi + ci * vr)

            _, _, _, _, a_re, a_im = jax.lax.fori_loop(
                2, K, term, (t0_re, t0_im, h_re, h_im, acc_re, acc_im)
            )
            return (a_re, a_im), (pr, pi)

        (p_re, p_im), (st_re, st_im) = jax.lax.scan(
            step, (p_re, p_im), None, length=n_steps
        )
        return p_re, p_im, st_re, st_im

    _runs: dict[int, object] = {}

    def run(p_re, p_im, crd, cid, n_steps: int):
        # n_steps is a Python static: close over it per dispatch size
        # (shard_map specs cover only array arguments)
        if n_steps not in _runs:
            _runs[n_steps] = jax.jit(jax.shard_map(
                lambda pr, pi, cr, ci: step_scan_local(pr, pi, cr, ci, n_steps),
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(), P()),
                out_specs=(P(None, axis), P(None, axis),
                           P(None, None, axis), P(None, None, axis)),
            ))
        return _runs[n_steps](p_re, p_im, crd, cid)

    sharding = jax.sharding.NamedSharding(mesh, P(None, axis))
    p_re = jax.device_put(
        jnp.asarray(np.ascontiguousarray(psi0.real).reshape(DL, DR)), sharding)
    p_im = jax.device_put(
        jnp.asarray(np.ascontiguousarray(psi0.imag).reshape(DL, DR)), sharding)
    crd, cid = jnp.asarray(c_re), jnp.asarray(c_im)

    # conserved <H> at t=0 for the energy row, from one sharded apply
    h_re, h_im = jax.jit(jax.shard_map(
        lambda r, i: apply_local(ops.split(r), ops.split(i)),
        mesh=mesh, in_specs=(P(None, axis), P(None, axis)),
        out_specs=(P(None, None, axis), P(None, None, axis)),
    ))(p_re, p_im)
    vr = np.asarray(jax.jit(ops.val)(h_re))
    vi = np.asarray(jax.jit(ops.val)(h_im))
    e0 = float(lam * (np.sum(np.asarray(p_re) * vr) + np.sum(np.asarray(p_im) * vi)))

    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64))

    spd = steps_per_dispatch or int(
        os.environ.get("QST_CHEB_STEPS_PER_DISPATCH", "64"))
    spd = max(1, min(spd, T))

    done = 0
    flats: list[np.ndarray] = []
    while done < T:
        n = min(spd, T - done)
        p_re, p_im, st_re, st_im = run(p_re, p_im, crd, cid, n)
        flat = _rows_of_stack(st_re, st_im, sea_mask, e0, dims, idx_rare)
        flats.append(np.asarray(flat))
        done += n
    rows = np.concatenate(flats).reshape(T, 8).T
    return np.ascontiguousarray(rows)
