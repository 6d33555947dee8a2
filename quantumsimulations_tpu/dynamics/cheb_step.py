"""Chebyshev STEPPING propagator on the split-matmul apply — the measured
beyond-dense-reach engine (N >= 13 sea spins, Hilbert dim >= 16384).

Per output interval dt the new state is one truncated Chebyshev expansion

    psi(t + dt) = sum_{k<K} c_k(lambda dt) T_k(H / lambda) psi(t),
    c_k(x) = (2 - delta_k0) (-i)^k J_k(x)

evaluated by the three-term recurrence with the accumulator folded in, so a
full trace is T restarted sweeps of K ~ lambda*dt terms each.  Restarting
per step (vs the single global sweep in chebyshev.py) keeps the working set
at four (DL, DR) planes regardless of T — the global sweep's (T, dim)
accumulator is ~5 GB at dim 16384 / T 20000 — at a ~6% term overhead
(the Bessel tail margin per restart).

The hot op is the split-matmul apply (ops/split_apply.py): every Chebyshev
term is ~10 small dense MXU matmuls, no inner products (the TPU backend's
dependent-f64-dot latency and emulated-dot rounding never enter), no
lane/sublane shuffles (the flip apply measured 139 applies/s at dim 16384;
this form is MXU-bound).

Structured like the ext advance (expm_propagator.py): a matmul-only scan
advances ``steps_per_dispatch`` output steps per device program while
stacking each step's state planes; one batched observable program per
dispatch turns the stack into assembled rows.  Dispatches are bounded for
the session watchdog, and each dispatch boundary checkpoints the exact
(psi, rows) so multi-hour traces resume losslessly (same NPZ scheme as the
ext chain, engine-tagged).

Replaces qt.sesolve (reference: dipolar_ensemble_with_rare.py:653-666) at
bath sizes beyond QuTiP/dense reach: SURVEY.md §5 "long-context" slot.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx
from ..ops.embed import OperatorSum
from ..ops.split_apply import make_split_apply
from .chebyshev import chebyshev_coefficients
from .observables import site_xyz_expectations, state_norms


class CooperativeStop(RuntimeError):
    """Raised when a stop file asked a long trace to yield the device.

    The state/rows checkpoint for the current progress is already on disk
    when this is raised, so a rerun with the same arguments resumes
    losslessly — the mechanism exists so an independent high-priority
    process (the round-end ``bench.py``) can claim the single chip without
    pattern-killing and without corrupting a multi-hour run.
    """


def _stop_file() -> str:
    """Path of the cooperative stop flag (env QST_STOP_FILE overrides).

    Default lives at the repo root next to the package so independent
    processes (bench.py, experiments/run_n13.sh) agree on it without
    coordination."""
    env = os.environ.get("QST_STOP_FILE")
    if env:
        return env
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(pkg_root, ".qst_stop")


def _lambda_bound(H: OperatorSum, dim: int) -> float:
    """Spectral bound for the Chebyshev scaling: min(triangle bound, inflated
    host power iteration).  The triangle bound is guaranteed but loose
    (~1.3x on the dipolar model — K, and therefore the wall, scales with
    lambda); the power iteration converges from below, so it is inflated 5%
    and the propagator's norm-drift output is the runtime guard (a lambda
    below the true norm diverges visibly within one dispatch)."""
    from .krylov import spectral_norm_bound

    bound = spectral_norm_bound(H)
    if dim >= 512:
        import scipy.sparse as sparse

        from .expm_propagator import _spectral_norm_host

        r, c, v = H.to_coo()
        Hs = sparse.csr_matrix((v, (r, c)), shape=(dim, dim))
        est = _spectral_norm_host(Hs, iters=60)  # includes the 5% inflation
        return float(min(bound, est))
    return float(bound)


def _make_step_scan_ext(apply_ext, grid_ops, K: int):
    """Limb-domain variant of :func:`_make_step_scan`: the Chebyshev
    recurrence state circulates as canonical int8 limb stacks
    (ops/split_apply_ext.py), so the per-term elementwise tier is native
    int32 carries instead of emulated f64; only the accumulator (whose
    partial sums exceed the fixed grid) lives in f64, fed by one grouped
    limb evaluation per term.  Same (f64-planes in, f64-planes out)
    contract as the f64 scan — checkpoints and rows are tier-agnostic."""
    ext_split = grid_ops.split
    _carry = grid_ops.carry
    ext_val_grouped = grid_ops.val

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(p_re, p_im, c_re, c_im, n_steps: int):
        def step(carry, _):
            pr, pi = carry

            t0_re = ext_split(pr)
            t0_im = ext_split(pi)
            h_re, h_im = apply_ext(t0_re, t0_im)  # T_1, canonical limbs
            v1r = ext_val_grouped(h_re)
            v1i = ext_val_grouped(h_im)
            acc_re = c_re[0] * pr - c_im[0] * pi + c_re[1] * v1r - c_im[1] * v1i
            acc_im = c_re[0] * pi + c_im[0] * pr + c_re[1] * v1i + c_im[1] * v1r

            def term(k, st):
                tp_re, tp_im, tc_re, tc_im, a_re, a_im = st
                hh_re, hh_im = apply_ext(tc_re, tc_im)
                # T_{k+1} = 2 * hh - T_{k-1}: exact digit arithmetic, one
                # carry (|values| <= 3 stays on the fixed grid)
                n_re = _carry(
                    2 * hh_re.astype(jnp.int32) - tp_re.astype(jnp.int32))
                n_im = _carry(
                    2 * hh_im.astype(jnp.int32) - tp_im.astype(jnp.int32))
                vr = ext_val_grouped(n_re)
                vi = ext_val_grouped(n_im)
                cr = c_re[k]
                ci = c_im[k]
                a_re = a_re + cr * vr - ci * vi
                a_im = a_im + cr * vi + ci * vr
                return tc_re, tc_im, n_re, n_im, a_re, a_im

            _, _, _, _, a_re, a_im = jax.lax.fori_loop(
                2, K, term, (t0_re, t0_im, h_re, h_im, acc_re, acc_im)
            )
            return (a_re, a_im), (pr, pi)

        (p_re, p_im), (st_re, st_im) = jax.lax.scan(
            step, (p_re, p_im), None, length=n_steps
        )
        return p_re, p_im, st_re, st_im

    return run


def _make_step_scan(apply_ht, DL: int, DR: int, K: int):
    """One device program: advance n_steps output steps, stacking each
    pre-advance state.  apply_ht computes (H / lambda) @ psi (the 1/lambda
    is folded into the matrices)."""

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(p_re, p_im, c_re, c_im, n_steps: int):
        def step(carry, _):
            pr, pi = carry

            # seed: T_0 = psi, T_1 = Ht psi
            h = apply_ht(Cplx(pr, pi))
            acc_re = c_re[0] * pr - c_im[0] * pi + c_re[1] * h.re - c_im[1] * h.im
            acc_im = c_re[0] * pi + c_im[0] * pr + c_re[1] * h.im + c_im[1] * h.re

            def term(k, st):
                pp_re, pp_im, pc_re, pc_im, a_re, a_im = st
                hh = apply_ht(Cplx(pc_re, pc_im))
                n_re = 2.0 * hh.re - pp_re
                n_im = 2.0 * hh.im - pp_im
                cr = c_re[k]
                ci = c_im[k]
                a_re = a_re + cr * n_re - ci * n_im
                a_im = a_im + cr * n_im + ci * n_re
                return pc_re, pc_im, n_re, n_im, a_re, a_im

            _, _, _, _, a_re, a_im = jax.lax.fori_loop(
                2, K, term, (pr, pi, h.re, h.im, acc_re, acc_im)
            )
            return (a_re, a_im), (pr, pi)

        (p_re, p_im), (st_re, st_im) = jax.lax.scan(
            step, (p_re, p_im), None, length=n_steps
        )
        return p_re, p_im, st_re, st_im  # stacks: (n_steps, DL, DR)

    return run


@partial(jax.jit, static_argnames=("dims", "idx_rare"))
def _rows_of_stack(st_re, st_im, sea_mask, e0, dims, idx_rare: int):
    """(n_steps, DL, DR) state stacks -> flat assembled rows (n_steps*8,)
    in chronological column order (TRACE_ROWS layout per step)."""
    ns = st_re.shape[0]
    S = Cplx(
        jnp.moveaxis(st_re.reshape(ns, -1), 0, 1),
        jnp.moveaxis(st_im.reshape(ns, -1), 0, 1),
    )  # (dim, n_steps)
    xyz = site_xyz_expectations(S, dims)
    norms = state_norms(S)
    sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
    rare = xyz[idx_rare]
    rows = jnp.stack(
        [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms,
         jnp.full(norms.shape, e0)]
    )  # (8, n_steps)
    return rows.T.reshape(-1)


def _default_arith(backend: str) -> str:
    """Measured-best apply tier per backend.  Same-harness ladder through
    the public ``chebyshev_step_traces`` at shipped dispatch sizing, warm
    steps/s at dim 16384 / production dt (recorded:
    experiments/arith_ladder_n13.json, 2026-08-19, on-hardware): "extp"
    (fused Pallas limb-domain kernel) 2.242 > "ext" (limb-domain 10x6 grid)
    0.905 > "f64" (XLA-emulated dots) 0.603; all tiers agree to 7.1e-13
    over the measured window.  The round-4 driver's 0.355 steps/s for extp
    (BENCH_r04.json) was the pre-engine-cache harness paying executable
    load inside the measured window — the cache (``_engine_for``) fixed the
    measurement, and the number above is the one the default traces to.
    On CPU the limb tiers run emulated, so plain f64 dots win."""
    return "extp" if backend in ("tpu", "axon") else "f64"


_ENGINE_CACHE: dict = {}
_ENGINE_CACHE_MAX = 8


def clear_engine_cache() -> int:
    """Release every cached engine (operator device buffers, apply closures,
    jitted per-n scan executables, and the strong H references that pin
    them).  The cache is bounded (FIFO, _ENGINE_CACHE_MAX entries) but
    pinned memory otherwise lives for the process: a long-lived host that
    has finished a large-dim solve and wants the HBM back calls this.
    Returns the number of entries released."""
    n = len(_ENGINE_CACHE)
    _ENGINE_CACHE.clear()
    return n


def _engine_for(H: OperatorSum, lam: float, arith: str, split: int | None):
    """Build (or reuse) the apply + scan for one (H, lambda, tier) engine.

    Repeated ``chebyshev_step_traces`` calls on the same operator (warm-up
    then measure; multi-segment resumes; sweeps re-solving variants) would
    otherwise rebuild the host limb split, re-upload the operator planes,
    and re-trace the jitted scan — on this backend a fresh executable's
    first dispatch pays a 40-260 s load (docs/ROUND4.md), so reuse is the
    difference between steady-state stepping and paying the warm-up wall on
    every call.  Keyed by the H object's identity (entries hold a strong
    reference, so ids cannot be recycled while cached); bounded FIFO.
    """
    key = (id(H), float(lam), arith, split)
    hit = _ENGINE_CACHE.get(key)
    if hit is not None and hit["H"] is H:
        return hit
    entry: dict = {"H": H, "runs": {}}
    if arith in ("ext", "extp"):
        if arith == "extp":
            from ..ops.split_apply_ext import make_ext_apply_pallas

            apply_ext, so, grid_ops = make_ext_apply_pallas(
                H, split=split, scale=1.0 / lam)
        else:
            from ..ops.split_apply_ext import make_ext_apply

            apply_ext, so, grid_ops = make_ext_apply(
                H, split=split, scale=1.0 / lam)

        def apply_ht(p: Cplx) -> Cplx:  # f64 facade (e0 computation only)
            o_re, o_im = apply_ext(grid_ops.split(p.re), grid_ops.split(p.im))
            return Cplx(grid_ops.val(o_re), grid_ops.val(o_im))

        entry.update(apply_ht=apply_ht, apply_ext=apply_ext,
                     grid_ops=grid_ops, so=so)
    elif arith == "limb":
        from ..ops.split_apply_limb import make_split_apply_limb

        apply_ht, so = make_split_apply_limb(H, split=split, scale=1.0 / lam)
        entry.update(apply_ht=apply_ht, apply_ext=None, grid_ops=None, so=so)
    elif arith == "f64":
        apply_ht, so = make_split_apply(H, split=split, scale=1.0 / lam)
        entry.update(apply_ht=apply_ht, apply_ext=None, grid_ops=None, so=so)
    else:
        raise ValueError(
            f"unknown arithmetic {arith!r} "
            "(use 'f64', 'limb', 'ext', or 'extp')")
    while len(_ENGINE_CACHE) >= _ENGINE_CACHE_MAX:
        _ENGINE_CACHE.pop(next(iter(_ENGINE_CACHE)))
    _ENGINE_CACHE[key] = entry
    return entry


def _engine_run(entry: dict, K: int):
    """The jitted n-step scan for one engine at K terms/step (cached)."""
    run = entry["runs"].get(K)
    if run is None:
        if entry["apply_ext"] is not None:
            run = _make_step_scan_ext(entry["apply_ext"], entry["grid_ops"], K)
        else:
            so = entry["so"]
            run = _make_step_scan(entry["apply_ht"], so.DL, so.DR, K)
        entry["runs"][K] = run
    return run


def _default_steps_per_dispatch(dim: int) -> int:
    """Measured-SAFE dispatch sizing per Hilbert dim (docs/ROUND4.md fault
    record): device programs past ~60 s reproducibly crash the TPU worker on
    this backend — spd=64 crashes at dim 16384 and spd=8 crashes at dim
    32768, while 64/8/1 at dims 8192/16384/32768 are stable across multi-hour
    runs (the committed N=13/N=14 traces).  The table keeps the PUBLIC API
    (simulate_rare at auto settings) inside the proven envelope; explicit
    ``steps_per_dispatch`` or QST_CHEB_STEPS_PER_DISPATCH still override."""
    if dim <= 8192:
        return 64
    if dim <= 16384:
        return 8
    return 1


def chebyshev_step_traces(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    split: int | None = None,
    norm_bound: float | None = None,
    steps_per_dispatch: int | None = None,
    ckpt_dir: str | None = None,
    progress: bool = False,
    arithmetic: str | None = None,
) -> np.ndarray:
    """Assembled rows (8, T), TRACE_ROWS layout — same contract as
    eig_traces_assembled_batched / expm_traces_assembled_ext.

    ``steps_per_dispatch`` bounds each device program's duration (default:
    the dim-aware measured-safe table in _default_steps_per_dispatch; env
    override QST_CHEB_STEPS_PER_DISPATCH); with ``ckpt_dir`` set, the exact
    state + computed rows are snapshotted at every dispatch boundary and a
    rerun with the same arguments resumes bit-identically.

    ``arithmetic`` selects the apply's matmul tier (env override
    QST_CHEB_ARITH; default: "extp" on TPU backends, "f64" elsewhere —
    the measured winners, see _default_arith): "f64" (XLA-emulated f64
    dots), "limb"
    (exact int8 limb products, f64-split per apply —
    ops/split_apply_limb.py), "ext" (recurrence state kept in the
    fixed-grid limb domain, native-int elementwise —
    ops/split_apply_ext.py), or "extp" (the same limb domain through the
    fused Pallas kernel — ops/limb_kernels.py).  All tiers agree to f64
    roundoff.
    """
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

    lam = float(norm_bound) if norm_bound is not None else _lambda_bound(H, dim)
    # coefficient row for ONE step; K ~ lam*dt + Bessel tail margin
    C = chebyshev_coefficients(lam, np.asarray([dt]))[0] if dt > 0.0 else np.ones(1)
    K = max(2, len(C))
    c_re = np.zeros(K)
    c_im = np.zeros(K)
    c_re[: len(C)] = np.real(C)
    c_im[: len(C)] = np.imag(C)

    arith = arithmetic or os.environ.get("QST_CHEB_ARITH") or _default_arith(
        jax.default_backend()
    )
    engine = _engine_for(H, lam, arith, split)
    apply_ht = engine["apply_ht"]
    so = engine["so"]
    DL, DR = so.DL, so.DR

    spd = steps_per_dispatch or int(
        os.environ.get("QST_CHEB_STEPS_PER_DISPATCH", "0")
    ) or _default_steps_per_dispatch(dim)
    spd = max(1, min(spd, T))

    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )
    p0 = Cplx(
        jnp.asarray(np.ascontiguousarray(psi0.real).reshape(DL, DR)),
        jnp.asarray(np.ascontiguousarray(psi0.imag).reshape(DL, DR)),
    )
    h0 = apply_ht(p0)
    e0 = float(lam * np.asarray(
        jnp.sum(p0.re * h0.re + p0.im * h0.im)
    ))  # <H> at t=0, conserved under the (unitary) propagation

    run = _engine_run(engine, K)
    crd, cid = jnp.asarray(c_re), jnp.asarray(c_im)

    done = 0
    flats: list[np.ndarray] = []
    p_re, p_im = p0.re, p0.im

    ckpt_fp = None
    if ckpt_dir:
        from .checkpoint import clear_ext_advance, load_ext_advance, save_ext_advance

        ckpt_fp = {
            "engine": "cheb-step", "dim": dim, "T": T, "dt": dt,
            "K": K, "lam": lam, "spd": spd, "e0": e0,
            # arithmetic tiers agree only to f64 roundoff; resume must not
            # mix them if bit-identity is expected ("f64" omitted: round-3
            # snapshots predate the field)
            **({"arith": arith} if arith != "f64" else {}),
        }
        res = load_ext_advance(ckpt_dir, ckpt_fp)
        if res is not None:
            done, flats, s_re_h, s_im_h = res
            p_re = jnp.asarray(np.asarray(s_re_h).reshape(DL, DR))
            p_im = jnp.asarray(np.asarray(s_im_h).reshape(DL, DR))
            if progress:
                print(f"[cheb-step] resume at step {done}/{T}", flush=True)

    abort_after = int(os.environ.get("QST_CHEB_ABORT_AFTER_DISPATCHES", "0"))
    # checkpoint cadence in DISPATCHES: at spd=1 (the stable setting at
    # dim >= 32768) a per-dispatch save would fetch + write every ~1.4 s;
    # saving every Nth dispatch bounds the crash-loss window at N dispatches
    # while keeping the save cost negligible
    ckpt_every = max(
        1, int(os.environ.get("QST_CHEB_CKPT_EVERY_DISPATCHES", "1")))
    dispatches = 0
    saved_done = done

    def _save() -> None:
        nonlocal saved_done
        save_ext_advance(
            ckpt_dir, ckpt_fp, done, flats,
            np.asarray(p_re).reshape(-1), np.asarray(p_im).reshape(-1),
        )
        saved_done = done

    t_start = time.perf_counter()
    while done < T:
        n = min(spd, T - done)
        p_re, p_im, st_re, st_im = run(p_re, p_im, crd, cid, n)
        flat = _rows_of_stack(st_re, st_im, sea_mask, e0, dims, idx_rare)
        flats.append(np.asarray(flat))  # value fetch = honest sync point
        del st_re, st_im
        done += n
        dispatches += 1
        if ckpt_dir and done < T and dispatches % ckpt_every == 0:
            _save()
            if abort_after and dispatches >= abort_after:
                raise RuntimeError(
                    f"aborted after {dispatches} dispatches "
                    "(QST_CHEB_ABORT_AFTER_DISPATCHES)"
                )
        if done < T and os.path.exists(_stop_file()):
            if ckpt_dir and saved_done < done:
                _save()  # cadence may have skipped this dispatch
            # checkpoint for current progress is on disk; yield the device
            raise CooperativeStop(
                f"stop file {_stop_file()} present at step {done}/{T}"
                + ("" if ckpt_dir else " (no ckpt_dir: progress NOT saved)")
            )
        if progress:
            el = time.perf_counter() - t_start
            rate = done / el if el > 0 else 0.0
            print(
                f"[cheb-step] {done}/{T} steps ({K} terms/step), "
                f"{el:.1f}s, {rate:.2f} steps/s",
                flush=True,
            )
    if ckpt_dir:
        clear_ext_advance(ckpt_dir)
    rows = np.concatenate(flats).reshape(T, 8).T  # (8, T)
    return np.ascontiguousarray(rows)
