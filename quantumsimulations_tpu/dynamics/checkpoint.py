"""Statevector checkpointing for long stepping runs (SURVEY.md §5).

The reference's checkpoint system is its artifact tree (raw NPZ traces +
reprocess layer); solver-level state is never persisted because QuTiP solves
are opaque.  The framework's stepping propagators (krylov / expm / dopri)
expose their state, so long runs can snapshot psi(t) periodically and resume
mid-trace after preemption — relevant for 14-16-spin baths where a single
trace is hours of stepping.

Format: one NPZ per snapshot directory, holding the flat statevector planes,
the output-grid cursor, and enough metadata to validate a resume against the
originating configuration.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import numpy as np

from ..models.params import DipolarRareParams


def snapshot_path(ckpt_dir: str, step_index: int) -> str:
    return os.path.join(ckpt_dir, f"state_{step_index:08d}.npz")


def save_snapshot(
    ckpt_dir: str,
    step_index: int,
    psi: np.ndarray,
    params: DipolarRareParams | None = None,
    keep_last: int = 2,
) -> str:
    """Persist psi at output-step ``step_index``; prunes older snapshots."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = snapshot_path(ckpt_dir, step_index)
    tmp = path + ".tmp.npz"
    np.savez(tmp, re=np.real(psi), im=np.imag(psi), step_index=step_index)
    os.replace(tmp, path)
    if params is not None:
        meta = asdict(params)
        with open(os.path.join(ckpt_dir, "params.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=2, default=float)
    # prune
    snaps = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("state_") and f.endswith(".npz")
    )
    for old in snaps[:-keep_last]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def latest_snapshot(ckpt_dir: str) -> tuple[int, np.ndarray] | None:
    """(step_index, psi) of the newest snapshot, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    snaps = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("state_") and f.endswith(".npz")
    )
    if not snaps:
        return None
    data = np.load(os.path.join(ckpt_dir, snaps[-1]))
    return int(data["step_index"]), data["re"] + 1j * data["im"]


def krylov_propagate_traces_checkpointed(
    H,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    ckpt_dir: str,
    ckpt_every: int = 500,
    params: DipolarRareParams | None = None,
    m: int | None = None,
    theta: float | None = None,
) -> dict[str, np.ndarray]:
    """Krylov trace propagation with periodic snapshots and resume.

    On restart with the same ckpt_dir, stepping resumes from the newest
    snapshot; already-computed trace segments are re-evaluated only from the
    resume point forward (earlier rows come from the checkpoint's trace
    stash).
    """
    import jax

    from ..ops.cplx import Cplx
    from .krylov import KRYLOV_M, KRYLOV_THETA, make_krylov_step
    from .observables import site_xyz_expectations, state_norms

    if m is None:
        m = KRYLOV_M
    if theta is None:
        theta = KRYLOV_THETA

    times = np.asarray(times)
    T = len(times)
    dt = float(times[1] - times[0]) if T > 1 else 0.0
    step, _ = make_krylov_step(H, dt, m=m, theta=theta)
    step = jax.jit(step)

    n_sites = len(dims)
    xyz = np.zeros((n_sites, 3, T))
    norms = np.zeros(T)

    os.makedirs(ckpt_dir, exist_ok=True)
    start = 0
    psi = psi0.astype(np.complex128)
    resume = latest_snapshot(ckpt_dir)
    trace_stash = os.path.join(ckpt_dir, "traces_partial.npz")
    if resume is not None and os.path.isfile(trace_stash):
        try:
            stash = np.load(trace_stash)
            start, psi = resume
            upto = min(start, T)
            xyz[..., :upto] = stash["xyz"][..., :upto]
            norms[:upto] = stash["norm"][:upto]
        except Exception:
            # corrupt stash (e.g. preemption mid-write before the atomic
            # scheme was in place): restart from scratch rather than resume
            # with a silently zeroed window
            start, psi = 0, psi0.astype(np.complex128)

    cur = Cplx.from_numpy(psi)
    obs_fn = jax.jit(
        lambda p: (
            site_xyz_expectations(p.reshape(p.shape + (1,)), dims),
            state_norms(p.reshape(p.shape + (1,))),
        ),
        static_argnames=(),
    )
    for k in range(start, T):
        s_xyz, s_norm = obs_fn(cur)
        xyz[..., k] = np.asarray(s_xyz)[..., 0]
        norms[k] = float(np.asarray(s_norm)[0])
        if k + 1 < T:
            cur = step(cur)
        if ckpt_every and (k + 1) % ckpt_every == 0:
            # stash FIRST (atomically): the resume invariant is
            # "stash covers at least up to the newest snapshot's step"
            tmp = trace_stash + ".tmp.npz"
            np.savez(tmp, xyz=xyz, norm=norms)
            os.replace(tmp, trace_stash)
            save_snapshot(ckpt_dir, k + 1, cur.to_numpy(), params=params)
    return {"site_xyz": xyz, "norm": norms}


# ---------------------------------------------------------------------------
# Ext-chain advance checkpointing (the N=12+ limb propagator).
#
# The step-operator build is deterministic (same inputs -> bit-identical limb
# stacks), so snapshots persist only the ADVANCE state: the int8 limb state
# stacks, the block cursor, and the observable rows computed so far.  On
# resume the operator is rebuilt and stepping continues bit-identically
# (int8 limbs round-trip losslessly; rows are exact f64 in the NPZ).
# Reference analogue: the save-as-you-go invariant of
# sweep_sea_detuning.py:677-691, extended INSIDE a single solve.
# ---------------------------------------------------------------------------


def _ext_advance_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "ext_advance.npz")


def save_ext_advance(
    ckpt_dir: str,
    fingerprint: dict,
    done_blocks: int,
    rows_flats: list[np.ndarray],
    s_re_flat: np.ndarray,
    s_im_flat: np.ndarray,
) -> str:
    """Atomically persist the ext advance state after ``done_blocks``.

    The tmp name is unique per save (pid + block cursor): saves may run on
    background threads, and a shared tmp path would let two overlapping
    saves interleave writes — worse, after one renames tmp->path the other's
    still-open fd would keep writing into the *installed* snapshot (same
    inode), corrupting it.  Callers additionally serialize saves
    (latest-wins), but the unique name makes the write safe regardless.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _ext_advance_path(ckpt_dir)
    tmp = path + f".tmp.{os.getpid()}.{done_blocks}.npz"
    np.savez(
        tmp,
        fingerprint=json.dumps(fingerprint, sort_keys=True),
        done_blocks=done_blocks,
        rows_flat=np.concatenate(rows_flats) if rows_flats else np.empty(0),
        n_flats=len(rows_flats),
        s_re=s_re_flat,
        s_im=s_im_flat,
    )
    os.replace(tmp, path)
    return path


def load_ext_advance(ckpt_dir: str, fingerprint: dict):
    """(done_blocks, rows_flats, s_re_flat, s_im_flat) or None.

    A snapshot with a mismatched fingerprint (different workload) is ignored
    — LOUDLY, printing the differing keys: a silent None here would restart
    a multi-hour trace from step 0 (e.g. after an arithmetic-tier default
    change altered the fingerprint of an in-flight run).  A corrupt file
    restarts from scratch rather than resuming wrong.
    """
    path = _ext_advance_path(ckpt_dir)
    if not os.path.isfile(path):
        return None
    try:
        data = np.load(path)
        saved = json.loads(str(data["fingerprint"]))
        want = json.loads(json.dumps(fingerprint, sort_keys=True))
        if saved != want:
            diff = {
                k: (saved.get(k), want.get(k))
                for k in sorted(set(saved) | set(want))
                if saved.get(k) != want.get(k)
            }
            print(
                f"[checkpoint] WARNING: snapshot at {path} does not match "
                f"this run (saved vs requested: {diff}); restarting from "
                "step 0 — pass matching arguments (e.g. the original "
                "arithmetic tier) to resume it",
                flush=True,
            )
            return None
        done = int(data["done_blocks"])
        n_flats = int(data["n_flats"])
        rows_flat = data["rows_flat"]
        if n_flats:
            flats = [np.asarray(a) for a in np.split(rows_flat, n_flats)]
        else:
            flats = []
        return done, flats, data["s_re"], data["s_im"]
    except Exception:
        return None


def clear_ext_advance(ckpt_dir: str) -> None:
    base = os.path.basename(_ext_advance_path(ckpt_dir))
    try:
        names = os.listdir(ckpt_dir)
    except OSError:
        return
    # also sweep any orphaned per-save tmp files from killed runs
    for name in names:
        if name == base or name.startswith(base + ".tmp."):
            try:
                os.remove(os.path.join(ckpt_dir, name))
            except OSError:
                pass
