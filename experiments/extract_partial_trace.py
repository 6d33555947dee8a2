"""Extract a committable partial trace from a cheb-step checkpoint.

A production-horizon run (experiments/run_trace.sh) checkpoints the exact
(state, rows) at every dispatch boundary (dynamics/checkpoint.py
``save_ext_advance``).  When a run has to stop before the full horizon —
e.g. a session/wall-clock boundary — this script turns the checkpoint into
an honest, committable artifact: the first ``done`` trace columns exactly
as the finished run would have produced them (rows are exact f64 in the
NPZ; resuming later appends, it does not recompute).

Writes experiments/cheb_step_n{N}_partial.npz {t, rows, Iz_sea, Iz_R,
state_norm, steps_total} and records a status="partial" row in
large_bath_results.json under cheb_step_n{N}_partial.

Reference analogue: the save-as-you-go invariant of
/root/reference/sweep_sea_detuning.py:677-691, extended inside one solve.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def extract_partial(
    ckpt_path: str,
    trace_path: str,
    n_sea: int,
    t_final: float,
    steps: int,
) -> dict:
    """Write the exact-prefix trace NPZ; return the results-JSON record."""
    data = np.load(ckpt_path, allow_pickle=False)
    fp = json.loads(str(data["fingerprint"]))
    # Same trap as the run wrapper's stale-status bug: the checkpoint dir is
    # keyed by n_sea only, so insist the snapshot describes THIS workload.
    if int(fp.get("T", -1)) != steps:
        raise SystemExit(
            f"checkpoint is for a {fp.get('T')}-step run, not {steps}")
    # T alone is not enough: a T_FINAL-customized run (run_trace.sh) has the
    # same step count on a stretched grid — the time axis must come from the
    # checkpoint's own dt or the committed NPZ mislabels the horizon.
    dt = float(fp.get("dt", -1.0))
    if abs(dt * (steps - 1) - t_final) > 1e-9 * max(1.0, t_final):
        raise SystemExit(
            f"checkpoint dt {dt} implies t_final {dt * (steps - 1)}, "
            f"not {t_final} — pass the run's actual --t-final")
    done = int(data["done_blocks"])
    rows_flat = np.asarray(data["rows_flat"])
    if rows_flat.size != done * 8:
        raise SystemExit(
            f"checkpoint rows_flat has {rows_flat.size} values, expected {done * 8}")
    rows = np.ascontiguousarray(rows_flat.reshape(done, 8).T)  # (8, done)
    t = np.linspace(0.0, t_final, steps)[:done]
    drift = float(np.abs(rows[6] - 1.0).max()) if done else 0.0

    np.savez_compressed(
        trace_path, t=t, rows=rows,
        Iz_sea=rows[2], Iz_R=rows[3], state_norm=rows[6],
        steps_total=steps,
    )
    return {
        "engine": "cheb-step", "status": "partial",
        "arithmetic": fp.get("arith", "?"),
        "n_sea": n_sea, "dim": int(fp.get("dim", 0)),
        "t_final": t_final, "steps_total": steps,
        "steps_done": done,
        "t_reached": float(t[-1]) if done else 0.0,
        "norm_drift_so_far": drift,
        "trace_npz": os.path.basename(trace_path),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": ("first steps_done columns of the production horizon, exact; "
                 "checkpoint resumes losslessly from here"),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-sea", type=int, default=14)
    ap.add_argument("--t-final", type=float, default=30.0)
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint NPZ (default: the n_sea-keyed run dir)")
    ap.add_argument("--trace-out", default=None)
    ap.add_argument("--out", default=os.path.join(HERE, "large_bath_results.json"))
    args = ap.parse_args()

    ckpt = args.ckpt or os.path.join(
        HERE, f".cheb_step_ckpt_n{args.n_sea}", "ext_advance.npz")
    trace_path = args.trace_out or os.path.join(
        HERE, f"cheb_step_n{args.n_sea}_partial.npz")
    out = extract_partial(ckpt, trace_path, args.n_sea, args.t_final, args.steps)

    key = f"cheb_step_n{args.n_sea}_partial"
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results[key] = out
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
