"""Microprobe: int8-limb vs XLA-f64-emulated matmul at the split-apply shapes.

The cheb-step batch probe (cheb_batch_probe.py) showed the N>=13 apply is
compute-bound on the XLA f64-emulation roofline, so the candidate round-5
lever is running the split-apply's matmuls as exact 11-limb int8 MXU
products (ops/extprec.py::matmul_f64 — f64-roundoff grade, the precision
the Chebyshev recurrence needs; fewer limbs would float the 7.4e7-apply
error growth above the 1e-9 budget).  At dim-8192 square shapes the limb
product measured 1.5 f64-TMAC/s vs ~0.31 for the emulation (4.8x); this
probe measures both at the ACTUAL fused-apply shapes of dim 16384/32768
(left-concat (R, DL) @ (DL, DR) with small DL), fetch-synced, to decide
whether the win survives small contraction dims.

Writes experiments/limb_apply_probe.json.
"""

from __future__ import annotations

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

from quantumsimulations_tpu.ops.extprec import limbs_of, matmul_f64_prelimbed  # noqa: E402
from quantumsimulations_tpu.utils.profiling import fetch_sync  # noqa: E402


@jax.jit
def _dot_f64(a, b):
    return a @ b


def _time(fn, *args, reps=8):
    out = fn(*args)
    fetch_sync(out)  # compile + load
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # (R, DL) @ (DL, DR): the fused apply's left product at dim 16384
    # (7+7 split: DL=DR=128, left concat ~17 blocks) and dim 32768 (7+8);
    # plus the dim-8192 sanity shape where the 4.8x was measured.
    cases = [
        {"name": "apply16k-left", "R": 2176, "K": 128, "N": 128},
        {"name": "apply16k-cross2", "R": 2048, "K": 128, "N": 128},
        {"name": "apply32k-left", "R": 2176, "K": 128, "N": 256},
        {"name": "square8k", "R": 8192, "K": 8192, "N": 512},
    ]
    rows = []
    for c in cases:
        a = rng.standard_normal((c["R"], c["K"]))
        b = rng.standard_normal((c["K"], c["N"]))
        aj = jnp.asarray(a)
        bj = jnp.asarray(b)
        t_f64 = _time(_dot_f64, aj, bj)
        A, sa = limbs_of(aj)
        fetch_sync(A)
        t_limb = _time(matmul_f64_prelimbed, A, sa, bj)
        macs = c["R"] * c["K"] * c["N"]
        row = {
            **c,
            "f64_emul_ms": round(t_f64 * 1e3, 3),
            "limb_ms": round(t_limb * 1e3, 3),
            "f64_TMACs": round(macs / t_f64 / 1e12, 3),
            "limb_TMACs": round(macs / t_limb / 1e12, 3),
            "limb_speedup": round(t_f64 / t_limb, 2),
        }
        rows.append(row)
        print(f"[{c['name']}] f64 {row['f64_emul_ms']} ms "
              f"({row['f64_TMACs']} TMAC/s) vs limb {row['limb_ms']} ms "
              f"({row['limb_TMACs']} TMAC/s) -> {row['limb_speedup']}x",
              flush=True)

    out = {"rows": rows, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(os.path.join(HERE, "limb_apply_probe.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
