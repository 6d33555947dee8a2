"""Tunnel fetch-bandwidth probe: what actually governs trace-download time.

The n6 headline is download-dominated (2.2-2.5 s of a ~4 s total in the
round-4 driver run, experiments/n6_phase_probe.py).  Before engineering a
packed transfer format, measure on THIS tunnel:

  1. bytes scaling — the same element count fetched as f64 / f32 / int16
     (is the cost per byte, per element, or fixed?);
  2. stream scaling — one 52 MB fetch vs k parallel slice-fetch threads
     (does the tunnel multiply bandwidth across concurrent streams, as it
     does for executable loads, docs/ROUND4.md?).

Writes experiments/fetch_probe.json.
Usage: python experiments/fetch_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)


def _fetch_full(arr) -> float:
    t0 = time.perf_counter()
    np.asarray(arr)
    return time.perf_counter() - t0


def _fetch_threads(arr, k: int) -> float:
    n = arr.shape[0]
    per = n // k
    slices = [arr[i * per:(i + 1) * per] for i in range(k)]
    for s in slices:
        s.block_until_ready()  # slicing cost excluded; measure transfer only
    outs = [None] * k
    t0 = time.perf_counter()
    ths = [
        threading.Thread(target=lambda i=i: outs.__setitem__(i, np.asarray(slices[i])))
        for i in range(k)
    ]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    return time.perf_counter() - t0


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    n = 6_500_000  # the n6 sweep's row payload: 39 sims x 8 rows x 20k, f64
    key = jnp.arange(n, dtype=jnp.float64) * 1e-7
    f64 = jnp.sin(key)
    f32 = f64.astype(jnp.float32)
    i16 = (f64 * 1000).astype(jnp.int16)
    i16x3 = jnp.tile((f64[:, None] * 1000).astype(jnp.int16), (1, 3)).reshape(-1)
    for a in (f64, f32, i16, i16x3):
        a.block_until_ready()

    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "device": str(jax.devices()[0]), "elements": n, "runs": {}}

    def rec(name: str, fn, *a):
        walls = [round(fn(*a), 3) for _ in range(3)]
        out["runs"][name] = walls
        print(f"{name}: {walls} s", flush=True)

    rec("f64_52MB_1stream", _fetch_full, f64)
    rec("f32_26MB_1stream", _fetch_full, f32)
    rec("i16_13MB_1stream", _fetch_full, i16)
    rec("i16x3_39MB_1stream", _fetch_full, i16x3)
    for k in (2, 4, 8):
        rec(f"f64_52MB_{k}streams", _fetch_threads, f64, k)
    rec("i16x3_39MB_4streams", _fetch_threads, i16x3, 4)

    with open(os.path.join(HERE, "fetch_probe.json"), "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("wrote experiments/fetch_probe.json", flush=True)


if __name__ == "__main__":
    main()
