"""Phase-cost anatomy of the N=12 ext chain: first-dispatch vs warm cost of
every device program in the chain, each fetch-synced, with perturbed inputs
(the dev tunnel memoizes identical dispatches).

Separates executable-shipping/first-dispatch overhead from steady compute to
target the N<200 s work: run each program twice and report both walls.

Usage: python experiments/n12_phase_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)

from quantumsimulations_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)

from quantumsimulations_tpu.dynamics import expm_propagator as EP  # noqa: E402
from quantumsimulations_tpu.ops import extprec as XP  # noqa: E402


def fsync(x):
    """Honest sync: fetch one element (block_until_ready returns at dispatch
    acceptance on this backend, docs/ROUND3.md)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timed(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    fsync(out)
    print(f"  {label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    dim, block, panel = 8192, 512, 512
    L = XP.EXT_LIMBS

    # representative COO: same nnz density as the N=12 H (~0.17%)
    rng = np.random.default_rng(0)
    nnz = 120_000
    r = rng.integers(0, dim, nnz).astype(np.int32)
    c = rng.integers(0, dim, nnz).astype(np.int32)
    v = rng.normal(size=nnz) * 0.01
    w = rng.normal(size=nnz) * 0.01

    print("[extraction] ext_split_upload_coo_pair (scatter + limb extract):",
          flush=True)
    Are, Aim = timed("first", XP.ext_split_upload_coo_pair, r, c, v, w, dim)
    Dre, Dim = timed("warm (perturbed)", XP.ext_split_upload_coo_pair,
                     r, c, v * (1 + 1e-9), w * (1 + 1e-9), dim)

    coeffs = jnp.asarray(XP.taylor_coeff_limbs(EP._EXT_DEGREE))

    print("[horner] _ext_horner_chunk (one iteration):", flush=True)
    o = timed("first", EP._ext_horner_chunk, Are, Aim, Dre, Dim, coeffs,
              EP._EXT_DEGREE, 1, panel)
    o = timed("warm", EP._ext_horner_chunk, Are, Aim, o[0], o[1], coeffs,
              EP._EXT_DEGREE - 1, 1, panel)
    Ure, Uim = o

    print("[square] _ext_square_chunk (n=1):", flush=True)
    U = timed("first", EP._ext_square_chunk, Ure, Uim, 1, panel)
    U = timed("warm", EP._ext_square_chunk, U[0], U[1], 1, panel)
    Ure, Uim = U

    print("[dbl] _ext_dbl_seed_step:", flush=True)
    S_re = jnp.zeros((L, dim, block), jnp.int8)
    S_im = jnp.zeros((L, dim, block), jnp.int8)
    S_re = S_re.at[0, :, 0].set(1)
    P1 = jnp.asarray(EP._dbl_shift_matrices(0, 1, block)[0])
    S = timed("first", EP._ext_dbl_seed_step, Ure, Uim, S_re, S_im, P1, panel)
    S = timed("warm", EP._ext_dbl_seed_step, Ure, Uim, S[0], S[1], P1, panel)
    S_re, S_im = S

    print("[collect] _ext_advance_collect (20 blocks):", flush=True)
    o = timed("first", EP._ext_advance_collect, Ure, Uim, S_re, S_im, 20)
    st_re, st_im, S_re2, S_im2 = o
    o2 = timed("warm", EP._ext_advance_collect, Ure, Uim, S_re2, S_im2, 20)

    print("[rows] _ext_rows_fused (20 blocks):", flush=True)
    dims = tuple([2] * 13)
    sea_mask = jnp.asarray(np.array([1.0] * 12 + [0.0]))
    e0 = jnp.asarray(0.0)
    f = timed("first", EP._ext_rows_fused, st_re, st_im, sea_mask, e0, dims, 12)
    f = timed("warm", EP._ext_rows_fused, o2[0], o2[1], sea_mask, e0, dims, 12)


if __name__ == "__main__":
    main()
