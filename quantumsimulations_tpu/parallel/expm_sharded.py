"""Row-sharded dense step-operator propagation: N=13-16 beyond one chip's HBM.

The single-chip dense-expm path (dynamics/expm_propagator.py) is the only
scheme whose total work is sublinear in ||H||*t (squaring reaches
exp(-iH dt) in log2 steps; every output point then costs one dense matvec).
Its ceiling is HBM: at dim 16384 the limb stacks of one step operator exceed
a v5e's 16 GB.  This module removes that ceiling by sharding every dense
operator BY ROWS over a mesh axis and feeding the limb-product panels with
`all_gather` collectives over ICI:

  * U is carried as row-sharded (rows/P, dim) f64 planes; each product
    re-splits its operands into Ozaki limbs with a `pmax`-negotiated GLOBAL
    scale (per-device scales would put the gathered panels on different
    grids and break the error-free product).
  * C = A @ B_global: a lax.scan over column panels; each panel gathers
    (L, dim, panel) of B's limbs from all devices (one tiled all_gather per
    panel) and accumulates the significance diagonals smallest-first in f64
    — identical error profile to the single-chip limb matmul (~5e-16/matmul).
  * States stay REPLICATED (dim x block is tiny); applying the row-sharded
    step operator yields each device's rows, re-replicated with one
    all_gather per block advance.

Per-device memory at dim D over P devices: ~2*(L*D^2/P) bytes of int8
limbs + (L, D, panel) gathered panel + f64 planes — dim 16384 fits 4x v5e,
dim 32768 fits a v5p-8 slice.

Replaces: the reference's single-process `qt.sesolve` call
(dipolar_ensemble_with_rare.py:653) for bath sizes no single host can hold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.embed import OperatorSum
from ..ops.extprec import _accumulate_products
from ..dynamics.observables import site_xyz_expectations, state_norms

_TAYLOR_DEGREE = 16
_TAYLOR_THETA = 1.0


def auto_limb_cfg(dim: int) -> tuple[int, int]:
    """(n_limbs, limb_bits) so the i32 accumulator never overflows.

    Constraint: dim * 2^(2*limb_bits) * n_limbs < 2^31 (int8 MXU products,
    exact i32 diagonal sums); keep >= 55 bits of significand.  5-bit limbs
    (11 of them) hold to dim ~190k — far past any reachable Hilbert space.
    """
    for bits in (5, 4, 3):
        n = int(np.ceil(55 / bits))
        if dim * (2 ** (2 * bits)) * n < 2**31:
            return (n, bits)
    raise ValueError(f"dim {dim} too large for exact i32 limb accumulation")


def _split_with_scale(x, inv_scale, n_limbs: int, limb_bits: int):
    """Grid-aligned limb split with an externally negotiated scale."""
    limbs = []
    r = x * inv_scale
    for _ in range(n_limbs):
        l = jnp.rint(r)
        limbs.append(l.astype(jnp.int8))
        r = (r - l) * (2.0**limb_bits)
    return jnp.stack(limbs)


def _global_split(x_local, axis: str, n_limbs: int, limb_bits: int):
    """(limbs, scale) with the scale negotiated across the mesh axis."""
    maxabs = jax.lax.pmax(jnp.max(jnp.abs(x_local)), axis)
    safe = jnp.where(maxabs > 0, maxabs, 1.0)
    e = jnp.floor(jnp.log2(safe)) + 1.0 - limb_bits
    return _split_with_scale(x_local, jnp.exp2(-e), n_limbs, limb_bits), jnp.exp2(e)


def _sharded_cmatmul_prelimbed(
    Ar, sar, Ai, sai, Br, sbr, Bi, sbi,
    axis: str, panel: int, n_limbs: int, limb_bits: int, dim: int,
):
    """Row-sharded complex product C = A @ B_global from pre-split limbs.

    A*, B*: (L, rows_local, dim) int8 limbs (row-sharded).  Returns
    (C_re, C_im) row-sharded f64.  One tiled all_gather of B's panel limbs
    per column panel; diagonals accumulate exactly in i32 then smallest-first
    in f64 (native s8xs8->s32 MXU products, same bound as
    ops/extprec.matmul_f64).
    """
    rows_local = Ar.shape[1]
    n_panels = dim // panel

    def body(carry, p):
        c_re, c_im = carry
        br_p = jax.lax.dynamic_slice_in_dim(Br, p * panel, panel, axis=2)
        bi_p = jax.lax.dynamic_slice_in_dim(Bi, p * panel, panel, axis=2)
        # (L, rows_local, panel) -> (L, dim, panel): one collective per panel
        br_g = jax.lax.all_gather(br_p, axis, axis=1, tiled=True)
        bi_g = jax.lax.all_gather(bi_p, axis, axis=1, tiled=True)
        out_shape = (rows_local, panel)
        rr = _accumulate_products(Ar, sar, br_g, sbr, out_shape, n_limbs, limb_bits)
        ii = _accumulate_products(Ai, sai, bi_g, sbi, out_shape, n_limbs, limb_bits)
        ri = _accumulate_products(Ar, sar, bi_g, sbi, out_shape, n_limbs, limb_bits)
        ir = _accumulate_products(Ai, sai, br_g, sbr, out_shape, n_limbs, limb_bits)
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, rr - ii, p * panel, axis=1)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, ri + ir, p * panel, axis=1)
        return (c_re, c_im), None

    # mark the carry as device-varying over the mesh axis (each device's row
    # block differs) so the scan carry type matches the body output
    init = (
        jax.lax.pcast(jnp.zeros((rows_local, dim), jnp.float64), (axis,), to='varying'),
        jax.lax.pcast(jnp.zeros((rows_local, dim), jnp.float64), (axis,), to='varying'),
    )
    (c_re, c_im), _ = jax.lax.scan(body, init, jnp.arange(n_panels))
    return c_re, c_im


def _sharded_csquare(u_re, u_im, axis, panel, n_limbs, limb_bits, dim):
    Ar, sar = _global_split(u_re, axis, n_limbs, limb_bits)
    Ai, sai = _global_split(u_im, axis, n_limbs, limb_bits)
    return _sharded_cmatmul_prelimbed(
        Ar, sar, Ai, sai, Ar, sar, Ai, sai, axis, panel, n_limbs, limb_bits, dim
    )


def _apply_replicated(Ar, sar, Ai, sai, s_re, s_im, axis, n_limbs, limb_bits):
    """Row-sharded (pre-limbed) U applied to a REPLICATED (dim, B) state block.

    Returns the re-replicated (dim, B) product via one tiled all_gather.
    """
    # replicated operand: every device computes the same limb split, so the
    # local max IS the global max — no pmax needed.
    maxabs = jnp.max(jnp.concatenate([jnp.abs(s_re), jnp.abs(s_im)]))
    safe = jnp.where(maxabs > 0, maxabs, 1.0)
    e = jnp.floor(jnp.log2(safe)) + 1.0 - limb_bits
    inv = jnp.exp2(-e)
    sb = jnp.exp2(e)
    Br = _split_with_scale(s_re, inv, n_limbs, limb_bits)
    Bi = _split_with_scale(s_im, inv, n_limbs, limb_bits)
    out_shape = (Ar.shape[1], s_re.shape[1])
    rr = _accumulate_products(Ar, sar, Br, sb, out_shape, n_limbs, limb_bits)
    ii = _accumulate_products(Ai, sai, Bi, sb, out_shape, n_limbs, limb_bits)
    ri = _accumulate_products(Ar, sar, Bi, sb, out_shape, n_limbs, limb_bits)
    ir = _accumulate_products(Ai, sai, Br, sb, out_shape, n_limbs, limb_bits)
    n_re = jax.lax.all_gather(rr - ii, axis, axis=0, tiled=True)
    n_im = jax.lax.all_gather(ri + ir, axis, axis=0, tiled=True)
    return n_re, n_im


def expm_traces_sharded(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    mesh: Mesh,
    axis: str = "sp",
    block: int = 128,
    panel: int = 512,
) -> np.ndarray:
    """Assembled observable rows (8, T) via a row-sharded dense step operator.

    The whole pipeline — Taylor-Horner core, scaling squarings, doubling-pass
    seeds, and the block-advance trace loop with on-device observables — runs
    as ONE shard_map program over the mesh axis.
    """
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("expm stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0
    dim = int(np.prod(dims))
    n_dev = mesh.shape[axis]
    if dim % n_dev:
        raise ValueError(f"dim {dim} not divisible by {n_dev} devices")
    block = min(block, T)
    block = 1 << (block.bit_length() - 1)
    log2_block = int(np.log2(block))
    n_blocks = int(np.ceil(T / block))
    n_limbs, limb_bits = auto_limb_cfg(dim)
    panel = min(panel, dim)

    from ..dynamics.krylov import spectral_norm_bound

    norm = spectral_norm_bound(H)
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _TAYLOR_THETA))))
    dt_s = dt / (2**n_sq)

    Hd = H.to_dense()
    e0 = float(np.real(np.vdot(psi0, Hd @ psi0)))
    # A = -i H dt_s, row-sharded over the mesh axis
    row_sharding = NamedSharding(mesh, P(axis, None))
    A_re = jax.device_put(jnp.asarray(Hd.imag * dt_s), row_sharding)
    A_im = jax.device_put(jnp.asarray(-Hd.real * dt_s), row_sharding)
    del Hd
    p_re = jax.device_put(jnp.asarray(psi0.real), NamedSharding(mesh, P()))
    p_im = jax.device_put(jnp.asarray(psi0.imag), NamedSharding(mesh, P()))
    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P()),
        out_specs=P(),
    )
    def run(a_re, a_im, p0_re, p0_im):
        # limbs of A once; Horner D <- A + (A @ D)/k, k = degree..2
        Ar, sar = _global_split(a_re, axis, n_limbs, limb_bits)
        Ai, sai = _global_split(a_im, axis, n_limbs, limb_bits)

        def horner(k, D):
            d_re, d_im = D
            Br, sbr = _global_split(d_re, axis, n_limbs, limb_bits)
            Bi, sbi = _global_split(d_im, axis, n_limbs, limb_bits)
            t_re, t_im = _sharded_cmatmul_prelimbed(
                Ar, sar, Ai, sai, Br, sbr, Bi, sbi,
                axis, panel, n_limbs, limb_bits, dim,
            )
            invk = 1.0 / (_TAYLOR_DEGREE - k)
            return a_re + t_re * invk, a_im + t_im * invk

        # k counts down degree..2 == _TAYLOR_DEGREE - i for i = 0..degree-2
        u_re, u_im = jax.lax.fori_loop(0, _TAYLOR_DEGREE - 1, horner, (a_re, a_im))
        # U = I + D on this device's row block
        my = jax.lax.axis_index(axis)
        rows_local = u_re.shape[0]
        row_ids = my * rows_local + jnp.arange(rows_local)
        eye_local = (row_ids[:, None] == jnp.arange(dim)[None, :]).astype(jnp.float64)
        u_re = u_re + eye_local

        def sq(_, UU):
            return _sharded_csquare(UU[0], UU[1], axis, panel, n_limbs, limb_bits, dim)

        if n_sq > 0:
            u_re, u_im = jax.lax.fori_loop(0, n_sq, sq, (u_re, u_im))

        # doubling pass: replicated padded seed buffer + U -> U^block.
        # (pcast-to-varying: the buffer mixes with gathered apply results)
        S_re = jax.lax.pcast(
            jnp.zeros((dim, block), jnp.float64).at[:, 0].set(p0_re),
            (axis,), to="varying",
        )
        S_im = jax.lax.pcast(
            jnp.zeros((dim, block), jnp.float64).at[:, 0].set(p0_im),
            (axis,), to="varying",
        )

        def dbl(k, carry):
            S_re, S_im, u_re, u_im = carry
            Cr, scr = _global_split(u_re, axis, n_limbs, limb_bits)
            Ci, sci = _global_split(u_im, axis, n_limbs, limb_bits)
            n_re, n_im = _apply_replicated(
                Cr, scr, Ci, sci, S_re, S_im, axis, n_limbs, limb_bits
            )
            w = 1 << k
            mask = (jnp.arange(block) >= w) & (jnp.arange(block) < 2 * w)
            S_re = jnp.where(mask[None, :], jnp.roll(n_re, w, axis=1), S_re)
            S_im = jnp.where(mask[None, :], jnp.roll(n_im, w, axis=1), S_im)
            u_re, u_im = _sharded_cmatmul_prelimbed(
                Cr, scr, Ci, sci, Cr, scr, Ci, sci,
                axis, panel, n_limbs, limb_bits, dim,
            )
            return S_re, S_im, u_re, u_im

        if log2_block > 0:
            S_re, S_im, u_re, u_im = jax.lax.fori_loop(
                0, log2_block, dbl, (S_re, S_im, u_re, u_im)
            )

        # advance: U^block applied to whole blocks; observables on the
        # replicated block (redundant across devices, trivially cheap)
        Br, sbr = _global_split(u_re, axis, n_limbs, limb_bits)
        Bi, sbi = _global_split(u_im, axis, n_limbs, limb_bits)

        def adv(S, _):
            S_re, S_im = S
            from ..ops.cplx import Cplx

            states = Cplx(S_re, S_im)
            xyz = site_xyz_expectations(states, dims)
            norms = state_norms(states)
            sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
            rare = xyz[idx_rare]
            rows = jnp.stack(
                [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms,
                 jnp.full(norms.shape, e0)]
            )
            n_re, n_im = _apply_replicated(
                Br, sbr, Bi, sbi, S_re, S_im, axis, n_limbs, limb_bits
            )
            return (n_re, n_im), rows

        _, rows = jax.lax.scan(adv, (S_re, S_im), None, length=n_blocks)
        # every device computed identical rows from the re-replicated states;
        # pmax re-types them as axis-invariant without changing any bit
        return jax.lax.pmax(rows, axis)  # (n_blocks, 8, block)

    out = jax.jit(run)(A_re, A_im, p_re, p_im)
    arr = np.asarray(out)
    return np.moveaxis(arr, 0, 1).reshape(8, -1)[:, :T]


# ===========================================================================
# Exact-limb ("ext") row-sharded engine — the PARITY-GRADE multi-chip path.
#
# The Ozaki-tier engine above re-splits f64 planes around every product, so
# each matmul rounds at ~5e-16 in the f64 diagonal combine; the ~2^17-deep
# squaring chain amplifies that to ~5e-6 at dim >= 16384 — below the 1e-8
# QuTiP-parity bar (reference tolerances: sweep_sea_detuning.py:1247-1250).
# This engine instead carries every chain operand as canonical FIXED-GRID
# int8 limb stacks (ops/extprec.py, resolution 2^-65): products land exactly
# on grid, carry cascades are exact integer ops, and the only error is the
# final truncation — the same error profile as the single-chip ext chain
# that measures 1e-10 norm drift at dim 8192 over the full 30 s horizon.
#
# Sharding: identical row-sharded layout to the Ozaki engine — (L, rows/P,
# dim) int8 stacks per device, one tiled all_gather of B's (L, dim, panel)
# limbs per column panel.  The fixed grid REMOVES the pmax scale negotiation
# entirely: no collective is needed for operand scaling, and gathered panels
# are bit-identical to the single-chip operands.
# ===========================================================================


def _ext_sharded_cmatmul(are, aim, bre, bim, axis: str, panel: int, dim: int):
    """Row-sharded exact complex limb product C = A @ B.

    are/aim: (L, rows_local, dim) canonical int8 ext limbs (this device's
    rows); bre/bim: same layout.  One tiled all_gather of B's column-panel
    limbs per panel; the diagonal pyramid + carry cascade are exactly
    ops/extprec._ext_cpanel_product — same truncation bound as single-chip.
    """
    from ..ops.extprec import _ext_cpanel_product

    L, rows_local, _ = are.shape
    n_panels = dim // panel

    def body(carry, p):
        c_re, c_im = carry
        br_p = jax.lax.dynamic_slice_in_dim(bre, p * panel, panel, axis=2)
        bi_p = jax.lax.dynamic_slice_in_dim(bim, p * panel, panel, axis=2)
        br_g = jax.lax.all_gather(br_p, axis, axis=1, tiled=True)
        bi_g = jax.lax.all_gather(bi_p, axis, axis=1, tiled=True)
        o_re, o_im = _ext_cpanel_product(are, aim, br_g, bi_g, L)
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, o_re, p * panel, axis=2)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, o_im, p * panel, axis=2)
        return (c_re, c_im), None

    init = (
        jax.lax.pcast(
            jnp.zeros((L, rows_local, dim), jnp.int8), (axis,), to="varying"
        ),
        jax.lax.pcast(
            jnp.zeros((L, rows_local, dim), jnp.int8), (axis,), to="varying"
        ),
    )
    (c_re, c_im), _ = jax.lax.scan(body, init, jnp.arange(n_panels))
    return c_re, c_im


def _ext_sharded_apply(are, aim, s_re, s_im, axis: str):
    """Row-sharded ext B applied to a REPLICATED (L, dim, block) limb state.

    Returns the re-replicated product limb stacks via one tiled all_gather
    (int8 — a quarter of the f64 bytes the Ozaki engine gathers).
    """
    from ..ops.extprec import _ext_cpanel_product

    L = are.shape[0]
    o_re, o_im = _ext_cpanel_product(are, aim, s_re, s_im, L)
    n_re = jax.lax.all_gather(o_re, axis, axis=1, tiled=True)
    n_im = jax.lax.all_gather(o_im, axis, axis=1, tiled=True)
    return n_re, n_im


def expm_traces_sharded_ext(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    mesh: Mesh,
    axis: str = "sp",
    block: int = 128,
    panel: int = 512,
) -> np.ndarray:
    """Assembled observable rows (8, T) via the row-sharded EXACT-LIMB chain.

    Same contract as :func:`expm_traces_sharded` but parity-grade: the full
    Horner/squaring/doubling/advance pipeline runs in the canonical ext limb
    domain (truncation ~2^-65 per product, zero f64 rounding in the chain),
    so dim >= 16384 (SURVEY.md §5 long-context slot, BASELINE config 5)
    reaches the same 1e-8 QuTiP-parity grade the single-chip ext chain
    measures at dim 8192.  Replaces qt.sesolve
    (dipolar_ensemble_with_rare.py:653) at bath sizes beyond any single chip.
    """
    from ..dynamics.expm_propagator import (
        _EXT_DEGREE,
        _EXT_THETA,
        _dbl_shift_matrices,
        _shift_cols,
        _spectral_norm_host,
    )
    from ..dynamics.krylov import spectral_norm_bound
    from ..ops.cplx import Cplx
    from ..ops.extprec import (
        EXT_LIMBS,
        ext_add,
        ext_split_host,
        ext_val,
        taylor_coeff_limbs,
        _ext_scalar_mul_traced,
    )

    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("expm stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0
    dim = int(np.prod(dims))
    n_dev = mesh.shape[axis]
    if dim % n_dev:
        raise ValueError(f"dim {dim} not divisible by {n_dev} devices")
    L = EXT_LIMBS
    # exact i32 diagonal sums (see ops/extprec.ext_cmatmul)
    assert dim * 33 * 33 * 2 * L < 2**31, "i32 would overflow in ext pyramid"
    block = min(block, T)
    block = 1 << (block.bit_length() - 1)
    log2_block = int(np.log2(block))
    n_blocks = int(np.ceil(T / block))
    panel = min(panel, dim)

    Hd = H.to_dense()
    e0 = float(np.real(np.vdot(psi0, Hd @ psi0)))
    norm = min(spectral_norm_bound(H), _spectral_norm_host(Hd))
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _EXT_THETA))))
    dt_s = dt / (2**n_sq)

    # host split to canonical limbs; A row-sharded (axis 1 of (L, dim, dim))
    row_sharding = NamedSharding(mesh, P(None, axis, None))
    A_re = jax.device_put(jnp.asarray(ext_split_host(Hd.imag * dt_s)), row_sharding)
    A_im = jax.device_put(jnp.asarray(ext_split_host(-Hd.real * dt_s)), row_sharding)
    del Hd
    repl = NamedSharding(mesh, P())
    p_re = jax.device_put(
        jnp.asarray(ext_split_host(np.ascontiguousarray(psi0.real))), repl
    )
    p_im = jax.device_put(
        jnp.asarray(ext_split_host(np.ascontiguousarray(psi0.imag))), repl
    )
    coeffs = jax.device_put(jnp.asarray(taylor_coeff_limbs(_EXT_DEGREE)), repl)
    shift = jax.device_put(
        jnp.asarray(_dbl_shift_matrices(0, max(log2_block, 1), block)), repl
    )
    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None), P(), P(), P(), P()),
        out_specs=P(),
    )
    def run(a_re, a_im, p0_re, p0_im, cf, shf):
        rows_local = a_re.shape[1]
        my = jax.lax.axis_index(axis)

        # Horner: D <- A + (A @ D) / k, k = degree..2 (exact limb ops)
        def horner(i, D):
            d_re, d_im = D
            t_re, t_im = _ext_sharded_cmatmul(
                a_re, a_im, d_re, d_im, axis, panel, dim
            )
            cl = cf[_EXT_DEGREE - i]
            t_re = _ext_scalar_mul_traced(t_re, cl)
            t_im = _ext_scalar_mul_traced(t_im, cl)
            return ext_add(a_re, t_re), ext_add(a_im, t_im)

        u_re, u_im = jax.lax.fori_loop(0, _EXT_DEGREE - 1, horner, (a_re, a_im))

        # U = I + D: 1.0 sits exactly on limb 0 at this device's row offset
        row_ids = my * rows_local + jnp.arange(rows_local)
        eye_local = (row_ids[:, None] == jnp.arange(dim)[None, :]).astype(jnp.int32)
        u_re = u_re.at[0].set((u_re[0].astype(jnp.int32) + eye_local).astype(jnp.int8))

        def sq(_, UU):
            return _ext_sharded_cmatmul(
                UU[0], UU[1], UU[0], UU[1], axis, panel, dim
            )

        if n_sq > 0:
            u_re, u_im = jax.lax.fori_loop(0, n_sq, sq, (u_re, u_im))

        # doubling pass on the replicated padded limb seed buffer
        S_re = jax.lax.pcast(
            jnp.zeros((L, dim, block), jnp.int8).at[:, :, 0].set(p0_re),
            (axis,), to="varying",
        )
        S_im = jax.lax.pcast(
            jnp.zeros((L, dim, block), jnp.int8).at[:, :, 0].set(p0_im),
            (axis,), to="varying",
        )

        def dbl(k, carry):
            S_re, S_im, b_re, b_im = carry
            n_re, n_im = _ext_sharded_apply(b_re, b_im, S_re, S_im, axis)
            Pk = jax.lax.dynamic_index_in_dim(shf, k, axis=0, keepdims=False)
            # shifted columns land on zero columns: plain int8 add is exact
            S_re = S_re + _shift_cols(n_re, Pk)
            S_im = S_im + _shift_cols(n_im, Pk)
            b_re, b_im = _ext_sharded_cmatmul(
                b_re, b_im, b_re, b_im, axis, panel, dim
            )
            return S_re, S_im, b_re, b_im

        if log2_block > 0:
            S_re, S_im, u_re, u_im = jax.lax.fori_loop(
                0, log2_block, dbl, (S_re, S_im, u_re, u_im)
            )

        # advance: observables from the limb states, then S <- B @ S
        def adv(S, _):
            S_re, S_im = S
            states = Cplx(ext_val(S_re), ext_val(S_im))
            xyz = site_xyz_expectations(states, dims)
            norms = state_norms(states)
            sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
            rare = xyz[idx_rare]
            rows = jnp.stack(
                [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms,
                 jnp.full(norms.shape, e0)]
            )
            n_re, n_im = _ext_sharded_apply(u_re, u_im, S_re, S_im, axis)
            return (n_re, n_im), rows

        _, rows = jax.lax.scan(adv, (S_re, S_im), None, length=n_blocks)
        # identical on every device (computed from re-replicated states)
        return jax.lax.pmax(rows, axis)  # (n_blocks, 8, block)

    out = jax.jit(run)(A_re, A_im, p_re, p_im, coeffs, shift)
    arr = np.asarray(out)
    return np.moveaxis(arr, 0, 1).reshape(8, -1)[:, :T]
