"""Dense step-operator propagation: U = exp(-i H dt) by Taylor + squaring.

The large-dense-dim path (N ~ 12-13 spins, Hilbert dim 4k-8k): a host
eigendecomposition would dominate the runtime, so instead the step operator
for ONE output interval is built on-device and the whole trace is advanced by
blocked matmuls:

  1. U = exp(-i H dt) via scaling-and-squaring with a degree-`K` Taylor core
     (Paterson–Stockmeyer evaluation).  Only matmuls and adds — no linear
     solves — so it runs entirely in (re, im) float64 pairs on the MXU.
  2. The first `B` output states are built by sequential U-matvecs, then
     U_B = U^B advances whole (dim x B) blocks: states_{k+1} = U_B @ states_k.
     Work is T * dim^2 MACs in MXU-shaped matmuls instead of the reference's
     ~3e6 ODE steps/sim (sweep_sea_detuning.py:1247-1250).

Unitarity keeps rounding benign: each squaring/propagation multiplies by a
unitary (to ~1e-15), so errors grow linearly, staying ~1e-12 over 2e4 steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, matmul
from ..ops.embed import OperatorSum
from .krylov import spectral_norm_bound
from .observables import site_xyz_expectations, state_norms

_TAYLOR_DEGREE = 16
_TAYLOR_THETA = 1.0  # scale so that ||A|| * dt / 2^s <= theta


def _cplx_eye(dim: int) -> Cplx:
    return Cplx(jnp.eye(dim), jnp.zeros((dim, dim)))


def _taylor_expm(A: Cplx, degree: int = _TAYLOR_DEGREE) -> Cplx:
    """exp(A) by Horner-evaluated truncated Taylor (||A|| <= ~1)."""
    dim = A.shape[0]
    acc = _cplx_eye(dim)
    # Horner: exp(A) ~ I + A(I + A/2 (I + A/3 (...)))
    for k in range(degree, 0, -1):
        acc = _cplx_eye(dim) + matmul(A, acc) * (1.0 / k)
    return acc


@partial(jax.jit, static_argnames=("n_squarings", "degree"))
def _expm_scaled(Hre, Him, dt_scaled: float, n_squarings: int, degree: int = _TAYLOR_DEGREE):
    """exp(-i H dt) with dt = dt_scaled * 2^n_squarings."""
    A = Cplx(Him * dt_scaled, -Hre * dt_scaled)  # -i * H * dt_scaled
    U = _taylor_expm(A, degree)
    for _ in range(n_squarings):
        U = matmul(U, U)
    return U.re, U.im


def build_step_operator(H: OperatorSum, dt: float) -> Cplx:
    """Dense U = exp(-i H dt) on device."""
    Hd = H.to_dense()
    norm = spectral_norm_bound(H)
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _TAYLOR_THETA))))
    dt_scaled = dt / (2**n_sq)
    Ure, Uim = _expm_scaled(
        jnp.asarray(Hd.real), jnp.asarray(Hd.imag), dt_scaled, n_sq
    )
    return Cplx(Ure, Uim)


@partial(jax.jit, static_argnames=("n_blocks", "block", "dims"))
def _propagate_blocks(U: Cplx, psi0: Cplx, n_blocks: int, block: int, dims):
    """All output states by blocked stepping; returns per-block observables."""
    # seed block: psi(0), U psi(0), ..., U^{B-1} psi(0)
    def seed_body(p, _):
        nxt = Cplx(
            U.re @ p.re - U.im @ p.im,
            U.re @ p.im + U.im @ p.re,
        )
        return nxt, p

    _, seeds = jax.lax.scan(seed_body, psi0, None, length=block)
    S0 = Cplx(seeds.re.T, seeds.im.T)  # (dim, B)

    # U_B = U^block by repeated squaring/multiplication (block is static)
    UB = _matrix_power(U, block)

    def blk_body(S, _):
        xyz = site_xyz_expectations(S, dims)
        nrm = state_norms(S)
        nxt = matmul(UB, S)
        return nxt, (xyz, nrm)

    _, (xyzs, nrms) = jax.lax.scan(blk_body, S0, None, length=n_blocks)
    return xyzs, nrms  # (n_blocks, n, 3, B), (n_blocks, B)


def _matrix_power(U: Cplx, p: int) -> Cplx:
    result = None
    base = U
    while p > 0:
        if p & 1:
            result = base if result is None else matmul(result, base)
        p >>= 1
        if p:
            base = matmul(base, base)
    return result


# ---------------------------------------------------------------------------
# Limb-decomposed (Ozaki) path: f64-precision square matmuls from int8 MXU
# passes — the ONLY way to build a dim-8192 step operator on this chip (XLA's
# own f64 matmul emulation OOMs; a host eigh takes ~an hour on 1 core).
# ---------------------------------------------------------------------------

def _ozaki_expm(H: OperatorSum, dt: float):
    """U = exp(-i H dt) via Taylor + scaling-squaring on limb matmuls.

    Python-driven loop: each product is one jitted limb-matmul program
    (compiled once per shape), avoiding a single monster program that stalls
    the remote compiler.
    """
    from ..ops.extprec import cmatmul_f64, limbs_of, matmul_f64_prelimbed

    from .krylov import spectral_norm_estimate_dense

    Hd = H.to_dense()  # index-arithmetic assembly: ~1 s even at dim 8192
    dim = Hd.shape[0]
    # power-iteration estimate: the triangle-inequality bound costs 1-2 extra
    # squarings, each doubling the limb-matmul rounding amplification
    norm = min(spectral_norm_bound(H), spectral_norm_estimate_dense(Hd))
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _TAYLOR_THETA))))
    dt_s = dt / (2**n_sq)
    # A = -i H dt_s  (upload the planes once; contiguous 2-D H2D is fine)
    Are = jnp.asarray(Hd.imag * dt_s)
    Aim = jnp.asarray(-Hd.real * dt_s)
    del Hd

    # Horner without materializing identities (the chip's effective HBM after
    # the x64 rewriter's fragmentation is ~half of 16 GB):
    #   D_N = A;  D_{k-1} = A + (A @ D_k) / k;  exp(A) ~ I + D_1
    # A's limb stacks are computed once and reused across all iterations.
    Alr, asr = limbs_of(Are)
    Ali, asi = limbs_of(Aim)
    jax.block_until_ready(Alr)

    @jax.jit
    def _axpy(A_plane, t_plane, invk):
        return A_plane + t_plane * invk

    D_re, D_im = Are, Aim
    for k in range(_TAYLOR_DEGREE, 1, -1):
        rr = matmul_f64_prelimbed(Alr, asr, D_re)
        ii = matmul_f64_prelimbed(Ali, asi, D_im)
        t_re = rr - ii
        jax.block_until_ready(t_re)
        del rr, ii
        ri = matmul_f64_prelimbed(Alr, asr, D_im)
        ir = matmul_f64_prelimbed(Ali, asi, D_re)
        t_im = ri + ir
        jax.block_until_ready(t_im)
        del ri, ir
        D_re = _axpy(Are, t_re, 1.0 / k)
        D_im = _axpy(Aim, t_im, 1.0 / k)
        jax.block_until_ready(D_re)
        del t_re, t_im
    del Alr, Ali, Are, Aim

    @jax.jit
    def _add_identity(re):
        rows = jnp.arange(re.shape[0])
        return re + (rows[:, None] == rows[None, :]).astype(re.dtype)

    U_re = _add_identity(D_re)
    U_im = D_im
    del D_re, D_im
    for _ in range(n_sq):
        U_re, U_im = cmatmul_f64(U_re, U_im, U_re, U_im)
    return Cplx(U_re, U_im)


def _cpower_ozaki(U: Cplx, p: int) -> Cplx:
    from ..ops.extprec import cmatmul_f64

    result = None
    base = U
    while p > 0:
        if p & 1:
            if result is None:
                result = base
            else:
                re, im = cmatmul_f64(result.re, result.im, base.re, base.im)
                result = Cplx(re, im)
        p >>= 1
        if p:
            re, im = cmatmul_f64(base.re, base.im, base.re, base.im)
            base = Cplx(re, im)
    return result


def expm_traces_assembled_ozaki(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    block: int = 128,
) -> np.ndarray:
    """Assembled-observable rows (8, T) via the limb-matmul step operator.

    The step operator's limbs are precomputed ONCE; each block advance is 78
    int8 MXU limb matmuls of (2*dim x dim) @ (dim x 2*block).  Identical row
    layout to eig_traces_assembled_batched (TRACE_ROWS).
    """
    import jax

    from ..ops.extprec import limbs_of, matmul_f64_prelimbed
    from .eig_propagator import _flatten_kernel

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
    block = min(block, T)
    n_blocks = int(np.ceil(T / block))

    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )
    hdiag = jnp.asarray(H.diagonal_part())
    # <H> is conserved under the (unitary) step operator; compute the t=0
    # constant FIRST, while memory is free (the eager term-apply allocates
    # hundreds of temporaries and must not run on top of the limb stacks)
    p0c = Cplx(jnp.asarray(psi0.real), jnp.asarray(psi0.imag))
    hp0 = H.apply(p0c, diag=hdiag)
    e0 = jnp.sum(p0c.re * hp0.re + p0c.im * hp0.im)
    e0.block_until_ready()
    del hp0

    # block must be a power of two: the seed block and U^block come out of
    # one doubling pass (S <- [S, P S], P <- P^2), entirely in limb matmuls
    block = 1 << (block.bit_length() - 1)
    n_blocks = int(np.ceil(T / block))

    from ..ops.extprec import cmatmul_f64

    U = _ozaki_expm(H, dt)

    # NOTE: limb stacks are GBs — always jit ARGUMENTS, never closure
    # captures (capture bakes them in as MLIR constants).

    @jax.jit
    def advance(Lr, sr, Li, si, S_re, S_im):
        rr = matmul_f64_prelimbed(Lr, sr, S_re)
        ii = matmul_f64_prelimbed(Li, si, S_im)
        ri = matmul_f64_prelimbed(Lr, sr, S_im)
        ir = matmul_f64_prelimbed(Li, si, S_re)
        return rr - ii, ri + ir

    @partial(jax.jit, static_argnames=("dims_", "idx_rare_"))
    def rows_of(S_re, S_im, dims_, idx_rare_):
        states = Cplx(S_re, S_im)
        xyz = site_xyz_expectations(states, dims_)
        norms = state_norms(states)
        energy = jnp.full(S_re.shape[1], e0)
        sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
        rare = xyz[idx_rare_]
        return jnp.stack(
            [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms, energy]
        )

    # doubling pass: after log2(block) steps S holds the first `block`
    # states and P = U^block
    S_re = jnp.asarray(psi0.real)[:, None]
    S_im = jnp.asarray(psi0.imag)[:, None]
    P = U
    del U
    steps_log = int(np.log2(block))
    for _ in range(steps_log):
        ns_re, ns_im = cmatmul_f64(P.re, P.im, S_re, S_im)
        jax.block_until_ready(ns_re)
        S_re = jnp.concatenate([S_re, ns_re], axis=1)
        S_im = jnp.concatenate([S_im, ns_im], axis=1)
        P2re, P2im = cmatmul_f64(P.re, P.im, P.re, P.im)
        P = Cplx(P2re, P2im)
        jax.block_until_ready(P.re)
    UB = P
    del P

    # limb the block operator's planes separately (concatenation would hold
    # an extra 2 GB)
    UBlr, UBsr = limbs_of(UB.re)
    UBli, UBsi = limbs_of(UB.im)
    jax.block_until_ready(UBlr)
    del UB

    parts = []
    for _ in range(n_blocks):
        parts.append(rows_of(S_re, S_im, dims, idx_rare))
        S_re, S_im = advance(UBlr, UBsr, UBli, UBsi, S_re, S_im)
    stacked = jnp.stack(parts)  # (n_blocks, 8, B)
    flat = np.asarray(_flatten_kernel(stacked))
    rows = np.moveaxis(flat.reshape(n_blocks, 8, block), 0, 1).reshape(8, -1)[:, :T]
    return rows


# ---------------------------------------------------------------------------
# Fixed-grid extended-precision ("ext") path: the parity-grade large-dim
# propagator.  The squaring chain amplifies per-product error by
# 2^(n_squarings + log2(block)) (~2^23 at the N=12 production workload),
# flooring the plain limb path at ~5e-6 on 30 s traces; the ext chain keeps
# every operand in an exact 75-bit limb representation (ops/extprec.py), so
# the amplified truncation stays ~1e-10 — QuTiP-parity grade with NO host
# eigendecomposition (replaces qt.sesolve at dipolar_ensemble_with_rare.py:653
# at the N=12 size the reference cannot reach).
# ---------------------------------------------------------------------------

_EXT_THETA = 1.0 / 16.0  # ||H|| * dt_scaled bound for the Taylor core
_EXT_DEGREE = 10  # truncation (theta^11/11!) ~ 1.4e-21, << the limb floor
_EXT_OBS_Q = 11  # product diagonals kept in observable recombination (~2^-45)


def _ext_obs_pairs(q: int = _EXT_OBS_Q):
    """Limb-pair index tables (j, i, weight) for observable products.

    value(a)*value(b) = sum_{j,i} a_j b_i 2^(2*EXT_E - 5*(j+i+2)); keeping
    pairs with j+i < q truncates at 2^(2*EXT_E - 5*(q+1)) absolute — q=11
    is ~2^-50, far below f64 on O(1) observables."""
    from ..ops.extprec import EXT_E

    jj, ii, w2 = [], [], []
    for s in range(q):
        for j in range(s + 1):
            jj.append(j)
            ii.append(s - j)
            w2.append(2.0 ** (2 * EXT_E - 5 * (s + 2)))
    return np.asarray(jj), np.asarray(ii), np.asarray(w2)


_EXT_PAIRS = _ext_obs_pairs()


def _ext_site_obs(S_re, S_im, dims):
    """Per-site <Sx,Sy,Sz> + norm^2 DIRECTLY from ext limb state stacks.

    S_re, S_im: (L, dim, T) int8 canonical limbs.  Returns
    ((n_sites, 3, T) f64, (T,) f64 norm^2).

    Every sum_rows(plane_a * plane_b) runs as MXU int8 dots over limb pairs:
    diag(A_j^T B_i) summed with the pair weights.  The state is never
    materialized in f64 — emulated-f64 elementwise traffic was the dominant
    cost of the previous advance loop (~4 s per 128-column block at dim 8192
    for the einsum observables; ~1 GB/s effective)."""
    from ..ops.spin import spin_matrix

    L, dim, T = S_re.shape
    jj, ii, w2 = _EXT_PAIRS
    P = len(jj)
    jjd, iid, w2d = jnp.asarray(jj), jnp.asarray(ii), jnp.asarray(w2)
    n_sites = len(dims)

    site_geom = []
    for site in range(n_sites):
        dl = int(np.prod(dims[:site], dtype=np.int64)) if site > 0 else 1
        d = dims[site]
        dr = int(np.prod(dims[site + 1 :], dtype=np.int64)) if site + 1 < n_sites else 1
        s_spin = (d - 1) / 2.0
        site_geom.append((
            dl, d, dr,
            np.real(spin_matrix(s_spin, "x")),
            -np.imag(spin_matrix(s_spin, "y")),  # Jy[a,a+1] = -i c_a
            np.real(np.diag(spin_matrix(s_spin, "z"))),
        ))

    # ONE scan over limb pairs; the 4 dynamic slices per iteration pull the
    # full (dim, T) limb planes ONCE, and every site/level view below is a
    # static reshape/slice XLA fuses into the dots (slicing per site per
    # level cost ~14 GB/block of copies at dim 8192 — this form is ~1 GB).
    def body(acc, p):
        exs, eys, ezs, nr = acc
        j, i, w = jjd[p], iid[p], w2d[p]
        Rj = jax.lax.dynamic_slice_in_dim(S_re, j, 1, axis=0)[0]  # (dim, T)
        Ri = jax.lax.dynamic_slice_in_dim(S_re, i, 1, axis=0)[0]
        Ij = jax.lax.dynamic_slice_in_dim(S_im, j, 1, axis=0)[0]
        Ii = jax.lax.dynamic_slice_in_dim(S_im, i, 1, axis=0)[0]

        def ddot(u, v):
            # columnwise row-sum of u*v: a fused VPU widen-multiply-reduce
            # over the (dl, dr, T) level views.  (A diag(u^T v) MXU dot
            # computes T x the needed work and writes a (T, T) i32 block per
            # product — measured ~7 s/block in diag form vs VPU-native here.)
            p = u.astype(jnp.int32) * v.astype(jnp.int32)
            return jnp.sum(p, axis=(0, 1)).astype(jnp.float64)

        for site, (dl, d, dr, jx, jyc, jz) in enumerate(site_geom):
            lev = [
                tuple(
                    u.reshape(dl, d, dr, T)[:, a] for u in (Rj, Ri, Ij, Ii)
                )
                for a in range(d)
            ]
            for a in range(d):
                raj, rai, iaj, iai = lev[a]
                da = ddot(raj, rai) + ddot(iaj, iai)
                ezs = ezs.at[site].add((w * jz[a]) * da)
                if site == 0:
                    nr = nr + w * da  # sum over site-0 levels IS sum|psi|^2
                if a + 1 < d:
                    rbj, rbi, ibj, ibi = lev[a + 1]
                    cx = 2.0 * float(jx[a, a + 1])
                    cy = 2.0 * float(jyc[a, a + 1])
                    # conj(psi_a) psi_b: Re = ra rb + ia ib, Im = ra ib - ia rb
                    exs = exs.at[site].add((w * cx) * (ddot(raj, rbi) + ddot(iaj, ibi)))
                    eys = eys.at[site].add((w * cy) * (ddot(raj, ibi) - ddot(iaj, rbi)))
        return (exs, eys, ezs, nr), None

    z0 = jnp.zeros((n_sites, T), jnp.float64)
    (exs, eys, ezs, nr), _ = jax.lax.scan(
        body, (z0, z0, z0, jnp.zeros((T,), jnp.float64)), jnp.arange(P)
    )
    return jnp.stack([exs, eys, ezs], axis=1), nr  # (n_sites, 3, T), (T,)


@partial(
    jax.jit,
    static_argnames=("n_sq", "degree", "log2_block", "panel"),
)
def _ext_expm_program(
    Are,
    Aim,
    p_re_limbs,
    p_im_limbs,
    coeffs,
    n_sq: int,
    degree: int,
    log2_block: int,
    panel: int,
):
    """ONE device program: (seed states, U^block limbs) from pre-split limbs.

    Inputs are canonical int8 ext stacks: Are/Aim = limbs of -i H dt / 2^n_sq
    (imag/real planes), p_*_limbs = limbs of psi0.  The split itself happens
    in the callers via ``ext_split_upload`` so the fused and chunked paths
    share bit-identical operands (and the f32 triple-split fast upload).

    Pipeline (everything in the exact limb domain — the STATE TOO):
      U = I + Horner(exp(A) - I)                  # panel-wise, exact
      U = U^(2^n_sq)                              # fori of exact squarings
      doubling pass (fori, padded limb-state buffer):
        S[:, :, 2^k:2^{k+1}] = U^(2^k) @ S[:, :, :2^k];  U <- U @ U
    Returns (S_re, S_im, B_re, B_im): (L, dim, block) seed-state limb stacks
    and B = U^block full-L stacks.  States never touch f64.

    Fusing the chain into one dispatch matters twice on this backend: each
    extra program costs seconds of relay round-trip latency through the TPU
    tunnel, and XLA's buffer liveness lets the squaring fori alias its carry
    (the round-1 per-product dispatch loop had to sync after every product to
    avoid queued transients OOMing at dim 8192).
    """
    from ..ops.extprec import (
        ext_add_identity,
        ext_cmatmul,
        ext_taylor_horner,
    )

    D_re, D_im = ext_taylor_horner(Are, Aim, coeffs, degree)
    U_re = ext_add_identity(D_re)
    U_im = D_im

    def sq_full(_, UU):
        ur, ui = UU
        return ext_cmatmul(ur, ui, ur, ui, panel=panel)

    if n_sq > 0:
        U_re, U_im = jax.lax.fori_loop(0, n_sq, sq_full, (U_re, U_im))

    block = 1 << log2_block
    dim = Are.shape[1]
    L = Are.shape[0]
    S_re = jnp.zeros((L, dim, block), jnp.int8).at[:, :, 0].set(p_re_limbs)
    S_im = jnp.zeros((L, dim, block), jnp.int8).at[:, :, 0].set(p_im_limbs)

    shift = _dbl_shift_matrices(0, max(log2_block, 1), block)

    def dbl(k, carry):
        S_re, S_im, B_re, B_im = carry
        # apply U^(2^k) to the WHOLE padded buffer (dead columns are zero)
        # and add the product columns [0, 2^k) into [2^k, 2^(k+1)) through
        # the 0/1 shift matrix — exact, and ~4 orders of magnitude faster
        # than a traced-shift roll on the lane axis (see _shift_cols)
        n_re, n_im = ext_cmatmul(B_re, B_im, S_re, S_im, panel=min(panel, block))
        Pk = jax.lax.dynamic_index_in_dim(shift, k, axis=0, keepdims=False)
        S_re = S_re + _shift_cols(n_re, Pk)
        S_im = S_im + _shift_cols(n_im, Pk)
        B_re, B_im = ext_cmatmul(B_re, B_im, B_re, B_im, panel=panel)
        return S_re, S_im, B_re, B_im

    if log2_block > 0:
        S_re, S_im, U_re, U_im = jax.lax.fori_loop(
            0, log2_block, dbl, (S_re, S_im, U_re, U_im)
        )
    return S_re, S_im, U_re, U_im


# --- chunked-dispatch variants of the fused program -----------------------
#
# One fused dispatch is ideal below ~dim 4096, but at dim 8192 the full chain
# is ~30 heavy ext matmuls (~35 s each on a v5e chip): a single >10 min
# device program gets killed by the TPU tunnel (reproducible UNAVAILABLE
# device fault; isolated sub-programs up to ~4 min all pass).  The chain
# below is the SAME math in the SAME order, split into dispatches of at most
# a few heavy matmuls each, with a host sync between dispatches (the sync
# also keeps queued transients from OOMing, see the round-1 note above).
# Results are bit-identical to the fused program.

_EXT_CHUNK_DIM = 4096  # use chunked dispatches at/above this dim
# Chunk sizes trade dispatch overhead (~5-7 s of relay round-trip + cache
# lookup per dispatch on the tunnel) against the tunnel's kill threshold for
# long device programs (several minutes).  int8 matmuls run ~2.6 s each at
# dim 8192.  Round 4 set both chunk sizes to 1: per-dispatch cost is the
# same warm (~2.1-2.6 s fetch-synced either way), but n=1 means the WHOLE
# chain uses exactly one horner executable and one squaring executable
# (shared with the doubling pass) — and the first dispatch of each cached
# program costs 40-260 s of executable load on this backend
# (docs/ROUND4.md), so fewer distinct programs + the concurrent prefetch
# below is what the N=12 wall is made of.
_EXT_HORNER_CHUNK = 1  # Horner iterations per dispatch
_EXT_SQ_CHUNK = 1  # squarings per dispatch (same executable as doubling's)
# (doubling runs as per-pass seed-step + single-squaring dispatches — see
# _ext_dbl_seed_step for why a combined per-pass loop body is pathological)
_EXT_ADV_CHUNK = 64  # advance blocks per dispatch (cheap; bounded anyway)


def _spectral_norm_host(Hd: np.ndarray, iters: int = 40, seed: int = 0) -> float:
    """||H||_2 estimate by power iteration in native host f64 (numpy).

    For the large-dim ext path the dense matrix is already on the host; a few
    dozen f64 matvecs here are cheaper than a device dispatch round-trip
    through the tunnel.  Inflated 5% like the other estimates."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(Hd.shape[0]) + 1j * rng.standard_normal(Hd.shape[0])
    v /= np.linalg.norm(v)
    nrm = 0.0
    for _ in range(iters):
        w = Hd @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            return 0.0
        v = w / nrm
    return float(nrm) * 1.05


@partial(jax.jit, static_argnames=("n_it", "panel"), donate_argnums=(2, 3))
def _ext_horner_chunk(are, aim, d_re, d_im, coeffs, k0, n_it: int, panel: int):
    """`n_it` Horner iterations D <- A + (A @ D)/k, k = k0, k0-1, ...

    Column panels of D are independent through the whole recursion
    ((A @ D)[:, :, p] reads only D[:, :, p]), so each panel runs its n_it
    iterations in place inside a panel scan: peak memory is A + D + one
    panel workspace, same as the fused program.
    """
    from ..ops.extprec import (
        _ext_cpanel_product,
        _ext_scalar_mul_traced,
        ext_add,
    )

    L, M, N = are.shape
    panel = min(panel, N)
    n_panels = N // panel
    asum = are + aim  # Karatsuba A-sum, hoisted out of the panel scan

    def panel_body(carry, p):
        c_re, c_im = carry
        dp_re = jax.lax.dynamic_slice_in_dim(c_re, p * panel, panel, axis=2)
        dp_im = jax.lax.dynamic_slice_in_dim(c_im, p * panel, panel, axis=2)
        ap_re = jax.lax.dynamic_slice_in_dim(are, p * panel, panel, axis=2)
        ap_im = jax.lax.dynamic_slice_in_dim(aim, p * panel, panel, axis=2)

        def body(i, dd):
            dr, di = dd
            pr, pi = _ext_cpanel_product(are, aim, dr, di, L, asum=asum)
            cl = coeffs[k0 - i]
            pr = _ext_scalar_mul_traced(pr, cl)
            pi = _ext_scalar_mul_traced(pi, cl)
            return ext_add(ap_re, pr), ext_add(ap_im, pi)

        dp_re, dp_im = jax.lax.fori_loop(0, n_it, body, (dp_re, dp_im))
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, dp_re, p * panel, axis=2)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, dp_im, p * panel, axis=2)
        return (c_re, c_im), None

    (d_re, d_im), _ = jax.lax.scan(panel_body, (d_re, d_im), jnp.arange(n_panels))
    return d_re, d_im


@partial(jax.jit, static_argnames=("n", "panel"), donate_argnums=(0, 1))
def _ext_square_chunk(U_re, U_im, n: int, panel: int):
    from ..ops.extprec import ext_cmatmul

    def body(_, UU):
        ur, ui = UU
        return ext_cmatmul(ur, ui, ur, ui, panel=panel)

    return jax.lax.fori_loop(0, n, body, (U_re, U_im))


@partial(jax.jit, static_argnames=("panel",), donate_argnums=(2, 3))
def _ext_chain_step(are, aim, d_re, d_im, cl, unit, add_a, panel: int):
    """ONE executable for every square-matrix step of the ext chain.

    Computes, per column panel p of D (exact limb ops throughout):

        P   = A @ D[:, :, p]                    (diagonal pyramid + carry)
        P'  = P                 if unit > 0     (squaring: D is a copy of A)
              P * cl            otherwise       (Horner: cl = limbs of 1/k)
        OUT = P' + add_a * A[:, :, p]           (A-panel add for Horner)

    ``cl``/``unit``/``add_a`` are DATA, so one cached executable serves both
    the degree-10 Horner recursion and all scaling/doubling squarings —
    on this backend each DISTINCT program pays 40-110 s of executable load
    at its first dispatch per process (cache hit or not, docs/ROUND4.md),
    so the chain's program count is the wall.  Values are bit-identical to
    the separate `_ext_horner_chunk` / `_ext_square_chunk` programs (same
    panel product, same carry cascades, tested).
    """
    from ..ops.extprec import (
        _ext_cpanel_product,
        _ext_scalar_mul_traced,
        ext_add,
    )

    L, M, N = are.shape
    panel = min(panel, N)
    n_panels = N // panel
    asum = are + aim  # Karatsuba A-sum, hoisted out of the panel scan

    def panel_body(carry, p):
        c_re, c_im = carry
        dp_re = jax.lax.dynamic_slice_in_dim(c_re, p * panel, panel, axis=2)
        dp_im = jax.lax.dynamic_slice_in_dim(c_im, p * panel, panel, axis=2)
        ap_re = jax.lax.dynamic_slice_in_dim(are, p * panel, panel, axis=2)
        ap_im = jax.lax.dynamic_slice_in_dim(aim, p * panel, panel, axis=2)
        pr, pi = _ext_cpanel_product(are, aim, dp_re, dp_im, L, asum=asum)
        pr, pi = jax.lax.cond(
            unit > 0.0,
            lambda o: o,
            lambda o: (
                _ext_scalar_mul_traced(o[0], cl),
                _ext_scalar_mul_traced(o[1], cl),
            ),
            (pr, pi),
        )
        # A-panel add behind a cond, NOT a mask-multiply: ext_add re-runs the
        # carry cascade, which re-rounds +16 ties — value-equal but not
        # bit-identical, and the limb layout feeds the >=L truncation.  The
        # cond branch keeps the squaring path's output the raw panel product,
        # bit-for-bit what ext_cmatmul returns.
        pr, pi = jax.lax.cond(
            add_a > 0.0,
            lambda o: (ext_add(ap_re, o[0]), ext_add(ap_im, o[1])),
            lambda o: o,
            (pr, pi),
        )
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, pr, p * panel, axis=2)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, pi, p * panel, axis=2)
        return (c_re, c_im), None

    (d_re, d_im), _ = jax.lax.scan(panel_body, (d_re, d_im), jnp.arange(n_panels))
    return d_re, d_im


def _dbl_shift_matrices(k0: int, n: int, block: int) -> jnp.ndarray:
    """(n, block, block) int8 constants: row c of matrix i is e_{c + 2^(k0+i)}
    for c < 2^(k0+i), else zero — right-multiplying a (.., block) panel by
    matrix i copies columns [0, w) to [w, 2w) and zeroes everything else."""
    P = np.zeros((n, block, block), np.int8)
    for i in range(n):
        w = 1 << (k0 + i)
        if w < block:
            P[i, np.arange(w), np.arange(w) + w] = 1
    return jnp.asarray(P)


def _shift_cols(p: jnp.ndarray, Pk: jnp.ndarray) -> jnp.ndarray:
    """Exact column relocation of an int8 limb stack via an int8 0/1 matrix
    on the MXU.  A traced-shift jnp.roll on the lane axis lowers to a gather
    measured at ~10 s per (L, 8192, 512) plane; this matmul is ~0.5 ms."""
    return jnp.einsum(
        "lmk,kn->lmn", p, Pk, preferred_element_type=jnp.int32
    ).astype(jnp.int8)


@partial(jax.jit, static_argnames=("panel",), donate_argnums=(2, 3))
def _ext_dbl_seed_step(B_re, B_im, S_re, S_im, P, panel: int):
    """One seed-extension step of the doubling chain: S += shift(B @ S, P).

    P is the (block, block) 0/1 shift matrix for the pass width w (column c
    -> c + w for c < w, everything else zeroed), so the add lands the
    product's live columns in S's zero region — exact.  ONE program reused
    for every pass (P is data, not a static).  The separate B-squaring
    dispatch reuses the proven-fast `_ext_square_chunk` shape: a combined
    per-pass body (B@S + shift + B@B in one fori) was measured at 18-48 s
    per pass against ~4.3 s for its parts dispatched separately — XLA's
    schedule for the combined loop is pathological on this backend, and
    splitting it is both faster and gives the chain exactly two compact
    executables.
    """
    from ..ops.extprec import ext_cmatmul

    block = S_re.shape[2]
    p_re, p_im = ext_cmatmul(B_re, B_im, S_re, S_im, panel=min(panel, block))
    return S_re + _shift_cols(p_re, P), S_im + _shift_cols(p_im, P)


def _ext_site_obs_fused(S_re, S_im, dims):
    """All-spin-1/2 fast path of `_ext_site_obs`: the Pallas fused limb-pair
    kernel (ops/pallas_kernels.py::ext_obs_diagonals_int8) streams each limb
    plane through VMEM once per pair, then the f64 weighted combine across
    the significance diagonals runs here in XLA.  Same contract and values
    as `_ext_site_obs` (all local dims must be 2)."""
    from ..ops.pallas_kernels import ext_obs_diagonals_int8

    jj, ii, _ = _EXT_PAIRS
    n = len(dims)
    T = S_re.shape[-1]
    interpret = jax.default_backend() not in ("tpu", "axon")
    diag = ext_obs_diagonals_int8(
        S_re, S_im, jnp.asarray(jj), jnp.asarray(ii),
        n_diag=_EXT_OBS_Q, interpret=interpret,
    )
    w = jnp.exp2(-5.0 * jnp.arange(_EXT_OBS_Q, dtype=jnp.float64))
    rows = jnp.einsum("s,srt->rt", w, diag.astype(jnp.float64))
    xyz = rows[: 3 * n].reshape(n, 3, T)
    # spin-1/2 scale factors: x/y carry 2*J_{x,y}[0,1] = 1, z carries the
    # +-1/2 eigenvalue (the kernel sums +-1 signs)
    xyz = xyz * jnp.asarray([1.0, 1.0, 0.5])[None, :, None]
    return xyz, rows[3 * n]


@partial(jax.jit, static_argnames=("n_blocks", "dims", "idx_rare", "fused_obs"))
def _ext_advance_scan(
    B_re, B_im, S_re, S_im, sea_mask, e0, n_blocks: int, dims, idx_rare: int,
    fused_obs: bool = False,
):
    """The whole block-advance trace loop as ONE device program.

    B and S are (L, dim, dim) / (L, dim, block) int8 limb stacks: the state
    is carried in the exact limb domain across blocks, observables come out
    of `_ext_site_obs` (int8 MXU dots), and the advance itself is one
    `ext_cmatmul` per block — NO f64 state materialization anywhere, which
    was the dominant advance cost (the per-block f64 state split plus
    emulated-f64 einsum observables ran ~4 s/block at dim 8192).

    The round-1 per-block host dispatch loop spent ~4 s/block in relay
    round-trips; a lax.scan with the limb stacks as carried-in ARGUMENTS
    (never closure constants) makes each chunk one dispatch.
    """
    from ..ops.extprec import ext_cmatmul

    T = S_re.shape[-1]

    def body(S, _):
        S_re, S_im = S
        if fused_obs:
            xyz, norm2 = _ext_site_obs_fused(S_re, S_im, dims)
        else:
            xyz, norm2 = _ext_site_obs(S_re, S_im, dims)
        norms = jnp.sqrt(norm2)
        sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
        rare = xyz[idx_rare]
        rows = jnp.stack(
            [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms,
             jnp.full(norms.shape, e0)]
        )
        n_re, n_im = ext_cmatmul(B_re, B_im, S_re, S_im, panel=T)
        return (n_re, n_im), rows

    (S_re, S_im), rows = jax.lax.scan(body, (S_re, S_im), None, length=n_blocks)
    return rows.reshape(-1), S_re, S_im  # rows flat for the tunnel


@partial(jax.jit, static_argnames=("n_blocks",))
def _ext_advance_collect(B_re, B_im, S_re, S_im, n_blocks: int):
    """Advance `n_blocks` blocks, STACKING each pre-advance limb state.

    Matmuls only — no Pallas call inside, so this program rides the
    persistent compilation cache across processes (the combined
    pallas-in-scan advance program recompiled ~13 min in every fresh
    process; pure-XLA programs and the standalone obs kernel both cache
    reliably).  Returns ((n_blocks, L, dim, block) stacks, advanced state).
    """
    from ..ops.extprec import ext_cmatmul

    T = S_re.shape[-1]

    def body(S, _):
        S_re, S_im = S
        n_re, n_im = ext_cmatmul(B_re, B_im, S_re, S_im, panel=T)
        return (n_re, n_im), (S_re, S_im)

    (S_re, S_im), (st_re, st_im) = jax.lax.scan(
        body, (S_re, S_im), None, length=n_blocks
    )
    return st_re, st_im, S_re, S_im


@partial(jax.jit, static_argnames=("dims", "idx_rare"))
def _ext_rows_fused(st_re, st_im, sea_mask, e0, dims, idx_rare: int):
    """Observable rows for a STACK of limb-state blocks via the fused Pallas
    kernel: (n_blocks, L, dim, block) -> flat rows (n_blocks * 8 * block,)."""
    nb, L, dim, blk = st_re.shape
    S2_re = jnp.moveaxis(st_re, 0, 2).reshape(L, dim, nb * blk)
    S2_im = jnp.moveaxis(st_im, 0, 2).reshape(L, dim, nb * blk)
    xyz, norm2 = _ext_site_obs_fused(S2_re, S2_im, dims)
    norms = jnp.sqrt(norm2)
    sea = jnp.einsum("j,jot->ot", sea_mask, xyz)
    rare = xyz[idx_rare]
    rows = jnp.stack(
        [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms,
         jnp.full(norms.shape, e0)]
    )  # (8, nb * blk) in chronological column order
    return rows.reshape(8, nb, blk).transpose(1, 0, 2).reshape(-1)


_PREFETCHED_SIGS: set = set()


def _prefetch_ext_executables(
    dim: int, block: int, pan: int, adv_chunk: int,
    dims: tuple, idx_rare: int, fused_obs: bool, n_sea_effective: int,
) -> list:
    """Load every chunked-chain executable CONCURRENTLY on garbage inputs.

    On this backend the first dispatch of each (persistently cached!)
    program blocks the calling thread 40-260 s while the executable
    deserializes/ships to the device — and AOT ``.lower().compile()`` does
    NOT warm the normal call path (measured: compile 6 s, first call still
    189 s).  The loads DO overlap when issued from separate threads
    (measured: 5 programs in ~42 s vs ~211 s serial), so this fires one
    thread per chain program on freshly allocated zero inputs at the REAL
    shapes/static-args.  With the n=1 chunk sizes the garbage compute is
    ~8 s total.  The caller does not join: the chain's real first call of
    each program blocks on jit's per-signature lock until its load is done.

    Executable loads are per-program per-PROCESS: a second solve at the same
    shapes has nothing left to load, so repeat calls with an already-seen
    signature return no threads (skipping ~8 s of garbage compute and ~4 GB
    of zero-buffer churn per extra evolution in a sweep).

    Returns the threads (join for deterministic teardown in tests).
    """
    import os as _os
    import threading
    import time as _time

    from ..ops.extprec import EXT_LIMBS as _L
    from ..ops.extprec import taylor_coeff_limbs

    sig = (dim, block, pan, adv_chunk, tuple(dims), idx_rare, fused_obs,
           n_sea_effective)
    if sig in _PREFETCHED_SIGS:
        return []
    _PREFETCHED_SIGS.add(sig)

    def _sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    # shared READ-ONLY stand-in for A/B operands (never donated as such)
    Z_re = jnp.zeros((_L, dim, dim), jnp.int8)
    Z_im = jnp.zeros((_L, dim, dim), jnp.int8)
    coeffs = jnp.asarray(taylor_coeff_limbs(_EXT_DEGREE))
    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )
    oneprog = _os.environ.get("QST_EXT_ONEPROG", "1") == "1"
    # optional stagger: delay the LATER-needed programs' loads so the
    # chain-step load (the only one on the critical path: the real chain's
    # first dispatch blocks on it within seconds) gets the shipping channel
    # to itself first.  0 = all concurrent (measured near-perfect overlap on
    # a healthy tunnel; stagger is the degraded-tunnel insurance).
    stagger = float(_os.environ.get("QST_EXT_PREFETCH_STAGGER_S", "0") or "0")

    def t_chain():
        d_re = jnp.zeros((_L, dim, dim), jnp.int8)  # donated
        d_im = jnp.zeros((_L, dim, dim), jnp.int8)
        _sync(_ext_chain_step(
            Z_re, Z_im, d_re, d_im, coeffs[0], 0.0, 1.0, pan,
        ))

    def t_horner():
        d_re = jnp.zeros((_L, dim, dim), jnp.int8)  # donated
        d_im = jnp.zeros((_L, dim, dim), jnp.int8)
        _sync(_ext_horner_chunk(
            Z_re, Z_im, d_re, d_im, coeffs, jnp.asarray(_EXT_DEGREE),
            _EXT_HORNER_CHUNK, pan,
        ))

    def t_square():
        u_re = jnp.zeros((_L, dim, dim), jnp.int8)  # donated
        u_im = jnp.zeros((_L, dim, dim), jnp.int8)
        _sync(_ext_square_chunk(u_re, u_im, _EXT_SQ_CHUNK, pan))

    def t_dbl():
        s_re = jnp.zeros((_L, dim, block), jnp.int8)  # donated
        s_im = jnp.zeros((_L, dim, block), jnp.int8)
        P0 = _dbl_shift_matrices(0, 1, block)[0]
        _sync(_ext_dbl_seed_step(Z_re, Z_im, s_re, s_im, P0, pan))

    def t_advance():
        s_re = jnp.zeros((_L, dim, block), jnp.int8)
        s_im = jnp.zeros((_L, dim, block), jnp.int8)
        if fused_obs:
            st_re, st_im, o_re, o_im = _ext_advance_collect(
                Z_re, Z_im, s_re, s_im, adv_chunk
            )
            del o_re, o_im
            _sync(_ext_rows_fused(
                st_re, st_im, sea_mask, jnp.asarray(0.0), dims, idx_rare
            ))
        else:
            _sync(_ext_advance_scan(
                Z_re, Z_im, s_re, s_im, sea_mask, jnp.asarray(0.0),
                adv_chunk, dims, idx_rare, fused_obs=False,
            ))

    def _delayed(fn):
        def run():
            _time.sleep(stagger)
            fn()

        run.__name__ = fn.__name__
        return run

    first = [t_chain] if oneprog else [t_horner, t_square]
    later = [t_dbl, t_advance]
    if stagger > 0.0:
        later = [_delayed(t) for t in later]
    threads = [
        threading.Thread(target=t, daemon=True, name=f"ext-prefetch-{t.__name__}")
        for t in first + later
    ]
    for th in threads:
        th.start()
    return threads


def _ext_preamble_chunked(
    A_planes: list, psi0, coeffs, n_sq: int, log2_block: int, pan: int,
    dim: int, block: int, _mark,
):
    """Chunked-dispatch preamble: the default at dim >= _EXT_CHUNK_DIM.

    Same math in the same order as ``_ext_expm_program``, split into
    bounded-duration device programs with a host sync after each.  The fused
    single program is the better shape on paper but reproducibly faults the
    TPU worker at dim 8192 (see the QST_EXT_FUSED branch in the caller).
    Bit-identical results (tested at small dims via monkeypatched
    _EXT_CHUNK_DIM).

    ``A_planes`` is a [Are, Aim] list the helper takes OWNERSHIP of (it is
    cleared on entry): the A limb stacks are ~4 GB at dim 8192 and must be
    freed the moment the Horner phase finishes — keeping them alive through
    the squaring/doubling phases raises peak HBM by that much on a 16 GB
    chip (the explicit free point predates the refactor into this helper).
    """
    import os as _os

    from ..ops.extprec import EXT_LIMBS as _L
    from ..ops.extprec import ext_add_identity, ext_split_upload

    Are, Aim = A_planes
    A_planes.clear()  # the locals here are now the only references

    # ONE-PROGRAM chain (default): every square-matrix step — the degree-10
    # Horner recursion, the scaling squarings, AND the doubling pass's
    # B-squarings — dispatches the SAME `_ext_chain_step` executable
    # (cl/unit/add_a are data).  On this backend each DISTINCT program pays
    # 40-260 s of executable load at its first dispatch in every fresh
    # process (docs/ROUND4.md), so collapsing horner+square into one program
    # removes a whole load from the prefetch set.  Bit-identical to the
    # split programs (tested via monkeypatched _EXT_CHUNK_DIM).
    oneprog = _os.environ.get("QST_EXT_ONEPROG", "1") == "1"

    def _square(u_re, u_im):
        if not oneprog:
            return _ext_square_chunk(u_re, u_im, 1, pan)
        # chain_step donates (2, 3) and needs both operands live: square
        # into a fresh copy (the copy program already exists in the chain
        # for the Horner init).  unit=1.0 -> raw U@U panel product.
        c_re, c_im = jnp.copy(u_re), jnp.copy(u_im)
        return _ext_chain_step(u_re, u_im, c_re, c_im, coeffs[0], 1.0, 0.0, pan)

    # Horner init: D = A.  Fresh copies — the D buffers are donated
    # through the chunk calls while the A stacks stay live.
    D_re, D_im = jnp.copy(Are), jnp.copy(Aim)
    k = _EXT_DEGREE
    while k > 1:
        if oneprog:
            D_re, D_im = _ext_chain_step(
                Are, Aim, D_re, D_im, coeffs[k], 0.0, 1.0, pan
            )
            n_it = 1
        else:
            n_it = min(_EXT_HORNER_CHUNK, k - 1)
            # donated d buffers; A stacks passed fresh each call
            D_re, D_im = _ext_horner_chunk(
                Are, Aim, D_re, D_im, coeffs, jnp.asarray(k), n_it, pan
            )
        jax.block_until_ready(D_re)
        k -= n_it
    del Are, Aim  # free ~4 GB before the squaring/doubling phases allocate
    _mark(f"horner({_EXT_DEGREE - 1} matmuls)", sync=D_re[0, 0, :1])
    U_re = ext_add_identity(D_re)
    U_im = D_im
    del D_re, D_im
    remaining = n_sq
    while remaining > 0:
        if oneprog:
            U_re, U_im = _square(U_re, U_im)
            n = 1
        else:
            n = min(_EXT_SQ_CHUNK, remaining)
            U_re, U_im = _ext_square_chunk(U_re, U_im, n, pan)
        jax.block_until_ready(U_re)
        remaining -= n
    _mark(f"squarings({n_sq} matmuls)", sync=U_re[0, 0, :1])
    B_re, B_im = U_re, U_im  # full-L step-power stacks; B = U from here

    S_re = jnp.zeros((_L, dim, block), jnp.int8).at[:, :, 0].set(
        ext_split_upload(np.ascontiguousarray(psi0.real))
    )
    S_im = jnp.zeros((_L, dim, block), jnp.int8).at[:, :, 0].set(
        ext_split_upload(np.ascontiguousarray(psi0.imag))
    )
    # alternate the two proven-fast program shapes per pass; dependencies
    # chain through the dispatch queue, one sync at the end
    shifts = np.asarray(_dbl_shift_matrices(0, max(log2_block, 1), block))
    for k in range(log2_block):
        S_re, S_im = _ext_dbl_seed_step(
            B_re, B_im, S_re, S_im, jnp.asarray(shifts[k]), pan
        )
        B_re, B_im = _square(B_re, B_im)
    jax.block_until_ready(S_re)
    _mark(f"doubling({log2_block} passes)", sync=S_re[0, 0, :1])
    return S_re, S_im, B_re, B_im


def expm_traces_assembled_ext(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    block: int = 512,
    panel: int = 512,
    ckpt_dir: str | None = None,
    ckpt_every_blocks: int = 4,
    fused_obs: bool | None = None,
) -> np.ndarray:
    """Assembled rows (8, T) via the ext (parity-grade) step operator.

    Three device dispatches total: the norm power iteration, the fused
    seed/step-operator program, and the advance scan.

    With ``ckpt_dir`` set, the advance phase snapshots its exact int8 limb
    state + computed rows every ``ckpt_every_blocks`` blocks
    (dynamics/checkpoint.py) and a rerun with the same arguments resumes
    bit-identically mid-advance — the step-operator build is deterministic
    and is simply redone.  This covers the multi-minute N=12+ runs on a
    backend that can kill long sessions (docs/ROUND2.md).
    """
    from ..ops.extprec import taylor_coeff_limbs
    from .krylov import spectral_norm_estimate_dense

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
    block = min(block, T)
    block = 1 << (block.bit_length() - 1)  # power of two for the doubling pass
    n_blocks = int(np.ceil(T / block))

    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )

    import os as _os
    import time as _time

    _timing_lvl = int(_os.environ.get("QST_EXT_TIMING", "0") or "0")
    _timing = _timing_lvl >= 1
    _t0 = _time.perf_counter()

    def _mark(label, sync=None):
        """Print a phase wall.  At QST_EXT_TIMING=2 and with ``sync`` given,
        fetch one element first: block_until_ready returns at dispatch
        ACCEPTANCE on this backend, so only a value fetch times real
        completion (docs/ROUND3.md)."""
        nonlocal _t0
        if not _timing:
            return
        if _timing_lvl >= 2 and sync is not None:
            np.asarray(jax.device_get(sync))
        now = _time.perf_counter()
        print(f"[ext-timing] {label}: {now - _t0:.1f}s", flush=True)
        _t0 = now

    # advance-phase config, needed early for the executable prefetch
    if fused_obs is None:
        fused_obs = all(d == 2 for d in dims) and block % 128 == 0
    elif fused_obs and not (all(d == 2 for d in dims) and block % 128 == 0):
        raise ValueError(
            "fused_obs=True needs all-spin-1/2 dims and block % 128 == 0"
        )
    adv_chunk = min(_EXT_ADV_CHUNK, n_blocks)
    if ckpt_dir:
        adv_chunk = min(adv_chunk, max(1, ckpt_every_blocks))

    pan = min(panel, dim)
    prefetch_threads = []
    if dim >= _EXT_CHUNK_DIM and _os.environ.get("QST_EXT_PREFETCH", "1") == "1":
        prefetch_threads = _prefetch_ext_executables(
            dim, block, pan, adv_chunk, dims, idx_rare, fused_obs,
            n_sea_effective,
        )
        _mark("prefetch launched (loads overlap the host phase + chain)")

    if dim >= _EXT_CHUNK_DIM:
        # Sparse host assembly: the dipolar H is ~1% dense, so the COO
        # triplet (to_coo, bit-identical values to to_dense) feeds e0, the
        # norm estimate, AND the device upload without the dim^2 buffer.
        import scipy.sparse as _sparse

        coo_r, coo_c, coo_v = H.to_coo()
        Hs = _sparse.csr_matrix(
            (coo_v, (coo_r, coo_c)), shape=(dim, dim)
        )
        _mark("to_coo(host)")
        e0 = jnp.asarray(float(np.real(np.vdot(psi0, Hs @ psi0))))
        _mark("e0(host)")
        # host power iteration: native matvecs beat shipping the dense
        # planes to the chip and paying a dispatch round-trip (~50 s
        # observed for the device estimate at dim 8192 vs ~8 s here); csr
        # matvecs make it ~100x cheaper again
        norm = min(spectral_norm_bound(H), _spectral_norm_host(Hs))
    else:
        Hd = H.to_dense()
        _mark("to_dense(host)")
        e0 = jnp.asarray(float(np.real(np.vdot(psi0, Hd @ psi0))))
        _mark("e0(host)")
        norm = min(spectral_norm_bound(H), spectral_norm_estimate_dense(Hd))
    _mark("spectral norm")
    x = norm * abs(dt)
    n_sq = max(0, int(np.ceil(np.log2(max(x, 1e-30) / _EXT_THETA))))
    dt_s = dt / (2**n_sq)

    coeffs = jnp.asarray(taylor_coeff_limbs(_EXT_DEGREE))
    log2_block = int(np.log2(block))

    from ..ops.extprec import ext_split_upload

    if dim < _EXT_CHUNK_DIM:
        S_re, S_im, B_re, B_im = _ext_expm_program(
            ext_split_upload(Hd.imag * dt_s),
            ext_split_upload(-Hd.real * dt_s),
            ext_split_upload(np.ascontiguousarray(psi0.real)),
            ext_split_upload(np.ascontiguousarray(psi0.imag)),
            coeffs,
            n_sq=n_sq,
            degree=_EXT_DEGREE,
            log2_block=log2_block,
            panel=pan,
        )
        del Hd
        jax.block_until_ready(S_re)
        _mark("fused program")
    else:
        # Limb split via the COO fast path: host f32 triple-split of the
        # nnz-sized value arrays, one packed ~tens-of-MB upload, dense f32
        # planes rebuilt by scatter on device, native-f32 limb extraction
        # (ops/extprec.py::ext_split_upload_coo_pair).  Replaces the dense
        # 1.6 GB plane upload (163 s observed on a degraded tunnel) and the
        # older ~2L-pass host f64 split (docs/ROUND2.md handoff item 3).
        from ..ops.extprec import (
            ext_split_upload_coo_pair,
            ext_split_upload_coo_pair_host,
        )

        hostlimb = _os.environ.get("QST_EXT_HOSTLIMB", "1") == "1"
        if hostlimb:
            # host canonical split + trivial scatter program: the device f32
            # extraction executable is the slowest LOAD of the chain
            # (134-258 s at first dispatch, every fresh process)
            Are, Aim = ext_split_upload_coo_pair_host(
                coo_r, coo_c, coo_v.imag * dt_s, -coo_v.real * dt_s, dim
            )
            jax.block_until_ready(Aim)
            _mark("split(host-limb)+scatter", sync=Aim[0, 0, :1])
        else:
            Are, Aim = ext_split_upload_coo_pair(
                coo_r, coo_c, coo_v.imag * dt_s, -coo_v.real * dt_s, dim
            )
            jax.block_until_ready(Aim)
            _mark("split(coo-f32-triple)+upload", sync=Aim[0, 0, :1])
        if _os.environ.get("QST_EXT_FUSED") == "1":
            # ONE device program for the whole horner/squaring/doubling
            # preamble.  In principle the right shape — the fetch-synced
            # marginal B@B is 2.56 s, so the ~34-matmul chain is ~90 s of
            # device time, one executable load, no inter-phase queue
            # drains — but at dim 8192 the compiled program REPRODUCIBLY
            # faults the TPU worker at runtime ("UNAVAILABLE: TPU device
            # error", 2 of 2 attempts, 2026-08-17), the same class of fault
            # that forced the chunked split originally.  Kept opt-in for
            # re-testing on other backends/runtimes.
            S_re, S_im, B_re, B_im = _ext_expm_program(
                Are, Aim,
                ext_split_upload(np.ascontiguousarray(psi0.real)),
                ext_split_upload(np.ascontiguousarray(psi0.imag)),
                coeffs,
                n_sq=n_sq,
                degree=_EXT_DEGREE,
                log2_block=log2_block,
                panel=pan,
            )
            del Are, Aim
            jax.block_until_ready(S_re)
            _mark(f"fused preamble ({_EXT_DEGREE - 1}+{n_sq}+{log2_block} matmuls)", sync=S_re[0, 0, :1])
        else:
            A_planes = [Are, Aim]
            del Are, Aim  # ownership moves to the helper (freed post-Horner)
            S_re, S_im, B_re, B_im = _ext_preamble_chunked(
                A_planes, psi0, coeffs, n_sq, log2_block, pan, dim, block,
                _mark,
            )
        if _os.environ.get("QST_EXT_CANON") == "1":
            canon = jax.jit(lambda x: x.reshape(-1).reshape(x.shape))
            B_re, B_im = canon(B_re), canon(B_im)
            S_re, S_im = canon(S_re), canon(S_im)
            jax.block_until_ready(S_im)
            _mark("canonicalize layouts (experiment)")

    # advance in bounded chunks of blocks; the padded tail blocks (if any)
    # are computed and dropped — one compiled shape, negligible extra work.
    # fused_obs (the Pallas observable kernel vs the jnp reduction) and
    # adv_chunk (dispatch bound = snapshot cadence) were resolved above,
    # before the executable prefetch.
    flats = []
    done = 0

    ckpt_fp = None
    if ckpt_dir:
        from .checkpoint import clear_ext_advance, load_ext_advance, save_ext_advance

        ckpt_fp = {
            "engine": "ext", "dim": dim, "T": T, "block": block,
            "n_blocks": n_blocks, "dt": dt, "e0": float(np.asarray(e0)),
            "adv_chunk": adv_chunk, "fused_obs": bool(fused_obs),
            # limb-split variant: both are exact, but canonical limb STATES
            # can differ on ties — a resume must not mix them
            "hostlimb": dim >= _EXT_CHUNK_DIM
            and _os.environ.get("QST_EXT_HOSTLIMB", "1") == "1",
        }
        res = load_ext_advance(ckpt_dir, ckpt_fp)
        if res is not None:
            done, flats, s_re_h, s_im_h = res
            L = S_re.shape[0]
            to_dev = jax.jit(lambda f: f.reshape((L, dim, block)))
            S_re = to_dev(jax.device_put(jnp.asarray(s_re_h)))
            S_im = to_dev(jax.device_put(jnp.asarray(s_im_h)))
            jax.block_until_ready(S_im)
            _mark(f"ckpt resume at block {done}/{n_blocks}")

    flatten = jax.jit(lambda x: x.reshape(-1))
    abort_after = int(_os.environ.get("QST_EXT_ABORT_AFTER_CHUNKS", "0"))
    chunks_run = 0

    # checkpoint saves run in a background thread: each save ships two
    # ~L*dim*block int8 planes through the tunnel (~126 MB, ~25 s at dim
    # 8192), while an advance chunk itself is ~1 s — a synchronous save
    # would spend most of the advance wall on crash insurance.  The thread
    # holds its own flattened device arrays (the main loop rebinding S_re
    # cannot invalidate them) and the NPZ write stays atomic (unique tmp +
    # rename), so a kill mid-save leaves the previous snapshot intact.
    # Saves are SERIALIZED latest-wins: saves take far longer than a chunk,
    # so overlapping threads would pile up transfers; if the previous save
    # is still in flight this snapshot is skipped (the next cadence point
    # carries strictly more progress anyway).
    import threading as _threading

    ckpt_state: dict = {"thread": None, "error": None}

    def _save_async(done_now, flats_now, fr, fi):
        prev = ckpt_state["thread"]
        if prev is not None and prev.is_alive():
            return  # latest-wins: skip while the previous save still ships

        def _run():
            try:
                save_ext_advance(
                    ckpt_dir, ckpt_fp, done_now, flats_now,
                    np.asarray(fr), np.asarray(fi),
                )
            except Exception as exc:  # surfaced at join, not swallowed
                ckpt_state["error"] = exc

        th = _threading.Thread(target=_run, daemon=True)
        th.start()
        ckpt_state["thread"] = th

    def _join_saves():
        th = ckpt_state["thread"]
        if th is not None:
            th.join()
        if ckpt_state["error"] is not None:
            import sys as _sys

            # a failed snapshot must not kill a succeeding solve: warn loudly
            print(
                "[ext-ckpt] WARNING: checkpoint save failed: "
                f"{ckpt_state['error']!r}",
                file=_sys.stderr, flush=True,
            )
            ckpt_state["error"] = None

    while done < n_blocks:
        if fused_obs:
            # two cache-friendly dispatches: the matmul-only collect scan and
            # the fused obs kernel over the stacked states (see
            # _ext_advance_collect's docstring for why they are split)
            st_re, st_im, S_re, S_im = _ext_advance_collect(
                B_re, B_im, S_re, S_im, adv_chunk
            )
            if _timing:
                jax.block_until_ready(st_im)
                _mark("  collect dispatch", sync=st_im[0, 0, 0, :1])
            flat = _ext_rows_fused(st_re, st_im, sea_mask, e0, dims, idx_rare)
            if _timing:
                jax.block_until_ready(flat)
                _mark("  rows dispatch", sync=flat[:1])
            del st_re, st_im
        else:
            flat, S_re, S_im = _ext_advance_scan(
                B_re, B_im, S_re, S_im, sea_mask, e0,
                adv_chunk, dims, idx_rare, fused_obs=False,
            )
        flats.append(np.asarray(flat))
        done += adv_chunk
        chunks_run += 1
        if _timing:
            _mark(f"advance chunk {chunks_run} (+{adv_chunk} blocks)")
        if ckpt_dir and done < n_blocks:
            _save_async(done, list(flats), flatten(S_re), flatten(S_im))
            if _timing:
                _mark("  ckpt save (async)")
            if abort_after and chunks_run >= abort_after:
                _join_saves()  # the abort hook tests resume: the snapshot
                # must be on disk before we raise
                raise RuntimeError(
                    f"aborted after {chunks_run} advance chunks "
                    "(QST_EXT_ABORT_AFTER_CHUNKS)"
                )
    if ckpt_dir:
        _join_saves()
        clear_ext_advance(ckpt_dir)
    _mark(f"advance({n_blocks} blocks)")
    arr = np.concatenate(flats).reshape(done, 8, block)[:n_blocks]
    return np.moveaxis(arr, 0, 1).reshape(8, -1)[:, :T]


def expm_propagate_traces(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    block: int = 128,
) -> dict[str, np.ndarray]:
    """Observable traces via the dense step operator (uniform grid required)."""
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("expm stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0

    block = min(block, T)
    n_blocks = int(np.ceil(T / block))
    U = build_step_operator(H, dt)
    xyzs, nrms = _propagate_blocks(U, Cplx.from_numpy(psi0), n_blocks, block, dims)
    # (n_blocks, n, 3, B) -> (n, 3, n_blocks * B), trimmed to T
    xyz = np.moveaxis(np.asarray(xyzs), 0, 2).reshape(
        xyzs[0].shape[0], 3, n_blocks * block
    )[..., :T]
    norm = np.asarray(nrms).reshape(-1)[:T]
    # energy: <H> at t=0 is conserved (unitary propagation of a
    # time-independent H); report the exact constant for diagnostics.
    p0 = Cplx.from_numpy(psi0)
    hp = H.apply(p0)
    e0 = float(np.asarray(jnp.sum(p0.re * hp.re + p0.im * hp.im)))
    return {"site_xyz": xyz, "norm": norm, "energy": np.full(T, e0)}
