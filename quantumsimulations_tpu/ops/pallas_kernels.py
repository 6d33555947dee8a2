"""Pallas TPU kernels for the (re, im)-pair compute path.

The hot dense op of this framework is the complex matmul behind trace
propagation (states = V @ amp) and the expm step operator.  Expressed in XLA
as four separate real dot_generals, every operand plane is read from HBM
twice.  The fused kernel here computes BOTH output planes in one pass over
the A/B tiles held in VMEM — halving HBM traffic for the bandwidth-bound
matvec-block shapes — with an accumulating K-grid so arbitrary contraction
sizes stream through VMEM.

Scope note: Mosaic has no f64, so Pallas kernels serve the f32 speed mode
(exploratory sweeps); the parity-grade f64 path runs through XLA's x64
rewriter.  On non-TPU backends the kernels run in interpreter mode, keeping
the test suite hardware-independent (SURVEY.md §4.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import Cplx


def _cmatmul_kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref):
    """One (TM, TN) output tile, accumulated over the K grid axis."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        cr_ref[:] = jnp.zeros_like(cr_ref)
        ci_ref[:] = jnp.zeros_like(ci_ref)

    a_r = ar_ref[:]
    a_i = ai_ref[:]
    b_r = br_ref[:]
    b_i = bi_ref[:]
    # HIGHEST precision: the v5e MXU multiplies bf16 natively and a default
    # dot truncates f32 inputs to ONE bf16 pass (~2e-3 error, measured);
    # HIGHEST selects the 3-pass decomposition (f32-grade, ~1e-6)
    dot = lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    cr_ref[:] += dot(a_r, b_r) - dot(a_i, b_i)
    ci_ref[:] += dot(a_r, b_i) + dot(a_i, b_r)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def cmatmul_f32(
    ar: jnp.ndarray,
    ai: jnp.ndarray,
    br: jnp.ndarray,
    bi: jnp.ndarray,
    tm: int = 128,
    tn: int = 128,
    tk: int = 512,
    interpret: bool = False,
):
    """Fused complex matmul on (re, im) f32 planes: returns (cr, ci).

    Inputs are zero-padded up to tile multiples; the pad region contributes
    zeros to the contraction so results are exact.
    """
    M, K = ar.shape
    K2, N = br.shape
    assert K == K2, (ar.shape, br.shape)
    Mp, Kp, Np = _round_up(M, tm), _round_up(K, tk), _round_up(N, tn)

    def pad(x, r, c):
        return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))

    ar_p, ai_p = pad(ar, Mp, Kp), pad(ai, Mp, Kp)
    br_p, bi_p = pad(br, Kp, Np), pad(bi, Kp, Np)

    grid = (Mp // tm, Np // tn, Kp // tk)
    a_spec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM)

    cr, ci = pl.pallas_call(
        _cmatmul_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        ),
        grid=grid,
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=(c_spec, c_spec),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * Kp,
            bytes_accessed=4 * (2 * Mp * Kp + 2 * Kp * Np + 2 * Mp * Np),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ar_p, ai_p, br_p, bi_p)
    return cr[:M, :N], ci[:M, :N]


def matmul_pallas(a: Cplx, b: Cplx, interpret: bool | None = None) -> Cplx:
    """Cplx matmul through the fused kernel (f32 planes).

    ``interpret`` defaults to True off-TPU so tests run anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    ar = a.re.astype(jnp.float32)
    ai = a.im.astype(jnp.float32)
    br = b.re.astype(jnp.float32)
    bi = b.im.astype(jnp.float32)
    cr, ci = cmatmul_f32(ar, ai, br, bi, interpret=interpret)
    return Cplx(cr, ci)


# ---------------------------------------------------------------------------
# Fused per-site z-expectation kernel: <Iz_j>(t) for every qubit at once.
# ---------------------------------------------------------------------------

def _zexp_kernel(p2_ref, signs_ref, out_ref):
    """out[j, t] = sum_d signs[j, d] * |psi|^2[d, t] — one MXU matmul."""
    out_ref[:] = jax.lax.dot_general(
        signs_ref[:], p2_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("interpret",))
def z_expectations_f32(
    psi_re: jnp.ndarray,  # (dim, T)
    psi_im: jnp.ndarray,
    signs: jnp.ndarray,  # (n_sites, dim): z eigenvalue of site j at basis index d
    interpret: bool = False,
):
    """All per-site <Sz>(t) traces fused as |psi|^2 -> one small matmul."""
    p2 = (psi_re * psi_re + psi_im * psi_im).astype(jnp.float32)
    dim, T = p2.shape
    n = signs.shape[0]
    Tp = _round_up(T, 128)
    np_pad = _round_up(n, 8)
    p2p = jnp.pad(p2, ((0, 0), (0, Tp - T)))
    sp = jnp.pad(signs.astype(jnp.float32), ((0, np_pad - n), (0, 0)))
    out = pl.pallas_call(
        _zexp_kernel,
        out_shape=jax.ShapeDtypeStruct((np_pad, Tp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p2p, sp)
    return out[:n, :T]


def z_sign_table(dims: tuple[int, ...]) -> np.ndarray:
    """signs[j, d] = <d| S_z^{(j)} |d> for every site j and basis index d."""
    from .embed import local_op

    n = len(dims)
    dim = int(np.prod(dims))
    out = np.zeros((n, dim))
    for j, d in enumerate(dims):
        z = np.real(np.diag(local_op(d, "z")))
        left = int(np.prod(dims[:j], dtype=np.int64)) if j else 1
        right = int(np.prod(dims[j + 1 :], dtype=np.int64)) if j + 1 < n else 1
        out[j] = np.tile(np.repeat(z, right), left)
    return out


# ---------------------------------------------------------------------------
# Fused int8 limb-pair observable kernel: per-site <Sx,Sy,Sz> + norm^2
# diagonal sums DIRECTLY from ext limb state stacks (ops/extprec.py), for
# all-spin-1/2 Hilbert spaces.
#
# The jnp form (dynamics/expm_propagator.py::_ext_site_obs) re-reads the
# (dim, T) limb planes from HBM for every (pair, site, level) reduction —
# ~30 GB of VPU traffic per 512-column block at dim 8192, measured ~5 s per
# block (2/3 of the whole N=12 trace wall).  This kernel streams each limb
# plane through VMEM ONCE per pair and computes every site reduction from
# the resident plane: traffic drops to P * 4 planes ~ 1 GB per block and the
# work becomes VPU-compute-bound (~0.1 s/block).
#
# Mosaic has no f64, so the kernel accumulates raw i32 sums per significance
# diagonal s = j + i (exact: |limbs| <= 33 canonical, so a diagonal's sum
# over dim rows and <= q pairs stays < 2^31 for dim <= 64k) and the f64
# weighted combine across the <= 11 diagonals runs outside in XLA.
# ---------------------------------------------------------------------------


def _ext_obs_kernel(n_sites: int, dim: int):
    """Kernel factory (n_sites, dim static).  Row layout of the out block:
    rows 3k/3k+1/3k+2 = site-k x/y/z raw sums, row 3*n_sites = norm^2."""

    def kernel(jj_ref, ii_ref, ar_ref, br_ref, ai_ref, bi_ref, out_ref):
        p = pl.program_id(1)

        # first pair of an s-diagonal group (pairs are ordered by s, j
        # ascending, so j == 0 opens the group) initializes the block
        @pl.when(jj_ref[p] == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        Rj = ar_ref[0].astype(jnp.int32)  # (dim, tt) limb planes
        Ri = br_ref[0].astype(jnp.int32)
        Ij = ai_ref[0].astype(jnp.int32)
        Ii = bi_ref[0].astype(jnp.int32)
        prod = Rj * Ri + Ij * Ii  # Re[conj(psi_j-limb) psi_i-limb] per row
        tt = prod.shape[-1]

        # NOTE: NO pltpu.roll anywhere — sublane dynamic_rotate of (dim, tt)
        # planes measured ~100x slower than the elementwise work.  All level
        # pairing is static reshape + slice on the leading (sublane) axes.

        nrow = 3 * n_sites
        # dtype pinned: with x64 enabled jnp.sum(int32) promotes to int64,
        # which Mosaic does not support
        out_ref[0, nrow : nrow + 1, :] += jnp.sum(
            prod, axis=0, keepdims=True, dtype=jnp.int32
        )
        for k in range(n_sites):
            shift = n_sites - 1 - k  # site-k stride: dr = 2^shift
            dl = dim >> (shift + 1)
            dr = 1 << shift
            pv = prod.reshape(dl, 2, dr, tt)
            # z: (level-0 sum) - (level-1 sum) per column; the 0.5 spin
            # factor is applied in the f64 combine outside
            zk = jnp.sum(pv[:, 0], axis=(0, 1), dtype=jnp.int32) - jnp.sum(
                pv[:, 1], axis=(0, 1), dtype=jnp.int32
            )
            out_ref[0, 3 * k + 2 : 3 * k + 3, :] += zk[None, :]
            # x/y: conj(psi_a) psi_b with b the level-1 partner row — static
            # slice views of the reshaped planes, products on half planes
            Rja = Rj.reshape(dl, 2, dr, tt)[:, 0]
            Ija = Ij.reshape(dl, 2, dr, tt)[:, 0]
            Rib = Ri.reshape(dl, 2, dr, tt)[:, 1]
            Iib = Ii.reshape(dl, 2, dr, tt)[:, 1]
            xk = jnp.sum(Rja * Rib + Ija * Iib, axis=(0, 1), dtype=jnp.int32)
            yk = jnp.sum(Rja * Iib - Ija * Rib, axis=(0, 1), dtype=jnp.int32)
            out_ref[0, 3 * k : 3 * k + 1, :] += xk[None, :]
            out_ref[0, 3 * k + 1 : 3 * k + 2, :] += yk[None, :]

    return kernel


@partial(jax.jit, static_argnames=("n_diag", "t_tile", "interpret"))
def ext_obs_diagonals_int8(
    S_re: jnp.ndarray,  # (L, dim, T) int8 canonical ext limbs
    S_im: jnp.ndarray,
    jj: jnp.ndarray,  # (P,) int32 left-limb index per pair, grouped by s=j+i
    ii: jnp.ndarray,  # (P,) int32 right-limb index per pair
    n_diag: int,
    t_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(n_diag, R, T) i32 raw observable sums per significance diagonal.

    R = 3 * n_sites + 1 rows padded to a multiple of 8; all local dims must
    be 2 (n_sites = log2(dim)).  Combine outside with weights 2^(-5 s).
    """
    L, dim, T = S_re.shape
    n_sites = dim.bit_length() - 1
    assert 1 << n_sites == dim, "fused obs kernel requires a power-of-two dim"
    assert T % t_tile == 0, (T, t_tile)
    # i32 headroom: <= q pairs per diagonal, |limb| <= 33, dim rows
    assert dim * 33 * 33 * int(n_diag) < 2**31, "i32 would overflow"
    P = jj.shape[0]
    R = _round_up(3 * n_sites + 1, 8)

    grid = (T // t_tile, P)
    # index-map constants pinned to i32: with x64 enabled a python literal
    # lowers as i64, which the Mosaic scalar core rejects
    zero = np.int32(0)
    plane = lambda which: pl.BlockSpec(
        (1, dim, t_tile),
        (lambda t, p, jj_ref, ii_ref: (which(jj_ref, ii_ref, p), zero, t)),
        memory_space=pltpu.VMEM,
    )
    a_spec = plane(lambda jj_ref, ii_ref, p: jj_ref[p])
    b_spec = plane(lambda jj_ref, ii_ref, p: ii_ref[p])
    out_spec = pl.BlockSpec(
        (1, R, t_tile),
        lambda t, p, jj_ref, ii_ref: (jj_ref[p] + ii_ref[p], zero, t),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _ext_obs_kernel(n_sites, dim),
        out_shape=jax.ShapeDtypeStruct((n_diag, R, T), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[a_spec, b_spec, a_spec, b_spec],
            out_specs=out_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(P) * dim * T * (6 + 10 * n_sites),
            bytes_accessed=int(P) * dim * T * 4 + int(n_diag) * R * T * 4,
            transcendentals=0,
        ),
        # the unrolled per-site reduction holds ~44 MB of i32 transients at
        # dim 8192 — beyond the 16 MB default scoped-vmem cap but well within
        # the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jj.astype(jnp.int32), ii.astype(jnp.int32), S_re, S_re, S_im, S_im)
