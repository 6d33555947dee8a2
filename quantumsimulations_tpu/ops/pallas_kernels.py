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
