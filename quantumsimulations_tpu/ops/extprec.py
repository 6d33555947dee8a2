"""Extended-precision (float64-accurate) matmuls from MXU-native passes.

This TPU generation emulates f64; XLA's x64 rewriter expands an f64 matmul
into ~8 bf16-limb passes but materializes every pass at once — a square
8192^2 f64 matmul needs >17 GB and OOMs the chip.  This module implements the
same idea (Ozaki-scheme splitting) manually with SEQUENCED, bounded-memory
passes, turning f64-precision square matmuls at dim 8192 from impossible into
a few seconds of bf16 MXU work.

Scheme
------
Split each f64 matrix into ``n_limbs`` grid-aligned integer limbs of
``limb_bits`` bits:

    x = sum_k  l_k * 2^{-p_k},   l_k integer-valued, |l_k| <= 2^limb_bits

where the grids p_k descend from the matrix's global max exponent.  Limb
extraction uses only multiply / rint / subtract — exact in (emulated-exact)
f64 and opaque to XLA's excess-precision simplifier (classic two-sum/Dekker
patterns get rewritten away on this backend; see dynamics/phase.py).

Each limb is stored as bf16 (integers up to 2^limb_bits are exact in bf16's
8-bit mantissa).  A product of two limb matrices accumulates integers bounded
by K * 2^(2*limb_bits) in the MXU's f32 accumulator — with limb_bits=5 and
K <= 8192 that is < 2^23, so every partial sum is EXACTLY representable:
the limb products are error-free.  The final sum over limb pairs (k, l) with
k + l < n_limbs runs in f64; the truncated tail is ~2^-(5*n_limbs) relative.

Cost: ~n_limbs*(n_limbs+1)/2 bf16 matmuls per real f64 matmul — native MXU
throughput instead of software emulation, with ~2 * n_limbs * M*K*2 bytes of
limb storage and one f32 product transient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx

LIMB_BITS = 5
N_LIMBS = 11  # 11 * 5 = 55 bits >= f64's 53-bit significand


def _limb_split(x: jnp.ndarray, n_limbs: int, limb_bits: int):
    """(limbs bf16 [n_limbs, ...], scale) with x ~= sum_k limbs[k] * scale * 2^{-limb_bits*k}.

    ``scale`` is a power of two with max|x| / scale in [2^(limb_bits-1), 2^limb_bits).
    """
    maxabs = jnp.max(jnp.abs(x))
    safe = jnp.where(maxabs > 0, maxabs, 1.0)
    # scale = 2^(floor(log2 maxabs) + 1 - limb_bits): first limb uses full range
    e = jnp.floor(jnp.log2(safe)) + 1.0 - limb_bits
    scale = jnp.exp2(e)
    inv_scale = jnp.exp2(-e)

    limbs = []
    r = x * inv_scale  # |r| < 2^limb_bits
    for _ in range(n_limbs):
        l = jnp.rint(r)
        limbs.append(l.astype(jnp.bfloat16))
        r = (r - l) * (2.0**limb_bits)
    return jnp.stack(limbs), scale


def _accumulate_products(A, sa, B, sb, out_shape, n_limbs, limb_bits):
    out = jnp.zeros(out_shape, jnp.float64)
    # Each limb-pair product is EXACT in the f32 accumulator; sums across
    # pairs must happen in f64 (f32 sums of several ~2^23 products would
    # round and reintroduce ~1e-8-relative error).  Significance diagonals
    # are accumulated SMALLEST FIRST: the f64 partial sum then stays small
    # until the final (largest) diagonals land, so the total rounding is a
    # few ulp of the result instead of ~n_limbs^2/2 ulp — worth ~25x on the
    # per-matmul error, which the expm squaring chain amplifies by 2^15.
    for s in range(n_limbs - 1, -1, -1):
        w = jnp.exp2(jnp.asarray(-limb_bits * s, jnp.float64))
        for k in range(s + 1):
            p = jnp.dot(A[k], B[s - k], preferred_element_type=jnp.float32)
            out = out + p.astype(jnp.float64) * w
    return out * (sa * sb)


@partial(jax.jit, static_argnames=("n_limbs", "limb_bits"))
def matmul_f64(
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_limbs: int = N_LIMBS,
    limb_bits: int = LIMB_BITS,
) -> jnp.ndarray:
    """f64-precision a @ b via error-free bf16 limb products."""
    assert a.dtype == jnp.float64 and b.dtype == jnp.float64
    K = a.shape[-1]
    assert K * (2 ** (2 * limb_bits)) < 2**24, "f32 accumulation would round"
    A, sa = _limb_split(a, n_limbs, limb_bits)
    B, sb = _limb_split(b, n_limbs, limb_bits)
    return _accumulate_products(
        A, sa, B, sb, (a.shape[0], b.shape[1]), n_limbs, limb_bits
    )


# -- pre-limbed form: split a reused operand once (e.g. a step operator
#    applied to thousands of state blocks) -----------------------------------

@partial(jax.jit, static_argnames=("n_limbs", "limb_bits"))
def limbs_of(a: jnp.ndarray, n_limbs: int = N_LIMBS, limb_bits: int = LIMB_BITS):
    return _limb_split(a, n_limbs, limb_bits)


@partial(jax.jit, static_argnames=("n_limbs", "limb_bits"))
def matmul_f64_prelimbed(
    A, sa, b: jnp.ndarray, n_limbs: int = N_LIMBS, limb_bits: int = LIMB_BITS
) -> jnp.ndarray:
    """(pre-limbed A) @ b."""
    B, sb = _limb_split(b, n_limbs, limb_bits)
    return _accumulate_products(
        A, sa, B, sb, (A.shape[1], b.shape[1]), n_limbs, limb_bits
    )


@jax.jit
def _sub(a, b):
    return a - b


@jax.jit
def _add(a, b):
    return a + b


_SYNC_ELEMS = 2**24  # serialize products when operands exceed ~128 MB


def cmatmul_f64(
    a_re, a_im, b_re, b_im, n_limbs: int = N_LIMBS, limb_bits: int = LIMB_BITS
):
    """f64-precision complex matmul on (re, im) planes via limb products.

    The four real products run as SEQUENCED programs (a single fused program
    — or a quadrant-stacked (2M,K)x(K,2N) form — keeps too many limb stacks
    and product transients alive and OOMs at dim 8192).  For large operands
    each product is synced before the next dispatch: async execution lets
    several queued programs reserve their limb/product transients at once.
    """
    kw = dict(n_limbs=n_limbs, limb_bits=limb_bits)
    big = a_re.size >= _SYNC_ELEMS

    def run(x, y):
        out = matmul_f64(x, y, **kw)
        if big:
            jax.block_until_ready(out)
        return out

    rr = run(a_re, b_re)
    ii = run(a_im, b_im)
    c_re = _sub(rr, ii)
    del rr, ii
    ri = run(a_re, b_im)
    ir = run(a_im, b_re)
    return c_re, _add(ri, ir)


def cmatmul_f64_cplx(a: Cplx, b: Cplx, **kw) -> Cplx:
    re, im = cmatmul_f64(a.re, a.im, b.re, b.im, **kw)
    return Cplx(re, im)
