"""Extended-precision (float64-accurate) matmuls from MXU-native passes.

This TPU generation emulates f64; XLA's x64 rewriter expands an f64 matmul
into ~8 limb passes but materializes every pass at once — a square
8192^2 f64 matmul needs >17 GB and OOMs the chip.  This module implements the
same idea (Ozaki-scheme splitting) manually with SEQUENCED, bounded-memory
passes, turning f64-precision square matmuls at dim 8192 from impossible into
a few seconds of int8 MXU work.

Scheme
------
Split each f64 matrix into ``n_limbs`` grid-aligned integer limbs of
``limb_bits`` bits:

    x = sum_k  l_k * 2^{-p_k},   l_k integer-valued, |l_k| <= 2^limb_bits

where the grids p_k descend from the matrix's global max exponent.  Limb
extraction uses only multiply / rint / subtract — exact in (emulated-exact)
f64 and opaque to XLA's excess-precision simplifier (classic two-sum/Dekker
patterns get rewritten away on this backend; see dynamics/phase.py).

Each limb is stored as int8 (values are small exact integers).  A product of
two limb matrices rides the MXU's native s8xs8->s32 path and accumulates
integers bounded by K * 2^(2*limb_bits) — with limb_bits=5 and K <= 8192
that is < 2^23, so every partial sum is EXACTLY representable: the limb
products are error-free, and i32 diagonal sums of up to n_limbs of them stay
below 2^31.  The final weighted sum across significance diagonals runs in
f64; the truncated tail is ~2^-(5*n_limbs) relative.

Cost: ~n_limbs*(n_limbs+1)/2 int8 matmuls per real f64 matmul — native MXU
throughput (2x the bf16 rate, half the HBM bytes) instead of software
emulation, with n_limbs * M*K bytes of limb storage and one i32 transient.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx

LIMB_BITS = 5
N_LIMBS = 11  # 11 * 5 = 55 bits >= f64's 53-bit significand


def _limb_split(x: jnp.ndarray, n_limbs: int, limb_bits: int):
    """(limbs int8 [n_limbs, ...], scale) with x ~= sum_k limbs[k] * scale * 2^{-limb_bits*k}.

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
        limbs.append(l.astype(jnp.int8))
        r = (r - l) * (2.0**limb_bits)
    return jnp.stack(limbs), scale


def _accumulate_products(A, sa, B, sb, out_shape, n_limbs, limb_bits):
    out = jnp.zeros(out_shape, jnp.float64)
    # Each limb-pair product rides the MXU's native s8xs8->s32 path and is
    # EXACT (|products| <= 2^(2*limb_bits), K-sums <= K * 2^(2*limb_bits),
    # diagonal sums of <= n_limbs of those stay < 2^31).  Only the weighted
    # sum ACROSS significance diagonals runs in f64 — one f64 op per
    # diagonal instead of one per pair, which matters on a backend that
    # emulates f64 in software.  Diagonals are accumulated SMALLEST FIRST:
    # the f64 partial sum stays small until the final (largest) diagonals
    # land, so the total rounding is a few ulp of the result instead of
    # ~n_limbs/2 ulp — the expm squaring chain amplifies per-matmul error
    # by 2^15.
    for s in range(n_limbs - 1, -1, -1):
        acc = None
        for k in range(s + 1):
            p = jnp.dot(A[k], B[s - k], preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        w = jnp.exp2(jnp.asarray(-limb_bits * s, jnp.float64))
        out = out + acc.astype(jnp.float64) * w
    return out * (sa * sb)


@partial(jax.jit, static_argnames=("n_limbs", "limb_bits"))
def matmul_f64(
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_limbs: int = N_LIMBS,
    limb_bits: int = LIMB_BITS,
) -> jnp.ndarray:
    """f64-precision a @ b via error-free int8 limb products."""
    assert a.dtype == jnp.float64 and b.dtype == jnp.float64
    K = a.shape[-1]
    # i32 accumulation: K-sums and diagonal sums must stay below 2^31
    assert K * (2 ** (2 * limb_bits)) * n_limbs < 2**31, "i32 would overflow"
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
            # value fetch: block_until_ready returns at dispatch acceptance
            # on this backend, defeating the HBM-pressure serialization
            from ..utils.profiling import fetch_sync

            fetch_sync(out)
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


# ===========================================================================
# Fixed-grid extended precision ("ext"): ~70-bit matrices as canonical 5-bit
# limb stacks on a FIXED power-of-two grid.
#
# The expm squaring chain amplifies per-matmul rounding by 2^n_squarings
# (~2^23 for the N=12 production workload), so f64 (even carefully
# accumulated, ~1e-14/matmul) floors the trace at ~1e-6.  Here every chain
# operand stays in an exact limb representation:
#
#   value = sum_j l_j * 2^(EXT_E - 5*(j+1)),   l_j integer, |l_j| <= 16
#
# All chain values are bounded (|entries| <= e^theta < 2 for the Taylor
# core, <= 1 for unitaries), so the grid never moves: products land exactly
# ON grid positions, diagonal sums are exact integers in f64, and
# renormalization is an exact rint carry cascade — NO floating-point
# rounding anywhere except the final truncation at 5*EXT_LIMBS-ish bits.
# Classic two-sum/Dekker compensation is NOT used anywhere: XLA's
# --xla_allow_excess_precision rewrites it away on this backend; integer
# limb arithmetic is immune.
#
# Cost: ~L(L+1)/2 int8 MXU matmuls per real product (L=EXT_LIMBS), i.e.
# ~1.6x the limb count of the single-f64 scheme above, for ~70-bit precision
# — but each pass rides the MXU's s8xs8->s32 path (2x the bf16 rate, half
# the HBM bytes), so the wall-clock is comparable.
# ===========================================================================

EXT_LIMBS = 15  # 15 * 5 = 75 bits below the grid top
EXT_GUARD = 2  # extra product diagonals computed below the last kept limb
# Fixed grid top exponent.  Must be a MULTIPLE OF 5 so that products of two
# grid-aligned limbs land exactly on grid positions (s = j + i); chain values
# are bounded well below 2^EXT_E (|entries| <= e^theta ~ 1.07), so the top
# limb is tiny and resolution is 2^(EXT_E - 5*EXT_LIMBS) = 2^-65 absolute.
EXT_E = 5


def _ext_w(j: int) -> float:
    """Weight of limb j (static python float, exact power of two)."""
    return float(2.0 ** (EXT_E - 5 * (j + 1)))


def ext_split(x: jnp.ndarray, L: int = EXT_LIMBS) -> jnp.ndarray:
    """f64 -> (L, ...) int8 canonical limbs on the fixed grid (exact ops).

    int8 storage (limbs are small exact integers): half the HBM footprint of
    bf16 and the MXU's s8xs8->s32 path runs the limb products ~1.5x faster
    than bf16xbf16->f32 (measured at dim 8192 on v5e).
    """
    limbs = []
    r = x * (2.0 ** (5 - EXT_E))  # |r| < 2^5 for |x| < 2^EXT_E
    for _ in range(L):
        l = jnp.rint(r)
        limbs.append(l.astype(jnp.int8))
        r = (r - l) * 32.0
    return jnp.stack(limbs)


def ext_split_host(x: np.ndarray, L: int = EXT_LIMBS) -> np.ndarray:
    """Host-side (numpy) ext_split: f64 -> (L, ...) int8 canonical limbs.

    On the TPU the device split runs ~30 elementwise passes of EMULATED f64
    over the full matrix (~30 s at dim 8192 through the tunnel); native host
    f64 does it in seconds, and the int8 limbs transfer at half the bytes of
    the f64 source."""
    maxabs = float(np.abs(x).max()) if x.size else 0.0
    assert maxabs < 2.0**EXT_E, (
        f"ext_split_host domain violated: max|x| = {maxabs} >= 2^{EXT_E} "
        "(out-of-grid input would silently corrupt the int8 limbs)"
    )
    limbs = np.empty((L,) + x.shape, np.int8)
    r = np.array(x * (2.0 ** (5 - EXT_E)))  # fresh buffer, mutated in place
    l = np.empty_like(r)
    for j in range(L):
        np.rint(r, out=l)
        limbs[j] = l  # cast-copy to int8
        r -= l
        r *= 32.0  # in-place: allocation-free passes are ~6x faster here
    return limbs


def ext_val(limbs: jnp.ndarray) -> jnp.ndarray:
    """(L, ...) limbs -> f64 value (smallest-significance first)."""
    L = limbs.shape[0]
    out = jnp.zeros(limbs.shape[1:], jnp.float64)
    for j in range(L - 1, -1, -1):
        out = out + limbs[j].astype(jnp.float64) * _ext_w(j)
    return out


def _ext_carry(d: jnp.ndarray) -> jnp.ndarray:
    """Exact carry cascade: (L, ...) f64 integer digits -> canonical int8 limbs.

    Digits may be up to ~2^30; carries propagate toward significance (j-1).
    The top carry is folded into limb 0 (values stay within the grid by
    construction of the callers: |value| < 2^EXT_E).
    """
    L = d.shape[0]
    limbs = [None] * L
    carry = jnp.zeros_like(d[0])
    for j in range(L - 1, 0, -1):
        t = d[j] + carry
        carry = jnp.rint(t * (1.0 / 32.0))
        limbs[j] = (t - carry * 32.0).astype(jnp.int8)
    limbs[0] = (d[0] + carry).astype(jnp.int8)
    return jnp.stack(limbs)


def _ext_carry_i32(d: jnp.ndarray) -> jnp.ndarray:
    """Exact carry cascade on int32 digits -> canonical int8 limbs.

    Same contract as `_ext_carry` but in native integer arithmetic: on TPU
    f64 is software-emulated on the VPU while i32 add/shift are native, so
    the hot matmul/Horner paths run their (exact-integer) digit arithmetic
    here.  Rounding of the carry is nearest-half-up via an arithmetic shift
    (`_ext_carry` uses rint's half-even) — the canonical residuals differ on
    exact ties only and both are exact representations of the same value,
    so all downstream values are identical.
    """
    L = d.shape[0]
    limbs = [None] * L
    carry = jnp.zeros_like(d[0])
    for j in range(L - 1, 0, -1):
        t = d[j] + carry
        carry = (t + 16) >> 5  # floor((t+16)/32): nearest, ties toward +inf
        limbs[j] = (t - (carry << 5)).astype(jnp.int8)
    limbs[0] = (d[0] + carry).astype(jnp.int8)
    return jnp.stack(limbs)


def ext_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact sum of two canonical ext stacks (same fixed grid)."""
    return _ext_carry_i32(a.astype(jnp.int32) + b.astype(jnp.int32))


def ext_neg(a: jnp.ndarray) -> jnp.ndarray:
    return (-a.astype(jnp.int32)).astype(jnp.int8)


def ext_scalar_limbs(c, L: int = EXT_LIMBS) -> tuple[float, ...]:
    """Static 5-bit signed limb expansion of a host scalar on grid e=0:

        c = sum_i s_i * 2^(-5*(i+1)),  |s_i| <= 16  (exact to 5L bits)

    Requires |c| < 1 (Taylor 1/k coefficients).  Accepts float or Fraction;
    pass a Fraction for exact rationals (float 1/k is already rounded).
    """
    from fractions import Fraction

    assert abs(c) < 1.0
    r = Fraction(c)
    out = []
    for _ in range(L):
        r *= 32
        s = int(round(r))
        out.append(float(s))
        r -= s
    return tuple(out)


def ext_scalar_mul(a: jnp.ndarray, c_limbs: tuple[float, ...]) -> jnp.ndarray:
    """Exact ext * static-scalar product (scalar on grid e=0, |c| < 1).

    Limb j (weight 2^(E-5(j+1))) times scalar limb i (weight 2^(-5(i+1)))
    lands exactly on grid position j+i+1; positions >= L truncate (~2^-5L).
    """
    L = a.shape[0]
    af = a.astype(jnp.float64)
    d = []
    for m in range(L + EXT_GUARD):
        acc = jnp.zeros_like(af[0])
        for i, ci in enumerate(c_limbs):
            j = m - 1 - i
            if 0 <= j < L and ci != 0.0:
                acc = acc + af[j] * ci
        d.append(acc)
    return _ext_carry(jnp.stack(d))[:L]


def ext_cmatmul(
    are: jnp.ndarray,
    aim: jnp.ndarray,
    bre: jnp.ndarray,
    bim: jnp.ndarray,
    panel: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-to-truncation complex matmul of canonical ext stacks.

    Inputs/outputs: (L, M, K) / (L, K, N) int8 canonical limbs on the fixed
    grid.  Each limb-pair product is an exact integer s8xs8->s32 MXU pass:
    canonical limbs are |l| <= 16 except limb 0, whose carry fold reaches
    |l| <= 32 (33 after ext_add_identity), so |products| <= ~2^11 and K-sums
    <= K * 2^11; diagonal sums of <= L of those stay exact in i32 (asserted
    below).  The carry cascade renormalizes.  The ONLY error is the
    truncation of diagonals >= L (~2^(EXT_E-5L) absolute).

    Grid bookkeeping: limb j carries weight 2^(E-5(j+1)); with E = 5 the
    product of limbs (j, i) has weight 2^(10-5(j+i+2)) = 2^(5-5(j+i+1)) =
    w(j+i): it lands exactly ON output grid position s = j + i.  Diagonals
    s >= L are truncated (absolute error ~2^(E-5L)).

    Column-panel loop bounds the f64 diagonal workspace to (L, M, panel).
    """
    assert EXT_E == 5, "product grid alignment requires EXT_E == 5"
    L, M, K = are.shape
    # i32 headroom (Karatsuba): per limb pair |m3| <= K*66*66, |m1|,|m2| <=
    # K*33*33, so |im digit| <= K*6534; a diagonal accumulates up to L pair
    # products before the carry cascade (carry adds < 4% on top).
    assert K * 6534 * L < 2**31, "i32 would overflow in ext_cmatmul"
    N = bre.shape[2]
    assert N % panel == 0 or N <= panel, (N, panel)
    panel = min(panel, N)
    n_panels = N // panel

    # Karatsuba limb sums, hoisted out of the panel scan (canonical limbs
    # are <= 16, limb 0 <= 33 after the identity-add carry fold, so sums
    # are <= 66: exact in int8).
    asum = are + aim

    def one_panel(b_re_p, b_im_p):
        return _ext_cpanel_product(are, aim, b_re_p, b_im_p, L, asum=asum)

    if n_panels <= 1:
        return one_panel(bre, bim)

    # write panels into carried output buffers (in-place in the scan carry):
    # peak memory stays at two full stacks + one panel workspace, and no
    # (n_panels, L, M, panel) -> (L, M, N) relayout copy is materialized.
    def body(carry, p):
        c_re, c_im = carry
        b_re_p = jax.lax.dynamic_slice_in_dim(bre, p * panel, panel, axis=2)
        b_im_p = jax.lax.dynamic_slice_in_dim(bim, p * panel, panel, axis=2)
        o_re, o_im = one_panel(b_re_p, b_im_p)
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, o_re, p * panel, axis=2)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, o_im, p * panel, axis=2)
        return (c_re, c_im), None

    init = (
        jnp.zeros((L, M, N), jnp.int8),
        jnp.zeros((L, M, N), jnp.int8),
    )
    (c_re, c_im), _ = jax.lax.scan(body, init, jnp.arange(n_panels))
    return c_re, c_im


ext_cmatmul_jit = jax.jit(ext_cmatmul, static_argnames=("panel",))


def _ext_scalar_mul_traced(a: jnp.ndarray, cl: jnp.ndarray) -> jnp.ndarray:
    """ext * scalar with TRACED scalar limbs cl (Lc,) — for loop-carried
    coefficients (e.g. Taylor 1/k indexed by a fori counter)."""
    L = a.shape[0]
    Lc = cl.shape[0]
    ai = a.astype(jnp.int32)
    ci = cl.astype(jnp.int32)
    d = []
    for m in range(L + EXT_GUARD):
        acc = jnp.zeros_like(ai[0])
        for i in range(min(Lc, m)):
            j = m - 1 - i
            if 0 <= j < L:
                acc = acc + ai[j] * ci[i]
        d.append(acc)
    return _ext_carry_i32(jnp.stack(d))[:L]


def _ext_pairs(L: int) -> tuple[np.ndarray, np.ndarray]:
    """(j, i) limb-pair indices of every kept product diagonal (j + i =
    s < L + EXT_GUARD, both < L), ordered by (s, j) — the accumulation
    order of the unrolled pyramid."""
    pairs = [
        (j, s - j)
        for s in range(L + EXT_GUARD)
        for j in range(max(0, s - L + 1), min(s + 1, L))
    ]
    jj = np.asarray([p[0] for p in pairs], np.int32)
    ii = np.asarray([p[1] for p in pairs], np.int32)
    return jj, ii


def _ext_cpanel_product_pairscan(are, aim, b_re_p, b_im_p, L, asum):
    """`_ext_cpanel_product` as a fori_loop over limb pairs: one 3-dot body
    instead of ~400 unrolled dots.  Same exact integers, same accumulation
    order per diagonal -> bit-identical digits; the executable shrinks ~20x,
    which matters on backends where FIRST dispatch pays an executable-load
    proportional to program size (docs/ROUND4.md: 40-260 s per distinct
    chain program per process on the tunnel).  Opt-in via
    QST_EXT_PAIRSCAN=1 until the scan body's schedule is measured on real
    hardware (a combined doubling-pass body was once 4-10x slower than its
    parts — XLA scan schedules on this backend need measuring, not trusting).
    """
    jj_np, ii_np = _ext_pairs(L)
    jj = jnp.asarray(jj_np)
    ii = jnp.asarray(ii_np)
    ss = jnp.asarray(jj_np + ii_np)
    M = are.shape[1]
    P = b_re_p.shape[2]
    bsum_p = b_re_p + b_im_p

    def body(q, dd):
        dr, di = dd
        j, i, s = jj[q], ii[q], ss[q]
        aj_re = jax.lax.dynamic_index_in_dim(are, j, 0, keepdims=False)
        aj_im = jax.lax.dynamic_index_in_dim(aim, j, 0, keepdims=False)
        aj_s = jax.lax.dynamic_index_in_dim(asum, j, 0, keepdims=False)
        bi_re = jax.lax.dynamic_index_in_dim(b_re_p, i, 0, keepdims=False)
        bi_im = jax.lax.dynamic_index_in_dim(b_im_p, i, 0, keepdims=False)
        bi_s = jax.lax.dynamic_index_in_dim(bsum_p, i, 0, keepdims=False)
        m1 = jnp.dot(aj_re, bi_re, preferred_element_type=jnp.int32)
        m2 = jnp.dot(aj_im, bi_im, preferred_element_type=jnp.int32)
        m3 = jnp.dot(aj_s, bi_s, preferred_element_type=jnp.int32)
        re_c = m1 - m2
        im_c = m3 - m1 - m2
        cur_r = jax.lax.dynamic_index_in_dim(dr, s, 0, keepdims=False)
        cur_i = jax.lax.dynamic_index_in_dim(di, s, 0, keepdims=False)
        dr = jax.lax.dynamic_update_index_in_dim(dr, cur_r + re_c, s, 0)
        di = jax.lax.dynamic_update_index_in_dim(di, cur_i + im_c, s, 0)
        return dr, di

    d_re = jnp.zeros((L + EXT_GUARD, M, P), jnp.int32)
    d_im = jnp.zeros_like(d_re)
    d_re, d_im = jax.lax.fori_loop(0, len(jj_np), body, (d_re, d_im))
    return _ext_carry_i32(d_re)[:L], _ext_carry_i32(d_im)[:L]


def _ext_cpanel_product(are, aim, b_re_p, b_im_p, L, asum=None):
    """Exact diagonals + carry for (full ext A) @ (ext B panel).

    Karatsuba complex product — 3 int8 MXU dots per limb pair instead of 4:

        m1 = a_re @ b_re,  m2 = a_im @ b_im,  m3 = (a_re+a_im) @ (b_re+b_im)
        re = m1 - m2,      im = m3 - m1 - m2

    All three products are exact i32 integers (canonical limbs <= 16, limb 0
    <= 33 after the identity-add carry fold, so Karatsuba sums are <= 66 and
    |m3| <= K*66*66 stays far under 2^31), so the digits are BIT-IDENTICAL
    to the 4-dot form — 25% fewer MXU MACs, same values.  Pass ``asum``
    (= are + aim, int8) to hoist the A-sum out of a panel scan; the B-panel
    sum is always computed here (panel-sized, negligible).
    """
    if asum is None:
        asum = are + aim
    if os.environ.get("QST_EXT_PAIRSCAN") == "1":
        return _ext_cpanel_product_pairscan(are, aim, b_re_p, b_im_p, L, asum)
    bsum_p = b_re_p + b_im_p
    d_re = []
    d_im = []
    # EXT_GUARD extra diagonals below the last kept limb: their exact digits
    # feed carries upward in the cascade, shrinking the truncation bound by
    # 2^5 per guard; the canonical guard limbs are then dropped
    # (<= 16 * w(L) each, deterministic).
    for s in range(L + EXT_GUARD):
        acc_re = None
        acc_im = None
        # product of limbs (j, i) with j + i == s, both < L.  Each MXU dot
        # runs the native s8xs8->s32 path; diagonal sums (<= L*K*6534 < 2^31)
        # stay exact in native i32 — no emulated f64 anywhere.
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            m1 = jnp.dot(are[j], b_re_p[i], preferred_element_type=jnp.int32)
            m2 = jnp.dot(aim[j], b_im_p[i], preferred_element_type=jnp.int32)
            m3 = jnp.dot(asum[j], bsum_p[i], preferred_element_type=jnp.int32)
            re_c = m1 - m2
            im_c = m3 - m1 - m2
            acc_re = re_c if acc_re is None else acc_re + re_c
            acc_im = im_c if acc_im is None else acc_im + im_c
        d_re.append(acc_re)
        d_im.append(acc_im)
    return _ext_carry_i32(jnp.stack(d_re))[:L], _ext_carry_i32(jnp.stack(d_im))[:L]


@partial(jax.jit, static_argnames=("degree", "panel"))
def ext_taylor_horner(
    are: jnp.ndarray,
    aim: jnp.ndarray,
    coeff_limbs: jnp.ndarray,  # (degree+1, Lc) f64: limbs of 1/k at row k
    degree: int,
    panel: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """D = Horner(exp(A) - I) entirely in the exact limb domain, ONE program.

    Each COLUMN PANEL of D evolves independently through all Horner
    iterations (D <- A + (A @ D) / k touches D columnwise), so peak memory is
    A + the output + one panel workspace — the third full stack a naive
    product chain would hold never exists.
    """
    L, M, N = are.shape
    panel = min(panel, N)
    n_panels = N // panel
    asum = are + aim  # Karatsuba A-sum, hoisted out of the panel scan

    def taylor_panel(p):
        d_re = jax.lax.dynamic_slice_in_dim(are, p * panel, panel, axis=2)
        d_im = jax.lax.dynamic_slice_in_dim(aim, p * panel, panel, axis=2)
        a_re_p, a_im_p = d_re, d_im

        def body(i, dd):
            k = degree - i  # k runs degree .. 2
            d_re, d_im = dd
            p_re, p_im = _ext_cpanel_product(are, aim, d_re, d_im, L, asum=asum)
            cl = coeff_limbs[k]
            p_re = _ext_scalar_mul_traced(p_re, cl)
            p_im = _ext_scalar_mul_traced(p_im, cl)
            return (ext_add(a_re_p, p_re), ext_add(a_im_p, p_im))

        return jax.lax.fori_loop(0, degree - 1, body, (d_re, d_im))

    if n_panels <= 1:
        return taylor_panel(0)

    def scan_body(carry, p):
        c_re, c_im = carry
        o_re, o_im = taylor_panel(p)
        c_re = jax.lax.dynamic_update_slice_in_dim(c_re, o_re, p * panel, axis=2)
        c_im = jax.lax.dynamic_update_slice_in_dim(c_im, o_im, p * panel, axis=2)
        return (c_re, c_im), None

    init = (
        jnp.zeros((L, M, N), jnp.int8),
        jnp.zeros((L, M, N), jnp.int8),
    )
    (c_re, c_im), _ = jax.lax.scan(scan_body, init, jnp.arange(n_panels))
    return c_re, c_im


def taylor_coeff_limbs(degree: int, Lc: int = EXT_LIMBS) -> np.ndarray:
    """(degree+1, Lc) exact limb expansions of 1/k (row k; rows 0,1 unused)."""
    from fractions import Fraction

    out = np.zeros((degree + 1, Lc))
    for k in range(2, degree + 1):
        out[k] = np.asarray(ext_scalar_limbs(Fraction(1, k), Lc))
    return out


@jax.jit
def ext_add_identity(a: jnp.ndarray) -> jnp.ndarray:
    """a + I in the limb domain (1.0 sits exactly on limb 0: w(0) = 1)."""
    n = a.shape[1]
    eye = jnp.eye(n, dtype=jnp.int32)
    return a.at[0].set((a[0].astype(jnp.int32) + eye).astype(jnp.int8))


ext_scalar_mul_jit = jax.jit(ext_scalar_mul, static_argnums=(1,))
ext_add_jit = jax.jit(ext_add)
ext_val_jit = jax.jit(ext_val)


# -- fast H upload: host f32 triple-split + device-native limb extraction ----
#
# ext_split_host runs ~2L numpy passes of f64 over the full matrix on a
# 1-core host (~20-30 s for the two dim-8192 planes, docs/ROUND2.md).  The
# same exact limbs can be built from an EXACT f32 decomposition
# x = a1 + a2 + a3 (Dekker-style: each cast captures 24 bits; 3*24 > 53, and
# each remainder is exactly representable in f64, so the split is lossless).
# The f32 planes upload flat at full tunnel bandwidth, and the limb
# extraction then runs on device in NATIVE f32 (rint/sub/mul are exact on
# 5-bit limb steps of a 24-bit significand), digits summed in i32 and
# canonicalized by the exact carry cascade.  The only difference vs
# ext_split is the final-limb rounding of the dropped tail (<= 2^(E-5L-1)
# absolute, within the ext truncation spec).


def f32_triple_split_host(x: np.ndarray):
    """Exact x = a1 + a2 + a3 with a_k float32 (lossless for |x| < 2^127)."""
    a1 = x.astype(np.float32)
    r = x - a1  # exact: difference of nearby representables
    a2 = r.astype(np.float32)
    r -= a2
    a3 = r.astype(np.float32)
    return a1, a2, a3


def _ext_carry_i8_digits(d8: jnp.ndarray) -> jnp.ndarray:
    """Carry cascade over SMALL int8 digits (|d| <= 48, sums of <= 3 exact
    limb extractions) -> canonical int8 limbs.  Same math as _ext_carry_i32
    with per-limb i32 casts, so peak live memory is two int8 stacks plus one
    limb-sized i32 transient (the full-stack i32 form held 4 GB at dim 8192
    and thrashed HBM)."""
    L = d8.shape[0]
    limbs = [None] * L
    carry = jnp.zeros(d8.shape[1:], jnp.int32)
    for j in range(L - 1, 0, -1):
        t = d8[j].astype(jnp.int32) + carry
        carry = (t + 16) >> 5
        limbs[j] = (t - (carry << 5)).astype(jnp.int8)
    limbs[0] = (d8[0].astype(jnp.int32) + carry).astype(jnp.int8)
    return jnp.stack(limbs)


@partial(jax.jit, static_argnames=("L", "shape"))
def _ext_limbs_from_f32_planes(a1, a2, a3, L: int, shape):
    """(L, *shape) int8 canonical limbs from three flat f32 planes.

    Digits accumulate directly in int8 (each plane's limb is <= 16, the
    3-plane sum <= 48): the int8 digit stack is 1/4 the footprint of i32,
    which keeps the whole extraction resident at large dims."""
    digits = [jnp.zeros(shape, jnp.int8) for _ in range(L)]
    scale = np.float32(2.0 ** (5 - EXT_E))
    for plane in (a1, a2, a3):
        r = plane.reshape(shape) * scale
        for j in range(L):
            l = jnp.rint(r)
            digits[j] = digits[j] + l.astype(jnp.int8)
            r = (r - l) * np.float32(32.0)
    return _ext_carry_i8_digits(jnp.stack(digits))


def ext_split_upload(x: np.ndarray, L: int = EXT_LIMBS) -> jnp.ndarray:
    """Host f64 array -> device (L, ...) int8 canonical ext limbs.

    The fast path for large matrices: 3 host f32 casts, 3 flat uploads, and
    a device-native f32 extraction — replaces the 2L-pass host split + int8
    stack upload."""
    import jax as _jax

    maxabs = float(np.abs(x).max()) if x.size else 0.0
    assert maxabs < 2.0**EXT_E, (
        f"ext_split_upload domain violated: max|x| = {maxabs} >= 2^{EXT_E}"
    )
    a1, a2, a3 = f32_triple_split_host(np.ascontiguousarray(x))
    # flat transfers: the tunnel moves 1-D buffers at full bandwidth
    d1 = _jax.device_put(a1.reshape(-1))
    d2 = _jax.device_put(a2.reshape(-1))
    d3 = _jax.device_put(a3.reshape(-1))
    return _ext_limbs_from_f32_planes(d1, d2, d3, L, tuple(x.shape))


@partial(jax.jit, static_argnames=("L", "shape"))
def _ext_limbs_from_f32_pair(flat, L: int, shape):
    """One program: two ext stacks from six packed flat f32 planes."""
    n = 1
    for s in shape:
        n *= s
    outs = []
    for plane_idx in range(2):
        planes = [
            flat[(3 * plane_idx + i) * n : (3 * plane_idx + i + 1) * n]
            for i in range(3)
        ]
        outs.append(_ext_limbs_from_f32_planes(*planes, L=L, shape=shape))
    return outs[0], outs[1]


@partial(jax.jit, static_argnames=("L", "dim"))
def _ext_limbs_from_coo_pair(idx, vals, L: int, dim: int):
    """Two ext stacks from an aggregated COO triplet.

    ``idx``: (2, nnz) int32 row/col indices (duplicates pre-aggregated on
    host, so plain ``set`` scatter semantics are exact); ``vals``: (6, nnz)
    f32 — the three exact f32 triple-split planes of each of the two parts.
    Builds each part's three DENSE f32 planes by scatter into a zero matrix
    (the implicit zeros are exactly the missing entries), then runs the
    native-f32 limb extraction — identical math to the dense-plane path.
    """
    rows, cols = idx[0], idx[1]
    outs = []
    for part in range(2):
        planes = [
            jnp.zeros((dim, dim), jnp.float32)
            .at[rows, cols]
            .set(vals[3 * part + i], mode="drop", unique_indices=True)
            .reshape(-1)
            for i in range(3)
        ]
        outs.append(
            _ext_limbs_from_f32_planes(*planes, L=L, shape=(dim, dim))
        )
    return outs[0], outs[1]


def ext_split_upload_coo_pair(
    rows: np.ndarray,
    cols: np.ndarray,
    v_a: np.ndarray,
    v_b: np.ndarray,
    dim: int,
    L: int = EXT_LIMBS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two device ext stacks of sparse matrices given as one aggregated COO
    triplet — the large-dim fast path.

    The dipolar Hamiltonian is ~1% dense at dim 8192, so shipping the dense
    f32 triple-split planes moves ~1.6 GB through the tunnel (163 s observed
    on a degraded link) where the COO form is ~30-60 MB.  Values are
    triple-split on host (nnz-sized, cheap), packed with the i32 indices into
    two flat uploads, and the dense planes are rebuilt on device by scatter —
    the extraction math is bit-identical to :func:`ext_split_upload_pair`.
    Indices must be duplicate-free (``OperatorSum.to_coo`` aggregates).
    """
    import jax as _jax

    for v in (v_a, v_b):
        maxabs = float(np.abs(v).max()) if v.size else 0.0
        assert maxabs < 2.0**EXT_E, f"domain violated: max|v| = {maxabs}"
    assert rows.shape == cols.shape == v_a.shape == v_b.shape
    planes = []
    for v in (v_a, v_b):
        planes.extend(
            a.reshape(-1)
            for a in f32_triple_split_host(np.ascontiguousarray(v))
        )
    vals = np.stack(planes)  # (6, nnz) f32
    idx = np.stack([rows, cols]).astype(np.int32)  # (2, nnz)
    return _ext_limbs_from_coo_pair(
        _jax.device_put(idx), _jax.device_put(vals), L, dim
    )


@partial(jax.jit, static_argnames=("L", "dim"))
def _ext_scatter_pair(packed: jnp.ndarray, idx: jnp.ndarray, L: int, dim: int):
    """(2*L*nnz,) packed canonical int8 limbs + flat i32 indices -> two
    dense (L, dim, dim) limb stacks by scatter (trivial device program)."""
    nnz = idx.shape[0]
    lr = packed[: L * nnz].reshape(L, nnz)
    li = packed[L * nnz :].reshape(L, nnz)
    base = jnp.zeros((L, dim * dim), jnp.int8)
    are = base.at[:, idx].set(lr).reshape(L, dim, dim)
    aim = base.at[:, idx].set(li).reshape(L, dim, dim)
    return are, aim


def ext_split_upload_coo_pair_host(
    rows: np.ndarray,
    cols: np.ndarray,
    v_a: np.ndarray,
    v_b: np.ndarray,
    dim: int,
    L: int = EXT_LIMBS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """COO pair -> dense limb stacks via HOST canonical split + int8 scatter.

    Alternative to :func:`ext_split_upload_coo_pair` whose device-side f32
    extraction program is the slowest executable LOAD of the whole N=12
    chain (134-258 s at first dispatch per process, every process, cache
    hit or not — docs/ROUND4.md).  Here the canonical limbs of the
    nnz-sized value vectors are computed on host (exact, milliseconds),
    shipped as ONE ~2*L*nnz-byte int8 upload (~3.6 MB at dim 8192), and the
    dense planes are rebuilt by a trivial scatter program.  Both paths are
    exact decompositions of identical values, so every downstream product
    is identical (limb-level ties may canonicalize differently; see the
    ckpt fingerprint).  dim*dim must fit i32 (holds through dim 32768).
    """
    assert rows.shape == cols.shape == v_a.shape == v_b.shape
    assert dim * dim < 2**31
    lr = ext_split_host(np.ascontiguousarray(v_a), L)
    li = ext_split_host(np.ascontiguousarray(v_b), L)
    packed = np.concatenate([lr.reshape(-1), li.reshape(-1)])
    idx = (rows.astype(np.int64) * dim + cols.astype(np.int64)).astype(np.int32)
    return _ext_scatter_pair(
        jax.device_put(jnp.asarray(packed)), jax.device_put(jnp.asarray(idx)),
        L, dim,
    )


def ext_split_upload_pair(
    x_a: np.ndarray, x_b: np.ndarray, L: int = EXT_LIMBS
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two host f64 arrays -> two device ext stacks in ONE upload + ONE
    dispatch (each dispatch costs ~6 s of relay round-trip on the tunnel;
    the packed transfer rides the 1-D fast path)."""
    import jax as _jax

    for x in (x_a, x_b):
        maxabs = float(np.abs(x).max()) if x.size else 0.0
        assert maxabs < 2.0**EXT_E, f"domain violated: max|x| = {maxabs}"
    assert x_a.shape == x_b.shape
    planes = []
    for x in (x_a, x_b):
        planes.extend(
            a.reshape(-1) for a in f32_triple_split_host(np.ascontiguousarray(x))
        )
    packed = np.concatenate(planes)
    return _ext_limbs_from_f32_pair(
        _jax.device_put(packed), L, tuple(x_a.shape)
    )
