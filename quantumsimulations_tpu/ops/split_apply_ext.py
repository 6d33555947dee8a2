"""Split-matmul apply in the FIXED-GRID ext limb domain (int-native path).

Third arithmetic tier for the beyond-dense Chebyshev stepper, after
measurement eliminated the other two (docs/ROUND4.md):

  * f64 apply (`.split_apply`): compute-bound on the XLA f64 software
    emulation — 0.60 TMAC/s on the v5e, 0.601 steps/s at dim 16384.
  * Ozaki-limb apply (`.split_apply_limb`): the int8 products are ~30x
    faster, but each apply must limb-split its f64 inputs and f64-accumulate
    its diagonal sums — emulated-f64 ELEMENTWISE work that measured ~1.4 of
    the 1.5 ms/apply.

Here the Chebyshev recurrence state never leaves the limb domain, so the
per-apply elementwise tier is NATIVE int32 (carry cascades) instead of
emulated f64:

  * static operator planes are split once at build time (host);
  * the apply takes canonical ext limbs and returns canonical ext limbs —
    int8 MXU dots into int32 digit stacks, summed across the four buckets
    (diag / left / cross / right) ON the shared digit grid, ONE carry
    cascade at the end;
  * Chebyshev T_k entries are bounded (|T_k(H/lam) psi| <= 1 elementwise
    norm), so the fixed grid (|x| < 2^EXT_E) always holds mid-recurrence
    (2*P - T_prev <= 3);
  * only the trace ACCUMULATOR lives in f64 (its partial sums reach
    sum_k |c_k| ~ O(sqrt(lam dt)) >> grid top): per term one grouped
    int32-Horner limb evaluation (`ext_val_grouped`) and a scalar f64
    multiply-add — ~3% of the step at dim 16384.

Grid bookkeeping matches ops/extprec.py (EXT_E == 5 asserted: limb j has
weight 2^-5j, products of limbs (j, i) land exactly on digit j + i; the
EXT_GUARD extra diagonals feed carries up the cascade).

Replaces qt.sesolve (reference: dipolar_ensemble_with_rare.py:653-666)
beyond dense reach, as ``arithmetic="ext"`` under dynamics/cheb_step.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .embed import OperatorSum
from .extprec import EXT_E, EXT_GUARD, EXT_LIMBS, _ext_carry_i32, ext_split_host
from .split_apply import split_operator

assert EXT_E == 5, "digit-grid alignment below requires EXT_E == 5"


def _product_digits(a, b, L: int, K: int):
    """Digit stacks of (ext a) @ (ext b): (L+G, M, N) int32, NO carry.

    Real x real — complex assembly happens bucket-wise in the caller
    (every static plane is real by i-folding, so the apply needs only
    real-A x real-B products).  Exactness: canonical limbs are <= 16
    (limb 0 <= 33), so each dot is <= K * 33 * 33 and a diagonal sums <= L
    of those — asserted against i32.
    """
    assert K * 33 * 33 * L < 2**31, "i32 would overflow in _product_digits"
    digits = []
    for s in range(L + EXT_GUARD):
        acc = None
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            m = jnp.dot(a[j], b[i], preferred_element_type=jnp.int32)
            acc = m if acc is None else acc + m
        digits.append(acc)
    return jnp.stack(digits)


def _ew_digits(d, t, L: int):
    """Digit stacks of (ext diag d) * (ext t), elementwise: (L+G, ...) i32."""
    digits = []
    for s in range(L + EXT_GUARD):
        acc = None
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            m = d[j].astype(jnp.int32) * t[i].astype(jnp.int32)
            acc = m if acc is None else acc + m
        digits.append(acc)
    return jnp.stack(digits)


def ext_val_grouped(limbs: jnp.ndarray) -> jnp.ndarray:
    """Canonical ext limbs -> f64 value via int32 group Horner.

    The naive evaluation is L emulated-f64 multiply-adds per element; here
    groups of 4 limbs Horner-combine exactly in NATIVE int32
    (<= ((33*32+16)*32+16)*32+16 < 2^31), so only ceil(L/4) f64
    multiply-adds remain per element.
    """
    L = limbs.shape[0]
    parts = []
    for g0 in range(0, L, 4):
        gl = limbs[g0].astype(jnp.int32)
        n = 1
        for j in range(g0 + 1, min(g0 + 4, L)):
            gl = (gl << 5) + limbs[j].astype(jnp.int32)
            n += 1
        # last limb in the group has weight 2^-5*(g0+n-1)
        parts.append((gl, 2.0 ** (-5.0 * (g0 + n - 1))))
    out = None
    for gl, w in parts:
        term = gl.astype(jnp.float64) * w
        out = term if out is None else out + term
    return out


def make_ext_apply(H: OperatorSum, split: int | None = None, scale: float = 1.0):
    """Canonical-ext-domain ``apply(t_re, t_im) -> (p_re, p_im)``.

    Inputs/outputs are (EXT_LIMBS, DL, DR) int8 canonical limb stacks of the
    statevector planes; the result is ``scale * H @ t`` exactly to the grid
    truncation (~2^-70 absolute with the guard digits).  Returns
    ``(apply, so)`` like the other split-apply factories.
    """
    so = split_operator(H, split)
    DL, DR = so.DL, so.DR
    L = EXT_LIMBS

    has_diag = bool(np.any(so.diag))
    has_HLre = bool(np.any(so.HL_re))
    has_HLim = bool(np.any(so.HL_im))
    has_HRre = bool(np.any(so.HR_re))
    has_HRim = bool(np.any(so.HR_im))
    A_re = so.cross_re_L.shape[0]
    A_im = so.cross_im_L.shape[0]

    # -- left concat, as in the fused f64 form ----------------------------
    blocks: list[np.ndarray] = []
    off: dict[str, int] = {}
    pos = 0

    def _push(name: str, mat: np.ndarray) -> None:
        nonlocal pos
        off[name] = pos
        blocks.append(mat.reshape(-1, DL))
        pos += mat.reshape(-1, DL).shape[0]

    if has_HLre:
        _push("HLre", so.HL_re * scale)
    if has_HLim:
        _push("HLim", so.HL_im * scale)
    if A_re:
        _push("cre", so.cross_re_L)  # scale folds into the R stacks
    if A_im:
        _push("cim", so.cross_im_L)

    def _pre(mat: np.ndarray):
        return jnp.asarray(ext_split_host(np.ascontiguousarray(mat)))

    Lcat = _pre(np.concatenate(blocks, axis=0)) if blocks else None
    diag_ext = _pre(so.diag * scale) if has_diag else None
    CreRt = (
        _pre(np.transpose(so.cross_re_R * scale, (0, 2, 1)).reshape(A_re * DR, DR))
        if A_re else None
    )
    CimRt = (
        _pre(np.transpose(so.cross_im_R * scale, (0, 2, 1)).reshape(A_im * DR, DR))
        if A_im else None
    )

    rblocks: list[np.ndarray] = []
    roff: dict[str, int] = {}
    rpos = 0
    if has_HRre:
        roff["HRre"] = rpos
        rblocks.append(so.HR_re.T * scale)
        rpos += DR
    if has_HRim:
        roff["HRim"] = rpos
        rblocks.append(so.HR_im.T * scale)
        rpos += DR
    Rcat = _pre(np.concatenate(rblocks, axis=1)) if rblocks else None

    def _slice_rows(dig, name: str, rows: int):
        return jax.lax.dynamic_slice_in_dim(dig, off[name], rows, axis=1)

    def _cross_digits(dig_plane, name: str, A_n: int, Rt):
        """Second stage of one cross bucket for ONE input plane's left
        product digits: carry the Zc slice to canonical, relayout to
        (L, DL, A_n*DR), multiply by the transposed R stack."""
        Zc = _ext_carry_i32(_slice_rows(dig_plane, name, A_n * DL))[:L]
        Zt = jnp.transpose(
            Zc.reshape(L, A_n, DL, DR), (0, 2, 1, 3)
        ).reshape(L, DL, A_n * DR)
        return _product_digits(Zt, Rt, L, A_n * DR)

    def apply(t_re: jnp.ndarray, t_im: jnp.ndarray):
        dig_re = None
        dig_im = None

        def _acc(cur, d):
            return d if cur is None else cur + d

        if has_diag:
            dig_re = _acc(dig_re, _ew_digits(diag_ext, t_re, L))
            dig_im = _acc(dig_im, _ew_digits(diag_ext, t_im, L))
        if Lcat is not None:
            zr = _product_digits(Lcat, t_re, L, DL)  # (L+G, R_total, DR)
            zi = _product_digits(Lcat, t_im, L, DL)
            if has_HLre:
                dig_re = _acc(dig_re, _slice_rows(zr, "HLre", DL))
                dig_im = _acc(dig_im, _slice_rows(zi, "HLre", DL))
            if has_HLim:  # (i * HL_im) term: rotates the planes
                dig_re = _acc(dig_re, -_slice_rows(zi, "HLim", DL))
                dig_im = _acc(dig_im, _slice_rows(zr, "HLim", DL))
            if A_re:
                dig_re = _acc(dig_re, _cross_digits(zr, "cre", A_re, CreRt))
                dig_im = _acc(dig_im, _cross_digits(zi, "cre", A_re, CreRt))
            if A_im:
                dig_re = _acc(dig_re, -_cross_digits(zi, "cim", A_im, CimRt))
                dig_im = _acc(dig_im, _cross_digits(zr, "cim", A_im, CimRt))
        if Rcat is not None:
            wr = _product_digits(t_re, Rcat, L, DR)  # (L+G, DL, rpos)
            wi = _product_digits(t_im, Rcat, L, DR)

            def _cols(dig, name):
                return jax.lax.dynamic_slice_in_dim(dig, roff[name], DR, axis=2)

            if has_HRre:
                dig_re = _acc(dig_re, _cols(wr, "HRre"))
                dig_im = _acc(dig_im, _cols(wi, "HRre"))
            if has_HRim:
                dig_re = _acc(dig_re, -_cols(wi, "HRim"))
                dig_im = _acc(dig_im, _cols(wr, "HRim"))
        return _ext_carry_i32(dig_re)[:L], _ext_carry_i32(dig_im)[:L]

    return apply, so
