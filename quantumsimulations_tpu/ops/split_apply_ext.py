"""Split-matmul apply in a FIXED-GRID limb domain (int-native path).

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
  * the apply takes canonical limbs and returns canonical limbs — int8 MXU
    dots into int32 digit stacks, summed across the four buckets
    (diag / left / cross / right) ON the shared digit grid, ONE carry
    cascade at the end;
  * Chebyshev T_k entries are bounded (|T_k(H/lam) psi| <= 1 elementwise
    norm), so the fixed grid (|x| < 2^GRID_BITS) always holds
    mid-recurrence (2*P - T_prev <= 3);
  * only the trace ACCUMULATOR lives in f64 (its partial sums reach
    sum_k |c_k| ~ O(sqrt(lam dt)) >> grid top): per term one grouped
    int32-Horner limb evaluation and a scalar f64 multiply-add.

Grid: limb j (int8) carries weight 2^(-GRID_BITS * j); with the grid
exponent equal to the limb width, the product of limbs (j, i) lands
exactly on digit j + i (the alignment trick of ops/extprec.py, which uses
5-bit limbs x 15 = 75 bits for the expm SQUARING chain's 2^17 error
amplification).  Chebyshev stepping amplifies per-apply error only as a
~random walk over the 7.4e7 applies of a production trace, so this tier
defaults to 6-bit limbs x 10 = 60 bits (resolution 2^-54, f64-grade
per-apply error) — 2x fewer int8 MACs than the 15x5 grid for the same
delivered precision.  Measured on the v5e at dim 16384: the 15x5 grid ran
0.77 steps/s vs f64's 0.601 (docs/ROUND4.md).

Replaces qt.sesolve (reference: dipolar_ensemble_with_rare.py:653-666)
beyond dense reach, as ``arithmetic="ext"`` under dynamics/cheb_step.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .embed import OperatorSum
from .split_apply import split_operator

GRID_BITS = 6
GRID_LIMBS = 10  # 10 * 6 = 60 captured bits; resolution 2^-54 for |x| <= 1
GRID_GUARD = 2  # extra product diagonals feeding carries up the cascade


@dataclass(frozen=True)
class GridOps:
    """Limb-domain primitives bound to one (bits, limbs) grid."""

    bits: int
    limbs: int
    split: Callable  # f64 -> canonical int8 limbs (device)
    carry: Callable  # int32 digit stack -> canonical int8 limbs
    val: Callable  # canonical limbs -> f64 (grouped int32 Horner)


def _split_host(x: np.ndarray, b: int, L: int) -> np.ndarray:
    """Host split: f64 -> (L, ...) int8 canonical limbs on the 2^b grid."""
    maxabs = float(np.abs(x).max()) if x.size else 0.0
    assert maxabs < 2.0**b, (
        f"grid domain violated: max|x| = {maxabs} >= 2^{b}"
    )
    limbs = np.empty((L,) + x.shape, np.int8)
    r = np.array(x, np.float64)
    l = np.empty_like(r)
    for j in range(L):
        np.rint(r, out=l)
        limbs[j] = l
        r -= l
        r *= float(2**b)
    return limbs


def _make_grid_ops(b: int, L: int) -> GridOps:
    half = 1 << (b - 1)

    def split(x: jnp.ndarray) -> jnp.ndarray:
        limbs = []
        r = x
        for _ in range(L):
            l = jnp.rint(r)
            limbs.append(l.astype(jnp.int8))
            r = (r - l) * float(2**b)
        return jnp.stack(limbs)

    def carry(d: jnp.ndarray) -> jnp.ndarray:
        """Exact carry cascade on int32 digits -> canonical int8 limbs
        (nearest, ties toward +inf — same contract as extprec's i32 carry)."""
        n = d.shape[0]
        limbs = [None] * n
        c = jnp.zeros_like(d[0])
        for j in range(n - 1, 0, -1):
            t = d[j] + c
            c = (t + half) >> b
            limbs[j] = (t - (c << b)).astype(jnp.int8)
        limbs[0] = (d[0] + c).astype(jnp.int8)
        return jnp.stack(limbs)

    def val(limbs: jnp.ndarray) -> jnp.ndarray:
        """Canonical limbs -> f64 via int32 group Horner: only ceil(L/g)
        emulated-f64 multiply-adds per element instead of L."""
        n = limbs.shape[0]
        # group size: Horner partial sums must stay exact in int32
        # (|l| <= 2^b canonical incl. the fold into limb 0)
        g = max(1, (31 - (b + 1)) // b)
        out = None
        for g0 in range(0, n, g):
            gl = limbs[g0].astype(jnp.int32)
            e = g0
            for j in range(g0 + 1, min(g0 + g, n)):
                gl = (gl << b) + limbs[j].astype(jnp.int32)
                e = j
            term = gl.astype(jnp.float64) * (2.0 ** (-float(b * e)))
            out = term if out is None else out + term
        return out

    return GridOps(bits=b, limbs=L, split=split, carry=carry, val=val)


def _product_digits(a, b_st, L: int, K: int, bits: int):
    """Digit stacks of (limb a) @ (limb b): (L+GUARD, M, N) int32, NO carry.

    Real x real — complex assembly happens bucket-wise in the caller (every
    static plane is real by i-folding).  Exactness: canonical limbs are
    <= 2^(bits-1) (limb 0 <= ~2^bits after carry folds), so each dot is
    <= K * 2^(2*bits) and a diagonal sums <= L of those — asserted i32.
    """
    assert K * (2 ** (2 * bits)) * L < 2**31, "i32 would overflow"
    digits = []
    for s in range(L + GRID_GUARD):
        acc = None
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            m = jnp.dot(a[j], b_st[i], preferred_element_type=jnp.int32)
            acc = m if acc is None else acc + m
        digits.append(acc)
    return jnp.stack(digits)


def _ew_digits(d, t, L: int):
    """Digit stacks of (limb diag d) * (limb t), elementwise: i32."""
    digits = []
    for s in range(L + GRID_GUARD):
        acc = None
        for j in range(max(0, s - L + 1), min(s + 1, L)):
            i = s - j
            m = d[j].astype(jnp.int32) * t[i].astype(jnp.int32)
            acc = m if acc is None else acc + m
        digits.append(acc)
    return jnp.stack(digits)


def make_ext_apply(
    H: OperatorSum,
    split: int | None = None,
    scale: float = 1.0,
    grid_bits: int = GRID_BITS,
    grid_limbs: int = GRID_LIMBS,
):
    """Limb-domain ``apply(t_re, t_im) -> (p_re, p_im)``.

    Inputs/outputs are (grid_limbs, DL, DR) int8 canonical limb stacks of
    the statevector planes; the result is ``scale * H @ t`` exact to the
    grid truncation.  Returns ``(apply, so, ops)`` with the
    :class:`GridOps` the caller needs to split/evaluate states on the SAME
    grid.
    """
    so = split_operator(H, split)
    DL, DR = so.DL, so.DR
    b = grid_bits
    L = grid_limbs
    ops = _make_grid_ops(b, L)

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
        return jnp.asarray(_split_host(np.ascontiguousarray(mat), b, L))

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
        Zc = ops.carry(_slice_rows(dig_plane, name, A_n * DL))[:L]
        Zt = jnp.transpose(
            Zc.reshape(L, A_n, DL, DR), (0, 2, 1, 3)
        ).reshape(L, DL, A_n * DR)
        return _product_digits(Zt, Rt, L, A_n * DR, b)

    def apply(t_re: jnp.ndarray, t_im: jnp.ndarray):
        dig_re = None
        dig_im = None

        def _acc(cur, d):
            return d if cur is None else cur + d

        if has_diag:
            dig_re = _acc(dig_re, _ew_digits(diag_ext, t_re, L))
            dig_im = _acc(dig_im, _ew_digits(diag_ext, t_im, L))
        if Lcat is not None:
            zr = _product_digits(Lcat, t_re, L, DL, b)  # (L+G, R_total, DR)
            zi = _product_digits(Lcat, t_im, L, DL, b)
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
            wr = _product_digits(t_re, Rcat, L, DR, b)  # (L+G, DL, rpos)
            wi = _product_digits(t_im, Rcat, L, DR, b)

            def _cols(dig, name):
                return jax.lax.dynamic_slice_in_dim(dig, roff[name], DR, axis=2)

            if has_HRre:
                dig_re = _acc(dig_re, _cols(wr, "HRre"))
                dig_im = _acc(dig_im, _cols(wi, "HRre"))
            if has_HRim:
                dig_re = _acc(dig_re, -_cols(wi, "HRim"))
                dig_im = _acc(dig_im, _cols(wr, "HRim"))
        return ops.carry(dig_re)[:L], ops.carry(dig_im)[:L]

    return apply, so, ops


def make_ext_apply_pallas(
    H: OperatorSum,
    split: int | None = None,
    scale: float = 1.0,
    grid_bits: int = GRID_BITS,
    grid_limbs: int = GRID_LIMBS,
    interpret: bool | None = None,
):
    """Limb-domain apply through the fused Pallas kernel (tier "extp").

    Same contract as :func:`make_ext_apply` — ``apply(t_re, t_im)`` maps
    canonical (L, DL, DR) int8 limb stacks to the same — but every product
    bucket runs through :func:`..limb_kernels.limb_matmul_canon`: digit
    accumulation + carry fused in VMEM, canonical int8 as the only HBM
    traffic, and the cross relayout folded into the kernel's output index
    map (no int8 transpose).  Values match the XLA tier to the grid
    resolution (per-bucket vs post-sum truncation differ below 2^-54).
    """
    from .limb_kernels import limb_matmul_canon

    so = split_operator(H, split)
    DL, DR = so.DL, so.DR
    b = grid_bits
    L = grid_limbs
    ops = _make_grid_ops(b, L)

    has_diag = bool(np.any(so.diag))
    has_HLre = bool(np.any(so.HL_re))
    has_HLim = bool(np.any(so.HL_im))
    has_HRre = bool(np.any(so.HR_re))
    has_HRim = bool(np.any(so.HR_im))
    A_re = so.cross_re_L.shape[0]
    A_im = so.cross_im_L.shape[0]

    def _pre(mat: np.ndarray):
        return jnp.asarray(_split_host(np.ascontiguousarray(mat), b, L))

    # HL bucket: both planes stacked on the M axis -> one kernel call
    hl_blocks = []
    hl_off = {}
    if has_HLre:
        hl_off["HLre"] = len(hl_blocks) * DL
        hl_blocks.append(so.HL_re * scale)
    if has_HLim:
        hl_off["HLim"] = len(hl_blocks) * DL
        hl_blocks.append(so.HL_im * scale)
    HLcat = _pre(np.concatenate(hl_blocks, axis=0)) if hl_blocks else None

    # cross buckets: L-operand stacked (A * DL, DL); R stacks flattened
    # (A * DR, DR) transposed, scale folded into R
    CreL = _pre(so.cross_re_L.reshape(A_re * DL, DL)) if A_re else None
    CreRt = (
        _pre(np.transpose(so.cross_re_R * scale, (0, 2, 1)).reshape(A_re * DR, DR))
        if A_re else None
    )
    CimL = _pre(so.cross_im_L.reshape(A_im * DL, DL)) if A_im else None
    CimRt = (
        _pre(np.transpose(so.cross_im_R * scale, (0, 2, 1)).reshape(A_im * DR, DR))
        if A_im else None
    )

    diag_ext = _pre(so.diag * scale) if has_diag else None

    rblocks = []
    roff = {}
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

    S = L + GRID_GUARD
    kmm = partial(limb_matmul_canon, bits=b, interpret=interpret)

    def _cross_one(Lst, Rt, A_n, t_plane):
        """One cross bucket for one input plane -> canonical (L, DL, DR)."""
        # transpose_out: M-tile a's (DL, DR) product lands at columns
        # [a*DR, (a+1)*DR) -> the (L, DL, A*DR) second-stage layout directly
        Z = kmm(Lst, t_plane, tm=DL, transpose_out=True)
        return kmm(Z, Rt)

    def apply(t_re: jnp.ndarray, t_im: jnp.ndarray):
        dig_re = jnp.zeros((S, DL, DR), jnp.int32)
        dig_im = jnp.zeros((S, DL, DR), jnp.int32)

        def _addc(dig, can, sign=1):
            """Accumulate a canonical (L, ...) stack onto the digit grid."""
            return dig.at[:L].add(sign * can.astype(jnp.int32))

        if has_diag:
            dig_re = dig_re + _ew_digits(diag_ext, t_re, L)
            dig_im = dig_im + _ew_digits(diag_ext, t_im, L)
        if HLcat is not None:
            bcat = jnp.concatenate([t_re, t_im], axis=2)  # (L, DL, 2*DR)
            z = kmm(HLcat, bcat)  # (L, n_hl*DL, 2*DR)
            if has_HLre:
                o = hl_off["HLre"]
                dig_re = _addc(dig_re, z[:, o:o + DL, :DR])
                dig_im = _addc(dig_im, z[:, o:o + DL, DR:])
            if has_HLim:  # (i * HL_im) term rotates the planes
                o = hl_off["HLim"]
                dig_re = _addc(dig_re, z[:, o:o + DL, DR:], -1)
                dig_im = _addc(dig_im, z[:, o:o + DL, :DR])
        if A_re:
            dig_re = _addc(dig_re, _cross_one(CreL, CreRt, A_re, t_re))
            dig_im = _addc(dig_im, _cross_one(CreL, CreRt, A_re, t_im))
        if A_im:
            dig_re = _addc(dig_re, _cross_one(CimL, CimRt, A_im, t_im), -1)
            dig_im = _addc(dig_im, _cross_one(CimL, CimRt, A_im, t_re))
        if Rcat is not None:
            acat = jnp.concatenate([t_re, t_im], axis=1)  # (L, 2*DL, DR)
            w = kmm(acat, Rcat)  # (L, 2*DL, rpos)
            if has_HRre:
                o = roff["HRre"]
                dig_re = _addc(dig_re, w[:, :DL, o:o + DR])
                dig_im = _addc(dig_im, w[:, DL:, o:o + DR])
            if has_HRim:
                o = roff["HRim"]
                dig_re = _addc(dig_re, w[:, DL:, o:o + DR], -1)
                dig_im = _addc(dig_im, w[:, :DL, o:o + DR])
        return ops.carry(dig_re)[:L], ops.carry(dig_im)[:L]

    return apply, so, ops


def make_ext_apply_sharded(
    H: OperatorSum,
    axis: str,
    n_shards: int,
    split: int | None = None,
    scale: float = 1.0,
    grid_bits: int = GRID_BITS,
    grid_limbs: int = GRID_LIMBS,
):
    """DR-column-sharded limb-domain apply, to run INSIDE ``shard_map``.

    The statevector plane (DL, DR) is sharded on its DR axis over mesh axis
    ``axis`` (DR must divide by ``n_shards``).  Communication per apply:

      * diag + left products: fully LOCAL (contraction dim DL is unsharded);
      * cross second stage and right bucket contract over the GLOBAL DR
        axis: each device computes its k-local digit partials for ALL
        output columns, carries them to canonical (bounding each limb at
        ~2^bits so the cross-device sum cannot overflow i32), and ONE
        ``lax.psum`` of the int8-ranged i32 stacks — value-exact integer
        collectives, no f64 rounding on the wire — then slices its own
        output columns.

    Returns ``(apply_local, so, ops)``; ``apply_local(t_re, t_im)`` maps
    (L, DL, DR/n_shards) canonical limbs -> same, matching the single-chip
    `make_ext_apply` exactly (same digits after the final carry).
    """
    so = split_operator(H, split)
    DL, DR = so.DL, so.DR
    assert DR % n_shards == 0, (DR, n_shards)
    DRl = DR // n_shards
    b = grid_bits
    L = grid_limbs
    ops = _make_grid_ops(b, L)

    has_diag = bool(np.any(so.diag))
    has_HLre = bool(np.any(so.HL_re))
    has_HLim = bool(np.any(so.HL_im))
    has_HRre = bool(np.any(so.HR_re))
    has_HRim = bool(np.any(so.HR_im))
    A_re = so.cross_re_L.shape[0]
    A_im = so.cross_im_L.shape[0]

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
        _push("cre", so.cross_re_L)
    if A_im:
        _push("cim", so.cross_im_L)

    def _pre(mat: np.ndarray):
        return jnp.asarray(_split_host(np.ascontiguousarray(mat), b, L))

    Lcat = _pre(np.concatenate(blocks, axis=0)) if blocks else None
    diag_ext = _pre(so.diag * scale) if has_diag else None
    # cross R stacks kept UNFLATTENED (L, A, DR, DR): the k-contraction
    # slice per device is a dynamic_slice on axis 2
    CreR4 = (
        _pre(np.transpose(so.cross_re_R * scale, (0, 2, 1)))  # (A, DRk, DRout)
        if A_re else None
    )
    CimR4 = (
        _pre(np.transpose(so.cross_im_R * scale, (0, 2, 1)))
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

    def _psum_canonical(dig):
        """Local digits -> canonical -> exact integer psum -> canonical.

        Carrying BEFORE the collective bounds each limb at ~2^bits, so the
        sum over n_shards devices stays exact in i32; carrying after
        renormalizes.  Value = sum of local partial values, exactly.
        """
        can = ops.carry(dig)  # (L+G, ...) int8 canonical
        tot = jax.lax.psum(can.astype(jnp.int32), axis)
        return tot

    def apply_local(t_re: jnp.ndarray, t_im: jnp.ndarray):
        k0 = jax.lax.axis_index(axis) * DRl
        dig_re = None
        dig_im = None

        def _acc(cur, d):
            return d if cur is None else cur + d

        if has_diag:
            dloc = jax.lax.dynamic_slice_in_dim(diag_ext, k0, DRl, axis=2)
            dig_re = _acc(dig_re, _ew_digits(dloc, t_re, L))
            dig_im = _acc(dig_im, _ew_digits(dloc, t_im, L))

        cross_re = cross_im = None
        if Lcat is not None:
            zr = _product_digits(Lcat, t_re, L, DL, b)  # (L+G, R_total, DRl)
            zi = _product_digits(Lcat, t_im, L, DL, b)
            if has_HLre:
                dig_re = _acc(dig_re, _slice_rows(zr, "HLre", DL))
                dig_im = _acc(dig_im, _slice_rows(zi, "HLre", DL))
            if has_HLim:
                dig_re = _acc(dig_re, -_slice_rows(zi, "HLim", DL))
                dig_im = _acc(dig_im, _slice_rows(zr, "HLim", DL))

            def _cross_partial(dig_plane, name, A_n, R4):
                # k-local second stage for ALL output columns
                Zc = ops.carry(_slice_rows(dig_plane, name, A_n * DL))[:L]
                Zt = jnp.transpose(
                    Zc.reshape(L, A_n, DL, DRl), (0, 2, 1, 3)
                ).reshape(L, DL, A_n * DRl)
                Rk = jax.lax.dynamic_slice_in_dim(
                    R4, k0, DRl, axis=2
                ).reshape(L, A_n * DRl, DR)
                return _product_digits(Zt, Rk, L, A_n * DRl, b)

            if A_re:
                cross_re = _acc(cross_re, _cross_partial(zr, "cre", A_re, CreR4))
                cross_im = _acc(cross_im, _cross_partial(zi, "cre", A_re, CreR4))
            if A_im:
                cross_re = _acc(
                    cross_re, -_cross_partial(zi, "cim", A_im, CimR4))
                cross_im = _acc(
                    cross_im, _cross_partial(zr, "cim", A_im, CimR4))

        right_re = right_im = None
        if Rcat is not None:
            Rk = jax.lax.dynamic_slice_in_dim(Rcat, k0, DRl, axis=1)
            right_re = _product_digits(t_re, Rk, L, DRl, b)  # (L+G, DL, rpos)
            right_im = _product_digits(t_im, Rk, L, DRl, b)

        # ---- one fused collective: concat the global-contraction partials,
        # carry->psum->slice own columns ----
        parts_re = [p for p in (cross_re, right_re) if p is not None]
        parts_im = [p for p in (cross_im, right_im) if p is not None]
        if parts_re:
            glob_re = _psum_canonical(jnp.concatenate(parts_re, axis=2))
            glob_im = _psum_canonical(jnp.concatenate(parts_im, axis=2))

            def _take(glob, start):
                return jax.lax.dynamic_slice_in_dim(glob, start, DRl, axis=2)

            col = 0
            if cross_re is not None:
                dig_re = _acc(dig_re, _take(glob_re, col + k0))
                dig_im = _acc(dig_im, _take(glob_im, col + k0))
                col += DR
            if right_re is not None:
                if has_HRre:
                    dig_re = _acc(dig_re, _take(glob_re, col + roff["HRre"] + k0))
                    dig_im = _acc(dig_im, _take(glob_im, col + roff["HRre"] + k0))
                if has_HRim:
                    dig_re = _acc(
                        dig_re, -_take(glob_im, col + roff["HRim"] + k0))
                    dig_im = _acc(
                        dig_im, _take(glob_re, col + roff["HRim"] + k0))
        return ops.carry(dig_re)[:L], ops.carry(dig_im)[:L]

    return apply_local, so, ops
