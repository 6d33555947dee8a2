"""Split-matmul Hamiltonian apply with int8-LIMB products (MXU native path).

Same mathematical decomposition as :mod:`.split_apply` (left/right Hilbert
split, fused left concat, factored cross bucket) but every matmul runs as
exact int8 limb products (:mod:`.extprec` Ozaki tier) instead of the XLA
f64 software emulation.  Measured motivation (docs/ROUND4.md): on the v5e
the emulated f64 matmul tops out at ~0.60 TMAC/s while the 11x5-bit limb
product reaches 1.86 TMAC/s at the same shapes — and the (9 limbs x 6 bits)
configuration used here cuts the limb-pair dot count from 66 to 45 on top
(54 captured bits >= f64's 53-bit significand either way, so the result is
f64-roundoff grade: each product is EXACT in int32 up to the final f64
diagonal accumulation).

Static operator planes are limb-split ONCE at build time; the statevector
planes (and the cross first-stage products) are split per apply — the
sequential ``n_limbs``-round split is VPU work that must stay small
relative to the MXU products, which is why fewer/wider limbs win here.

i32-overflow budget: every s8xs8->s32 dot needs
``K * 2^(2*limb_bits) * n_limbs < 2^31`` (K = contraction dim).  At
limb_bits=6 that caps K at ~58k — far above any split-apply contraction
(max(DL, A*DR), = 2048 at dim 16384) and checked at build time.

Replaces qt.sesolve (reference: dipolar_ensemble_with_rare.py:653-666) at
bath sizes beyond dense-operator reach, as the arithmetic tier under
dynamics/cheb_step.py (select with ``arithmetic="limb"``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx
from .embed import OperatorSum
from .extprec import _accumulate_products, _limb_split
from .split_apply import split_operator

N_LIMBS = 9
LIMB_BITS = 6  # 9 * 6 = 54 bits >= f64's 53-bit significand


def make_split_apply_limb(
    H: OperatorSum,
    split: int | None = None,
    scale: float = 1.0,
    n_limbs: int = N_LIMBS,
    limb_bits: int = LIMB_BITS,
):
    """Jit-friendly ``apply(psi: Cplx (DL, DR)) -> Cplx`` = ``scale * H @ psi``
    with all matmuls as exact int8 limb products.

    Returns ``(apply, so)`` like :func:`.split_apply.make_split_apply`.
    Values match the f64 apply to f64 roundoff (~1e-15 relative).
    """
    so = split_operator(H, split)
    DL, DR = so.DL, so.DR

    has_diag = bool(np.any(so.diag))
    has_HLre = bool(np.any(so.HL_re))
    has_HLim = bool(np.any(so.HL_im))
    has_HRre = bool(np.any(so.HR_re))
    has_HRim = bool(np.any(so.HR_im))
    A_re = so.cross_re_L.shape[0]
    A_im = so.cross_im_L.shape[0]

    # -- left concat (block rows, live blocks only), as in the fused f64
    #    form: ONE (R, DL) @ (DL, DR) limb product per plane ---------------
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

    for K in (DL, DR, A_re * DR, A_im * DR):
        if K and K * (2 ** (2 * limb_bits)) * n_limbs >= 2**31:
            raise ValueError(
                f"contraction dim {K} overflows i32 at limb_bits={limb_bits}"
            )

    def _prelimb(mat: np.ndarray):
        limbs, s = _limb_split(jnp.asarray(mat), n_limbs, limb_bits)
        return limbs, s

    Lcat = _prelimb(np.concatenate(blocks, axis=0)) if blocks else None
    R_total = pos

    diag = jnp.asarray(so.diag * scale)

    # cross second stage as ONE (DL, A*DR) @ (A*DR, DR) limb product:
    #   out[i,l] = sum_{a,k} Zc[a,i,k] * R[a,l,k]
    # with Zc transposed to (i, a*k) and the R stack to (a*k, l).
    CreRt = (
        _prelimb(np.transpose(so.cross_re_R * scale, (0, 2, 1)).reshape(A_re * DR, DR))
        if A_re else None
    )
    CimRt = (
        _prelimb(np.transpose(so.cross_im_R * scale, (0, 2, 1)).reshape(A_im * DR, DR))
        if A_im else None
    )

    # -- right concat: ONE (DL, DR) @ (DR, rpos) limb product per plane ----
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
    Rcat = _prelimb(np.concatenate(rblocks, axis=1)) if rblocks else None

    def _mm(Apre, b_limbs, b_scale, out_shape):
        A, sa = Apre
        return _accumulate_products(
            A, sa, b_limbs, b_scale, out_shape, n_limbs, limb_bits
        )

    def _mm_right(p_limbs, p_scale, Bpre, out_shape):
        B, sb = Bpre
        return _accumulate_products(
            p_limbs, p_scale, B, sb, out_shape, n_limbs, limb_bits
        )

    def _left_products(p_limbs, p_scale):
        """name -> product block for one statevector plane (pre-split)."""
        Z = _mm(Lcat, p_limbs, p_scale, (R_total, DR))
        out = {}
        if has_HLre:
            out["HLre"] = jax.lax.dynamic_slice_in_dim(Z, off["HLre"], DL)
        if has_HLim:
            out["HLim"] = jax.lax.dynamic_slice_in_dim(Z, off["HLim"], DL)
        for name, A_n, Rt in (("cre", A_re, CreRt), ("cim", A_im, CimRt)):
            if A_n:
                Zc = jax.lax.dynamic_slice_in_dim(Z, off[name], A_n * DL)
                Zt = jnp.transpose(Zc.reshape(A_n, DL, DR), (1, 0, 2)).reshape(
                    DL, A_n * DR
                )
                zl, zs = _limb_split(Zt, n_limbs, limb_bits)
                out[name] = _mm_right(zl, zs, Rt, (DL, DR))
        return out

    def apply(psi: Cplx) -> Cplx:
        pr, pi = psi.re, psi.im
        out_re = diag * pr if has_diag else jnp.zeros_like(pr)
        out_im = diag * pi if has_diag else jnp.zeros_like(pi)
        prl, prs = _limb_split(pr, n_limbs, limb_bits)
        pil, pis = _limb_split(pi, n_limbs, limb_bits)
        if Lcat is not None:
            zr = _left_products(prl, prs)
            zi = _left_products(pil, pis)
            if has_HLre:
                out_re = out_re + zr["HLre"]
                out_im = out_im + zi["HLre"]
            if has_HLim:
                out_re = out_re - zi["HLim"]
                out_im = out_im + zr["HLim"]
            if A_re:
                out_re = out_re + zr["cre"]
                out_im = out_im + zi["cre"]
            if A_im:
                out_re = out_re - zi["cim"]
                out_im = out_im + zr["cim"]
        if Rcat is not None:
            wr = _mm_right(prl, prs, Rcat, (DL, rpos))
            wi = _mm_right(pil, pis, Rcat, (DL, rpos))
            if has_HRre:
                out_re = out_re + jax.lax.dynamic_slice_in_dim(
                    wr, roff["HRre"], DR, axis=1)
                out_im = out_im + jax.lax.dynamic_slice_in_dim(
                    wi, roff["HRre"], DR, axis=1)
            if has_HRim:
                out_re = out_re - jax.lax.dynamic_slice_in_dim(
                    wi, roff["HRim"], DR, axis=1)
                out_im = out_im + jax.lax.dynamic_slice_in_dim(
                    wr, roff["HRim"], DR, axis=1)
        return Cplx(out_re, out_im)

    return apply, so
