"""MXU-native Hamiltonian apply via a left/right Hilbert-space split.

The matrix-free term applies in :mod:`.embed` execute each product term as
per-site tensor contractions (einsum) or bit-flip reverses.  Both compile,
but on the TPU backend they run orders of magnitude below the memory bound
at large dims (measured 139 H-applies/s at dim 16384: the per-term
reshape/flip ops lower to lane/sublane shuffles the hardware hates).  This
module rewrites H @ psi so that ALL the work is small dense matmuls — the
shape the MXU is built for.

Factor the n-site chain into a LEFT group (sites < split) and a RIGHT group
(sites >= split) and view the statevector as a (DL, DR) matrix Psi with
DL = prod(dims[:split]), DR = prod(dims[split:]).  Every product term then
falls into one of four buckets:

  * purely diagonal terms        ->  one precomputed (DL, DR) table D:
                                     out += D * Psi          (elementwise)
  * terms entirely on the left   ->  H_L (DL x DL) dense:
                                     out += H_L @ Psi        (one matmul)
  * terms entirely on the right  ->  H_R (DR x DR) dense:
                                     out += Psi @ H_R^T      (one matmul)
  * cross terms L (x) R          ->  out += L_a @ Psi @ R_a^T

The cross bucket is the potentially-large one (O(n^2) dipolar pair terms),
but it FACTORS BY LEFT OPERATOR: sum_{i in L, j in R} b_ij X_i (x) X_j =
sum_{i in L} X_i (x) (sum_j b_ij X_j), so the dipolar model needs only
2 * n_left stacked products, not n_left * n_right.  Each product of x/y/z
factors is (i^k) * (real matrix) — the i's are tracked and folded so the
stacked planes are REAL, halving the matmul count: the whole cross bucket is
four real batched matmuls per apply (two per statevector plane).

At dim 16384 (14 spins, 7+7 split) one H apply is ~2.7e8 real f64 flops in
MXU-shaped (128 x 128) matmuls — the engine for Chebyshev propagation beyond
dense-operator reach (dynamics/cheb_step.py), replacing qt.sesolve
(reference: dipolar_ensemble_with_rare.py:653-666) at bath sizes QuTiP
cannot reach.  Fully generic over mixed local dims (spin-3/2 rare included),
unlike the qubit-only flip apply (embed.py::make_qubit_flip_apply).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx
from .embed import OperatorSum, ProductTerm, local_op


def _subchain_real(dims: tuple[int, ...], factors) -> tuple[np.ndarray, int]:
    """Real matrix + i-phase exponent of prod(op) over the sub-chain dims.

    factors: iterable of (local_site_index, opname) with indices relative to
    the sub-chain.  Equals i^phase * (returned real matrix).
    """
    mats = []
    n_y = 0
    fac = dict(factors)
    for k, d in enumerate(dims):
        if k in fac:
            op = local_op(d, fac[k])
            if fac[k] == "y":
                n_y += 1
                op = np.real(op / 1j)  # y / i is real
            else:
                op = np.real(op)  # x, z, i are real
        else:
            op = np.eye(d)
        mats.append(op)
    M = mats[0]
    for m in mats[1:]:
        M = np.kron(M, m)
    return M, n_y


@dataclass(frozen=True)
class SplitOperator:
    """Host-side split decomposition of an OperatorSum (all planes real)."""

    dims: tuple[int, ...]
    split: int
    DL: int
    DR: int
    diag: np.ndarray  # (DL, DR) real
    HL_re: np.ndarray  # (DL, DL)
    HL_im: np.ndarray
    HR_re: np.ndarray  # (DR, DR)
    HR_im: np.ndarray
    # cross stacks; term = phase * L (x) R with L/R REAL and phase in {1, i}
    # (the -1/-i signs are folded into R).  Shapes (A, DL, DL) / (A, DR, DR).
    cross_re_L: np.ndarray
    cross_re_R: np.ndarray
    cross_im_L: np.ndarray
    cross_im_R: np.ndarray

    def to_dense(self) -> np.ndarray:
        """Reassemble the full dense matrix (tests)."""
        dim = self.DL * self.DR
        H = np.zeros((dim, dim), dtype=np.complex128)
        H[np.arange(dim), np.arange(dim)] = self.diag.reshape(-1)
        HL = self.HL_re + 1j * self.HL_im
        HR = self.HR_re + 1j * self.HR_im
        H += np.kron(HL, np.eye(self.DR))
        H += np.kron(np.eye(self.DL), HR)
        for a in range(self.cross_re_L.shape[0]):
            H += np.kron(self.cross_re_L[a], self.cross_re_R[a])
        for a in range(self.cross_im_L.shape[0]):
            H += 1j * np.kron(self.cross_im_L[a], self.cross_im_R[a])
        return H


def default_split(dims: tuple[int, ...]) -> int:
    """Split point balancing DL ~ DR (matmul cost ~ A*DL*DR*(DL+DR))."""
    n = len(dims)
    best, best_cost = 1, float("inf")
    for s in range(1, n):
        DL = int(np.prod(dims[:s], dtype=np.int64))
        DR = int(np.prod(dims[s:], dtype=np.int64))
        cost = DL * DR * (DL + DR)
        if cost < best_cost:
            best, best_cost = s, cost
    return best


def split_operator(H: OperatorSum, split: int | None = None) -> SplitOperator:
    """Decompose ``H`` about ``split`` (sites < split are the left group)."""
    dims = H.dims
    n = len(dims)
    if split is None:
        split = default_split(dims)
    if not (1 <= split <= n - 1):
        raise ValueError(f"split must be in [1, {n - 1}], got {split}")
    ldims = dims[:split]
    rdims = dims[split:]
    DL = int(np.prod(ldims, dtype=np.int64))
    DR = int(np.prod(rdims, dtype=np.int64))

    diag = H.diagonal_part().reshape(DL, DR)
    HL = np.zeros((DL, DL), dtype=np.complex128)
    HR = np.zeros((DR, DR), dtype=np.complex128)
    # cross accumulation keyed by (left factor signature, total i-phase mod 2)
    # -> [L real matrix (unit coeff), accumulated R real matrix]; the sign
    # (-1)^(phase // 2) folds into R so only phase mod 2 (real vs i) remains.
    cross: dict[tuple, list[np.ndarray]] = {}
    for term in H.offdiagonal_terms():
        lf = tuple((s, op) for s, op in term.factors if s < split)
        rf = tuple((s - split, op) for s, op in term.factors if s >= split)
        if not rf:
            M, n_y = _subchain_real(ldims, lf)
            HL += term.coeff * (1j**n_y) * M
        elif not lf:
            M, n_y = _subchain_real(rdims, rf)
            HR += term.coeff * (1j**n_y) * M
        else:
            L, py = _subchain_real(ldims, lf)
            R, qy = _subchain_real(rdims, rf)
            phase = (py + qy) % 4
            sign = -1.0 if phase >= 2 else 1.0
            key = (lf, phase % 2)
            acc = cross.get(key)
            if acc is None:
                cross[key] = [L, sign * term.coeff * R]
            else:
                acc[1] = acc[1] + sign * term.coeff * R
    re_L, re_R, im_L, im_R = [], [], [], []
    for (lf, par), (L, R) in sorted(cross.items()):
        if not np.any(R):
            continue
        (re_L if par == 0 else im_L).append(L)
        (re_R if par == 0 else im_R).append(R)

    def _stack(mats, d):
        return np.stack(mats) if mats else np.zeros((0, d, d))

    return SplitOperator(
        dims=dims, split=split, DL=DL, DR=DR, diag=diag,
        HL_re=np.real(HL), HL_im=np.imag(HL),
        HR_re=np.real(HR), HR_im=np.imag(HR),
        cross_re_L=_stack(re_L, DL), cross_re_R=_stack(re_R, DR),
        cross_im_L=_stack(im_L, DL), cross_im_R=_stack(im_R, DR),
    )


def make_split_apply(
    H: OperatorSum,
    split: int | None = None,
    scale: float = 1.0,
    fused: bool = True,
):
    """Jit-friendly ``apply(psi: Cplx (DL, DR)) -> Cplx`` computing
    ``scale * H @ psi`` entirely in dense matmuls.

    ``scale`` (e.g. 1/lambda for Chebyshev) is folded into the precomputed
    matrices — free at apply time.  Returns ``(apply, so)`` with the
    :class:`SplitOperator` for shape/metadata access.  Zero matrix planes
    (e.g. a real H_L, or an empty imaginary cross stack) are skipped at
    trace time, so the compiled program only contains live matmuls.

    ``fused=True`` (default) concatenates every left-acting matrix (H_L
    planes + all cross L stacks) into ONE (R, DL) operand and both H_R
    planes into one (DR, 2*DR) operand, and contracts each cross bucket's
    second stage as a single two-axis dot_general — ~6 MXU dots per apply
    instead of ~4 + 4*A tiny ones.  Same values to f64 roundoff; measured
    ~2x on the v5e at dim 16384 (the unfused form is latency-bound on the
    per-dot dispatch of 128^3 matmuls).
    """
    if fused:
        return _make_split_apply_fused(H, split, scale)
    so = split_operator(H, split)
    diag = jnp.asarray(so.diag * scale)
    HLre = jnp.asarray(so.HL_re * scale)
    HLim = jnp.asarray(so.HL_im * scale)
    HRreT = jnp.asarray(so.HR_re.T * scale)
    HRimT = jnp.asarray(so.HR_im.T * scale)
    CreL = jnp.asarray(so.cross_re_L)
    CreR = jnp.asarray(so.cross_re_R * scale)
    CimL = jnp.asarray(so.cross_im_L)
    CimR = jnp.asarray(so.cross_im_R * scale)

    has_diag = bool(np.any(so.diag))
    has_HLre = bool(np.any(so.HL_re))
    has_HLim = bool(np.any(so.HL_im))
    has_HRre = bool(np.any(so.HR_re))
    has_HRim = bool(np.any(so.HR_im))
    has_cre = so.cross_re_L.shape[0] > 0
    has_cim = so.cross_im_L.shape[0] > 0

    def _cross(Lst, Rst, plane):
        # sum_a L_a @ plane @ R_a^T as two batched MXU matmuls
        Z = jnp.einsum("aij,jk->aik", Lst, plane)
        return jnp.einsum("aik,alk->il", Z, Rst)

    def apply(psi: Cplx) -> Cplx:
        pr, pi = psi.re, psi.im
        out_re = diag * pr if has_diag else jnp.zeros_like(pr)
        out_im = diag * pi if has_diag else jnp.zeros_like(pi)
        if has_HLre:
            out_re = out_re + HLre @ pr
            out_im = out_im + HLre @ pi
        if has_HLim:
            out_re = out_re - HLim @ pi
            out_im = out_im + HLim @ pr
        if has_HRre:
            out_re = out_re + pr @ HRreT
            out_im = out_im + pi @ HRreT
        if has_HRim:
            out_re = out_re - pi @ HRimT
            out_im = out_im + pr @ HRimT
        if has_cre:  # real cross stack: planes independent
            out_re = out_re + _cross(CreL, CreR, pr)
            out_im = out_im + _cross(CreL, CreR, pi)
        if has_cim:  # i * (L (x) R): rotates the planes
            out_re = out_re - _cross(CimL, CimR, pi)
            out_im = out_im + _cross(CimL, CimR, pr)
        return Cplx(out_re, out_im)

    return apply, so


def _make_split_apply_fused(H: OperatorSum, split: int | None, scale: float):
    """Fused form of :func:`make_split_apply` (see its docstring).

    Left concat layout (block rows of one (R, DL) matrix, live blocks only):
        [HL_re; HL_im; cross_re_L (A blocks); cross_im_L (A' blocks)]
    so ONE ``Lcat @ plane`` matmul yields every left-product this apply
    needs; the cross second stages then contract (a, k) in one dot_general
    against the (A, DR, DR) R stacks.  The right bucket is one
    ``plane @ [HR_re^T | HR_im^T]`` matmul.  Scale folds into the
    right/diag/R-stack side so each product is scaled exactly once.
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

    # -- left concat + block offsets -------------------------------------
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
    Lcat = jnp.asarray(np.concatenate(blocks, axis=0)) if blocks else None

    diag = jnp.asarray(so.diag * scale)
    CreR = jnp.asarray(so.cross_re_R * scale)
    CimR = jnp.asarray(so.cross_im_R * scale)

    # -- right concat -----------------------------------------------------
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
    Rcat = jnp.asarray(np.concatenate(rblocks, axis=1)) if rblocks else None

    def _left_products(plane):
        """dict name -> product block for one statevector plane."""
        Z = Lcat @ plane  # (R, DR)
        out = {}
        if has_HLre:
            out["HLre"] = jax.lax.dynamic_slice_in_dim(Z, off["HLre"], DL)
        if has_HLim:
            out["HLim"] = jax.lax.dynamic_slice_in_dim(Z, off["HLim"], DL)
        if A_re:
            Zc = jax.lax.dynamic_slice_in_dim(Z, off["cre"], A_re * DL)
            # sum_a (L_a @ plane) @ R_a^T: contract (a, k) in one dot
            out["cre"] = jnp.einsum(
                "aik,alk->il", Zc.reshape(A_re, DL, DR), CreR
            )
        if A_im:
            Zc = jax.lax.dynamic_slice_in_dim(Z, off["cim"], A_im * DL)
            out["cim"] = jnp.einsum(
                "aik,alk->il", Zc.reshape(A_im, DL, DR), CimR
            )
        return out

    def apply(psi: Cplx) -> Cplx:
        pr, pi = psi.re, psi.im
        out_re = diag * pr if has_diag else jnp.zeros_like(pr)
        out_im = diag * pi if has_diag else jnp.zeros_like(pi)
        if Lcat is not None:
            zr = _left_products(pr)
            zi = _left_products(pi)
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
            wr = pr @ Rcat  # (DL, rpos)
            wi = pi @ Rcat
            if has_HRre:
                rr = jax.lax.dynamic_slice_in_dim(wr, roff["HRre"], DR, axis=1)
                ri = jax.lax.dynamic_slice_in_dim(wi, roff["HRre"], DR, axis=1)
                out_re = out_re + rr
                out_im = out_im + ri
            if has_HRim:
                sr = jax.lax.dynamic_slice_in_dim(wr, roff["HRim"], DR, axis=1)
                si = jax.lax.dynamic_slice_in_dim(wi, roff["HRim"], DR, axis=1)
                out_re = out_re - si
                out_im = out_im + sr
        return Cplx(out_re, out_im)

    return apply, so
