"""Operator IR: sums of tensor-product terms over a mixed-dimension spin chain.

Instead of materializing Kronecker chains of QuTiP ``Qobj``s (reference:
dipolar_ensemble_with_rare.py:37-52), operators are kept as a light IR — a sum
of :class:`ProductTerm`s, each a scalar coefficient times single-site operator
factors.  The IR supports three executions:

  * ``to_dense()``        — host-side numpy complex128 assembly (oracle /
                            eigendecomposition input, small Hilbert spaces);
  * ``apply(state)``      — matrix-free structured apply on a (re, im) float64
                            :class:`~quantumsimulations_tpu.ops.cplx.Cplx`
                            statevector, jit/vmap/shard-friendly (large or
                            sharded Hilbert spaces);
  * expectation helpers via single-site reduced density matrices.

Sites are indexed 0..n-1 with per-site local dimension ``dims[k]`` (the rare
spin, when present, is the last index, matching the reference convention at
dipolar_ensemble_with_rare.py:28-34).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .cplx import Cplx, einsum as ceinsum
from .spin import spin_matrix


def local_op(dim: int, which: str) -> np.ndarray:
    """Single-site spin operator for a site of local dimension ``dim``."""
    s = (dim - 1) / 2.0
    return spin_matrix(s, which)


@dataclass(frozen=True)
class ProductTerm:
    """coeff * prod_k op_k acting on the listed sites (identity elsewhere)."""

    coeff: float
    factors: tuple[tuple[int, str], ...]  # ((site, opname), ...) sorted by site

    def __post_init__(self):
        sites = [s for s, _ in self.factors]
        if sorted(sites) != list(sites) or len(set(sites)) != len(sites):
            raise ValueError("factors must be sorted by site and unique")


@dataclass(frozen=True)
class OperatorSum:
    """A Hermitian-by-construction sum of product terms on a spin chain."""

    dims: tuple[int, ...]
    terms: tuple[ProductTerm, ...]

    # -- constructors --------------------------------------------------------
    @staticmethod
    def single_site(dims: Sequence[int], site: int, which: str, coeff: float = 1.0) -> "OperatorSum":
        return OperatorSum(tuple(dims), (ProductTerm(coeff, ((site, which),)),))

    @staticmethod
    def sum_over_sites(dims: Sequence[int], sites: Sequence[int], which: str, coeff: float = 1.0) -> "OperatorSum":
        return OperatorSum(
            tuple(dims), tuple(ProductTerm(coeff, ((s, which),)) for s in sites)
        )

    def __add__(self, other: "OperatorSum") -> "OperatorSum":
        if other == 0:
            return self
        if self.dims != other.dims:
            raise ValueError("dims mismatch")
        return OperatorSum(self.dims, self.terms + other.terms)

    __radd__ = __add__

    def __mul__(self, c: float) -> "OperatorSum":
        return OperatorSum(
            self.dims, tuple(ProductTerm(t.coeff * c, t.factors) for t in self.terms)
        )

    __rmul__ = __mul__

    @property
    def dim(self) -> int:
        return int(np.prod(self.dims))

    # -- dense assembly (host) ------------------------------------------------
    def to_dense(self) -> np.ndarray:
        """Assemble the full matrix on the host as numpy complex128.

        Index-arithmetic assembly: the matrix of a product term is sparse
        (one entry per combination of the factors' local nonzeros), so each
        term contributes O(dim) scattered entries instead of an O(dim^2) kron
        chain.  At dim 8192 this is seconds where the kron chain took ~15
        minutes on a 1-core host; tests validate it against an independent
        kron oracle.
        """
        dims = self.dims
        dim = self.dim
        n = len(dims)
        strides = np.ones(n, dtype=np.int64)
        for k in range(n - 2, -1, -1):
            strides[k] = strides[k + 1] * dims[k + 1]
        rows = np.arange(dim, dtype=np.int64)
        digits = [(rows // strides[k]) % dims[k] for k in range(n)]

        H = np.zeros((dim, dim), dtype=np.complex128)
        for term in self.terms:
            # local nonzero entries per factor: lists of (row_digit, col_digit, value)
            factor_entries = []
            for site, which in term.factors:
                M = local_op(dims[site], which)
                nz = np.nonzero(M)
                factor_entries.append(
                    (site, [(int(a), int(b), M[a, b]) for a, b in zip(*nz)])
                )
            # cartesian product of the factors' nonzeros
            from itertools import product as _product

            for combo in _product(*[ents for _, ents in factor_entries]):
                value = term.coeff
                mask = np.ones(dim, dtype=bool)
                col_shift = np.int64(0)
                for (site, _), (a, b, v) in zip(factor_entries, combo):
                    value = value * v
                    mask &= digits[site] == a
                    col_shift += (b - a) * strides[site]
                r = rows[mask]
                H[r, r + col_shift] += value
        return H

    def to_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Aggregated sparse (rows, cols, values) triplet of the operator.

        Same index-arithmetic walk as :meth:`to_dense`, but accumulated into
        per-column-shift vectors instead of a dense matrix: the dipolar model
        family has O(n^2) distinct shifts with O(dim) entries each, so the
        dense dim^2 buffer (512 MB at dim 8192) never exists.  Entries at the
        same (row, col) are summed in the same term/combo order as to_dense,
        so values match it BIT-FOR-BIT; exact zeros are dropped.  Duplicate
        (row, col) pairs are fully aggregated — consumers may scatter with
        ``set`` semantics.
        """
        dims = self.dims
        dim = self.dim
        n = len(dims)
        strides = np.ones(n, dtype=np.int64)
        for k in range(n - 2, -1, -1):
            strides[k] = strides[k + 1] * dims[k + 1]
        rows = np.arange(dim, dtype=np.int64)
        digits = [(rows // strides[k]) % dims[k] for k in range(n)]

        from itertools import product as _product

        acc: dict[int, np.ndarray] = {}
        for term in self.terms:
            factor_entries = []
            for site, which in term.factors:
                M = local_op(dims[site], which)
                nz = np.nonzero(M)
                factor_entries.append(
                    (site, [(int(a), int(b), M[a, b]) for a, b in zip(*nz)])
                )
            for combo in _product(*[ents for _, ents in factor_entries]):
                value = term.coeff
                mask = np.ones(dim, dtype=bool)
                col_shift = np.int64(0)
                for (site, _), (a, b, v) in zip(factor_entries, combo):
                    value = value * v
                    mask &= digits[site] == a
                    col_shift += (b - a) * strides[site]
                vec = acc.get(int(col_shift))
                if vec is None:
                    vec = acc.setdefault(
                        int(col_shift), np.zeros(dim, dtype=np.complex128)
                    )
                vec[mask] += value
        out_r, out_c, out_v = [], [], []
        for shift in sorted(acc):
            vec = acc[shift]
            nzr = np.nonzero(vec)[0]
            out_r.append(nzr)
            out_c.append(nzr + shift)
            out_v.append(vec[nzr])
        if not out_r:
            z = np.zeros(0)
            return z.astype(np.int64), z.astype(np.int64), z.astype(np.complex128)
        return (
            np.concatenate(out_r),
            np.concatenate(out_c),
            np.concatenate(out_v),
        )

    def to_dense_kron(self) -> np.ndarray:
        """Reference kron-chain assembly (slow; kept for validation)."""
        dim = self.dim
        H = np.zeros((dim, dim), dtype=np.complex128)
        for term in self.terms:
            mats = []
            fac = dict(term.factors)
            for k, d in enumerate(self.dims):
                mats.append(local_op(d, fac[k]) if k in fac else np.eye(d, dtype=np.complex128))
            M = reduce(np.kron, mats)
            H += term.coeff * M
        return H

    def to_dense_cplx(self, dtype=jnp.float64) -> Cplx:
        return Cplx.from_numpy(self.to_dense(), dtype=dtype)

    def to_dense_device(self, col_block: int = 256) -> Cplx:
        """Assemble the dense matrix ON DEVICE as (re, im) planes.

        Applies the matrix-free term machinery to identity columns.  At dim
        8192 the host numpy kron assembly takes ~15 minutes on a small CPU;
        this runs in seconds of device bandwidth.  Columns are processed in
        blocks through ONE compiled program (a whole-matrix single program
        keeps every term's intermediate alive — measured 140 GB of HLO temps
        at dim 8192).  Layout: out[:, j] = H @ e_j.
        """
        import jax
        from functools import partial as _partial

        dims = self.dims
        dim = self.dim
        cb = min(col_block, dim)
        diag = jnp.asarray(self.diagonal_part())
        terms = self.offdiagonal_terms()

        @_partial(jax.jit, static_argnames=("width",))
        def block(start, width):
            cols = start + jnp.arange(width)
            rows = jnp.arange(dim)
            eye_re = (rows[:, None] == cols[None, :]).astype(jnp.float64)
            blk = Cplx(eye_re * diag[:, None], jnp.zeros((dim, width)))
            eye_t = Cplx(eye_re, jnp.zeros((dim, width))).reshape(dims + (width,))
            for term in terms:
                contrib = _apply_product_term_batched(eye_t, dims, term)
                blk = blk + contrib.reshape((dim, width))
            return blk

        if dim == cb:
            return block(0, dim)
        out_re = jnp.zeros((dim, dim))
        out_im = jnp.zeros((dim, dim))
        full_end = (dim // cb) * cb
        for s in range(0, full_end, cb):
            b = block(s, cb)
            out_re = jax.lax.dynamic_update_slice(out_re, b.re, (0, s))
            out_im = jax.lax.dynamic_update_slice(out_im, b.im, (0, s))
            # serialize: queued async blocks would hold their temporaries
            # simultaneously on a memory-tight chip (value fetch: a bare
            # block_until_ready returns at dispatch acceptance here)
            from ..utils.profiling import fetch_sync

            fetch_sync(out_re)
        if full_end < dim:
            # tail: an out-of-range dynamic_update_slice start would be
            # CLAMPED and silently corrupt earlier columns, so the remainder
            # gets its own exact-width program
            b = block(full_end, dim - full_end)
            out_re = jax.lax.dynamic_update_slice(out_re, b.re, (0, full_end))
            out_im = jax.lax.dynamic_update_slice(out_im, b.im, (0, full_end))
        return Cplx(out_re, out_im)

    # -- structured decomposition ----------------------------------------------
    def diagonal_part(self) -> np.ndarray:
        """Sum of all purely-diagonal terms as a length-dim real vector.

        Terms made only of 'z' (and 'i') factors are diagonal in the product
        basis; aggregating them into one vector turns the dominant part of the
        dipolar Hamiltonian into a single elementwise multiply.
        """
        diag = np.zeros(self.dim, dtype=np.float64)
        for term in self.terms:
            if not self._is_diagonal(term):
                continue
            v = np.ones(1, dtype=np.float64)
            fac = dict(term.factors)
            for k, d in enumerate(self.dims):
                if k in fac:
                    loc = np.real(np.diag(local_op(d, fac[k])))
                else:
                    loc = np.ones(d)
                v = np.kron(v, loc)
            diag += term.coeff * v
        return diag

    @staticmethod
    def _is_diagonal(term: ProductTerm) -> bool:
        return all(op in ("z", "i") for _, op in term.factors)

    def offdiagonal_terms(self) -> tuple[ProductTerm, ...]:
        return tuple(t for t in self.terms if not self._is_diagonal(t))

    # -- matrix-free apply ------------------------------------------------------
    def apply(self, psi: Cplx, diag: jnp.ndarray | None = None) -> Cplx:
        """H @ psi for a flat statevector, without materializing H.

        ``diag`` may be passed in as a precomputed device array (from
        :meth:`diagonal_part`); otherwise it is computed host-side here.
        The off-diagonal terms are applied one by one as per-site tensor
        contractions (XLA fuses the transposes/reshapes).
        """
        dims = self.dims
        if diag is None:
            diag = jnp.asarray(self.diagonal_part())
        out = Cplx(psi.re * diag, psi.im * diag)
        psi_t = psi.reshape(dims)
        for term in self.offdiagonal_terms():
            contrib = _apply_product_term(psi_t, dims, term)
            out = out + contrib.reshape(psi.shape)
        return out


def _apply_product_term_batched(psi_t: Cplx, dims: tuple[int, ...], term: ProductTerm) -> Cplx:
    """Like _apply_product_term but with a trailing batch axis on psi_t."""
    n = len(dims)
    out = psi_t
    for site, which in term.factors:
        op = Cplx.from_numpy(local_op(dims[site], which))
        letters = [chr(ord("a") + k) for k in range(n)]
        in_spec = "".join(letters) + "Y"
        out_letters = letters.copy()
        out_letters[site] = "Z"
        spec = f"Z{letters[site]},{in_spec}->{''.join(out_letters)}Y"
        out = ceinsum(spec, op, out)
    return out * term.coeff


def _apply_product_term(psi_t: Cplx, dims: tuple[int, ...], term: ProductTerm) -> Cplx:
    """Apply coeff * prod(op_site) to a tensor-shaped statevector."""
    n = len(dims)
    out = psi_t
    for site, which in term.factors:
        op = Cplx.from_numpy(local_op(dims[site], which))
        # contract: out'[..., a, ...] = sum_b op[a, b] out[..., b, ...]
        axes = list(range(n))
        # move `site` axis to front, matmul, move back — via einsum for clarity
        letters = [chr(ord("a") + k) for k in range(n)]
        in_spec = "".join(letters)
        out_letters = letters.copy()
        out_letters[site] = "Z"
        spec = f"Z{letters[site]},{in_spec}->{''.join(out_letters)}"
        out = ceinsum(spec, op, out)
    return out * term.coeff


def site_reduced_density(psi: Cplx, dims: Sequence[int], site: int) -> Cplx:
    """Single-site reduced density matrix rho_site from a flat statevector.

    rho[a, b] = sum_{l, r} psi[l, a, r] * conj(psi[l, b, r])
    """
    dims = tuple(dims)
    dl = int(np.prod(dims[:site], dtype=np.int64)) if site > 0 else 1
    d = dims[site]
    dr = int(np.prod(dims[site + 1 :], dtype=np.int64)) if site + 1 < len(dims) else 1
    p = psi.reshape((dl, d, dr))
    re = jnp.einsum("lar,lbr->ab", p.re, p.re) + jnp.einsum("lar,lbr->ab", p.im, p.im)
    im = jnp.einsum("lar,lbr->ab", p.im, p.re) - jnp.einsum("lar,lbr->ab", p.re, p.im)
    return Cplx(re, im)


def expect_site(psi: Cplx, dims: Sequence[int], site: int, which: str) -> jnp.ndarray:
    """Real part of <psi| op_site |psi> via the reduced density matrix."""
    rho = site_reduced_density(psi, dims, site)
    op = Cplx.from_numpy(local_op(tuple(dims)[site], which))
    # tr(rho @ op), real part: sum_ab rho[a,b] op[b,a]
    val = jnp.sum(rho.re * op.re.T) - jnp.sum(rho.im * op.im.T)
    return val


# ---------------------------------------------------------------------------
# Compile-friendly matrix-free apply for all-spin-1/2 chains.
#
# The generic term apply above contracts each factor as an einsum on a
# rank-n tensor view; at n = 13 (dim 8192) the resulting program STALLS the
# TPU backend's compiler indefinitely (observed: a single jitted apply never
# finishes compiling; the round-2 "Krylov worker crash" at dim >= 8192 was
# this).  For qubit chains every off-diagonal product term is a bit-flip
# permutation with a per-level sign, which XLA compiles as cheap reverse +
# broadcast-multiply ops:
#
#   * c_x X_j + c_y Y_j      ->  flip bit j, coefficient (c_x -+ i c_y) by level
#   * c_xx X_jX_k + c_yy Y_jY_k -> flip bits j,k, REAL coefficient
#         c_xx + c_yy * (-1 if a_j == a_k else +1) by level pair
#     (the reference's DQ term -1/4(XX - YY), dipolar_ensemble_with_rare.py
#     :559-561, is the c_yy = -c_xx case: a pure |00><11| + |11><00| flip)
#
# Only tiny (1,2,1)-shaped constants are materialized — no dim-sized masks.
# ---------------------------------------------------------------------------


def make_qubit_flip_apply(H: OperatorSum):
    """Build a jit-friendly ``apply(psi: Cplx, diag) -> Cplx`` for an
    all-spin-1/2 OperatorSum whose off-diagonal terms are single-site x/y or
    two-site xx/yy products (the dipolar model family).  Returns None if the
    operator has terms outside that family (callers fall back to the generic
    einsum apply)."""
    dims = H.dims
    if any(d != 2 for d in dims):
        return None
    n = len(dims)
    singles: dict[int, list[float]] = {}
    pairs: dict[tuple[int, int], list[float]] = {}
    for term in H.offdiagonal_terms():
        sites = [s for s, _ in term.factors]
        ops = [w for _, w in term.factors]
        if len(sites) == 1 and ops[0] in ("x", "y"):
            acc = singles.setdefault(sites[0], [0.0, 0.0])
            acc[0 if ops[0] == "x" else 1] += term.coeff
        elif len(sites) == 2 and ops in (["x", "x"], ["y", "y"]):
            acc = pairs.setdefault((sites[0], sites[1]), [0.0, 0.0])
            acc[0 if ops[0] == "x" else 1] += term.coeff
        else:
            return None

    # static per-term constants.  Spin operators carry the 1/2: I_{x,y} =
    # sigma_{x,y}/2, so singles scale by 1/2 and pairs by 1/4.
    sgn = jnp.asarray([1.0, -1.0]).reshape(1, 2, 1)  # level sign for y
    pair_tables = {}
    for (j, k), (cxx, cyy) in pairs.items():
        # C[a_j, a_k] = (cxx + cyy * (-1 if a_j == a_k else +1)) / 4
        C = 0.25 * np.asarray(
            [[cxx - cyy, cxx + cyy], [cxx + cyy, cxx - cyy]], dtype=np.float64
        ).reshape(1, 2, 1, 2, 1)
        if np.any(C):
            pair_tables[(j, k)] = jnp.asarray(C)

    def apply(psi: Cplx, diag: jnp.ndarray) -> Cplx:
        dim = psi.shape[0]
        out_re = psi.re * diag
        out_im = psi.im * diag
        for site, (cx2, cy2) in singles.items():
            cx, cy = 0.5 * cx2, 0.5 * cy2  # I_{x,y} = sigma_{x,y}/2
            dl = 1 << site
            dr = dim >> (site + 1)
            vr = psi.re.reshape(dl, 2, dr)
            vi = psi.im.reshape(dl, 2, dr)
            fr = jnp.flip(vr, axis=1)
            fi = jnp.flip(vi, axis=1)
            # (cx - i cy sgn) * f
            out_re = out_re + (cx * fr + (cy * sgn) * fi).reshape(dim)
            out_im = out_im + (cx * fi - (cy * sgn) * fr).reshape(dim)
        for (j, k), C in pair_tables.items():
            dl = 1 << j
            dm = 1 << (k - j - 1)
            dr = dim >> (k + 1)
            vr = psi.re.reshape(dl, 2, dm, 2, dr)
            vi = psi.im.reshape(dl, 2, dm, 2, dr)
            fr = jnp.flip(jnp.flip(vr, axis=1), axis=3)
            fi = jnp.flip(jnp.flip(vi, axis=1), axis=3)
            out_re = out_re + (C * fr).reshape(dim)
            out_im = out_im + (C * fi).reshape(dim)
        return Cplx(out_re, out_im)

    return apply
