"""Pallas fused limb-domain matmul: int8 limb-pair products -> canonical.

The pure-XLA limb-domain apply (ops/split_apply_ext.py) materializes an
(L+G, M, N) int32 DIGIT stack in HBM for every product bucket, re-reads it
for the carry cascade, and issues ~65 small (K=128..) dots per bucket from
a fori_loop — measured ~48 effective int8 Tops on the v5e (12% of peak),
bandwidth-bound on the digit traffic (~90 MB per apply at dim 16384).

This kernel fuses the whole bucket: all limb-pair dot products accumulate
into an (L+G, TM, TN) int32 VMEM scratch across a K-accumulation grid, the
carry cascade runs in-kernel, and only the CANONICAL int8 limbs (L, M, N)
ever touch HBM — 4x less output traffic, no i32 round trip, and the MXU
sees back-to-back dots over VMEM-resident tiles.

Layout trick: when ``TM == DL`` each M-tile of a stacked cross operand
(A * DL rows) is exactly one cross term's (DL, DL) block, so a
block-transposing OUTPUT index map emits the second-stage layout
(L, DL, A * DR) directly — the int8 sublane-shuffle transpose that relayouts
Zc in the XLA tier never happens (`transpose_out=True`).

Numerics: identical digit-window products as `split_apply_ext._product_digits`
(same i32 overflow bounds, asserted) and the same carry contract (nearest,
ties toward +inf).  Per-bucket truncation to L canonical limbs replaces the
XLA tier's truncate-after-bucket-sum — a <= 2^-(bits*L+1) relative
difference per bucket, below the grid resolution both tiers share.

Used by the "extp" arithmetic tier of dynamics/cheb_step.py (the
beyond-dense Chebyshev stepping engine replacing qt.sesolve — reference:
dipolar_ensemble_with_rare.py:653-666 — at bath sizes QuTiP cannot reach).
On non-TPU backends the kernel runs in interpreter mode so the test suite
stays hardware-independent (SURVEY.md §4.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID_GUARD = 2  # product digits feeding carries up the cascade (matches ext)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _limb_kernel(L: int, bits: int):
    """Kernel factory: digits in i32 scratch, carry at the last K visit."""
    S = L + GRID_GUARD
    half = np.int32(1 << (bits - 1))

    def kernel(a_ref, b_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for s in range(S):
            acc = None
            for j in range(max(0, s - L + 1), min(s + 1, L)):
                i = s - j
                m = jax.lax.dot_general(
                    a_ref[j], b_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = m if acc is None else acc + m
            acc_ref[s] += acc

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            # exact carry cascade, nearest / ties toward +inf — the same
            # contract as split_apply_ext's GridOps.carry
            c = jnp.zeros_like(acc_ref[0])
            outs = [None] * L
            for s in range(S - 1, 0, -1):
                t = acc_ref[s] + c
                c = (t + half) >> bits
                if s < L:
                    outs[s] = (t - (c << bits)).astype(jnp.int8)
            outs[0] = (acc_ref[0] + c).astype(jnp.int8)
            for j in range(L):
                out_ref[j] = outs[j]

    return kernel


@partial(
    jax.jit,
    static_argnames=("bits", "tm", "tn", "tk", "transpose_out", "interpret"),
)
def limb_matmul_canon(
    a: jnp.ndarray,  # (L, M, K) int8 canonical limbs
    b: jnp.ndarray,  # (L, K, N) int8 canonical limbs
    bits: int,
    tm: int = 128,
    tn: int = 128,
    tk: int = 512,
    transpose_out: bool = False,
    interpret: bool | None = None,
):
    """Canonical int8 limbs of (limb a) @ (limb b) on the 2^bits grid.

    Returns (L, M, N), or with ``transpose_out`` (L, tm, (M // tm) * N):
    M-tile ``i``'s (tm, N) product lands at columns ``[i*N, (i+1)*N)`` — the
    block-transposed layout the cross second stage consumes, produced free
    via the output index map instead of an int8 relayout transpose.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    L, M, K = a.shape
    Lb, K2, N = b.shape
    assert L == Lb and K == K2, (a.shape, b.shape)
    # i32 digit headroom: canonical limbs are <= 2^(bits-1) (limb 0 <= ~2^bits
    # after carry folds), a digit sums <= L pair-dots of K MACs each
    assert K * (2 ** (2 * bits)) * L < 2**31, "i32 would overflow"
    tm = min(tm, _round_up(M, 32))
    tn = min(tn, _round_up(N, 128))
    tk = min(tk, _round_up(K, 128))
    Mp, Kp, Np = _round_up(M, tm), _round_up(K, tk), _round_up(N, tn)
    if transpose_out:
        assert M % tm == 0, (M, tm)

    ap = jnp.pad(a, ((0, 0), (0, Mp - M), (0, Kp - K)))
    bp = jnp.pad(b, ((0, 0), (0, Kp - K), (0, Np - N)))

    grid = (Mp // tm, Np // tn, Kp // tk)
    # index-map constants pinned to i32: with x64 enabled a python literal
    # lowers as i64, which the Mosaic scalar core rejects
    zero = np.int32(0)
    a_spec = pl.BlockSpec(
        (L, tm, tk), lambda i, j, k: (zero, i, k), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec(
        (L, tk, tn), lambda i, j, k: (zero, k, j), memory_space=pltpu.VMEM
    )
    if transpose_out:
        n_mt = Mp // tm
        n_nt = Np // tn
        out_shape = jax.ShapeDtypeStruct((L, tm, n_mt * Np), jnp.int8)
        out_spec = pl.BlockSpec(
            (L, tm, tn),
            lambda i, j, k: (zero, zero, i * np.int32(n_nt) + j),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((L, Mp, Np), jnp.int8)
        out_spec = pl.BlockSpec(
            (L, tm, tn), lambda i, j, k: (zero, i, j), memory_space=pltpu.VMEM
        )

    S = L + GRID_GUARD
    live_pairs = sum(
        min(s + 1, L) - max(0, s - L + 1) for s in range(S)
    )
    out = pl.pallas_call(
        _limb_kernel(L, bits),
        out_shape=out_shape,
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((S, tm, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * live_pairs * Mp * Np * Kp,
            bytes_accessed=L * (Mp * Kp + Kp * Np + Mp * Np),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ap, bp)
    if transpose_out:
        if Np != N:  # drop pad columns interleaved per M-tile
            out = out.reshape(L, tm, Mp // tm, Np)[:, :, :, :N].reshape(
                L, tm, (Mp // tm) * N
            )
        return out  # (L, tm, (M // tm) * N); M-tile i at columns [i*N,(i+1)*N)
    return out[:, :M, :N]
