"""Chebyshev expansion propagator — the single-chip huge-N engine.

For Hilbert spaces beyond the dense-operator reach, psi(t) = exp(-i H t) psi0
is evaluated from ONE Chebyshev basis sweep:

    phi_k = T_k(H / lambda) psi0            (three-term recurrence)
    psi(t_j) = sum_k c_k(lambda t_j) phi_k,  c_k(x) = (2 - delta_k0) (-i)^k J_k(x)

with lambda >= ||H||_2.  The basis vectors are TIME-INDEPENDENT, so a single
sweep of K ~ lambda * t_final terms serves EVERY output time: per term the
work is one matrix-free H apply plus a row of an (n_times x K) coefficient
matmul (batched over term blocks so it rides the MXU).

Why this engine on THIS hardware (vs the Lanczos stepper in krylov.py):

  * no inner products: on the TPU backend every dependent f64 dot costs
    ~20 ms of fixed latency and emulated-dot rounding (~1e-10) — a 48-dim
    Lanczos substep measured ~3 s and drifted ~3e-10/substep at dim 8192.
    The Chebyshev recurrence is applies + elementwise axpys only (exact
    emulated f64), so it runs at apply speed with truncation-limited error.
  * the flip apply (ops/embed.py::make_qubit_flip_apply) is the hot op:
    reverse + broadcast-multiply programs the backend compiles cleanly at
    any dim (the generic einsum apply stalls the compiler at dim >= 8192).
  * one apply per scan iteration -> small compiled program; the sweep is
    chunked into bounded-duration dispatches for the session watchdog.

Cost is linear in ||H|| * t_final (the polynomial-method floor), so this is
the SHORT-HORIZON / huge-N engine; the limb-matmul step-operator chain
(expm_propagator.py) remains the 30 s production engine at dense-reachable
dims.  Replaces qt.sesolve (dipolar_ensemble_with_rare.py:653) beyond
single-host dense reach (SURVEY.md §5 long-context slot).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx
from ..ops.embed import OperatorSum
from .krylov import default_matrix_free_apply, spectral_norm_bound
from .observables import site_xyz_expectations, state_norms

_TAIL_EPS = 1e-16  # coefficient cutoff (relative)


def chebyshev_coefficients(lam: float, times: np.ndarray) -> np.ndarray:
    """(T, K) complex coefficients c_k(lambda t_j), truncated where every
    row's |c_k| has fallen below _TAIL_EPS for good."""
    from scipy.special import jv

    x = np.asarray(lam * times, dtype=np.float64)
    x_max = float(x.max())
    # J_k(x) decays superexponentially once k > x: a ~ x^(1/3) transition
    # width plus margin covers machine precision
    K = int(np.ceil(x_max + 12.0 * max(x_max, 1.0) ** (1.0 / 3.0) + 40))
    k = np.arange(K)
    J = jv(k[None, :], x[:, None])  # (T, K)
    pre = np.where(k == 0, 1.0, 2.0)[None, :]
    ik = (-1j) ** (k % 4)
    C = pre * ik[None, :] * J
    # trim the common tail
    keep = np.abs(C).max(axis=0) > _TAIL_EPS
    if keep.any():
        K_eff = int(np.nonzero(keep)[0].max()) + 1
    else:  # times == 0
        K_eff = 1
    return np.ascontiguousarray(C[:, :K_eff])


def _make_sweep(apply_h, lam: float, dim: int, n_times: int, phi_block: int):
    """One jitted dispatch: advance the recurrence `n_blocks * phi_block`
    terms, accumulating every output state.  Carry: (phi_prev, phi_cur, acc).
    """
    inv_lam = 1.0 / lam

    @partial(jax.jit, static_argnames=("n_blocks",))
    def sweep(pp_re, pp_im, pc_re, pc_im, acc_re, acc_im, C_re, C_im,
              n_blocks: int):
        # C_*: (T, n_blocks * phi_block) coefficient planes for this chunk
        def block(carry, b):
            pp_re, pp_im, pc_re, pc_im, acc_re, acc_im = carry

            def term(j, st):
                pp_re, pp_im, pc_re, pc_im, Phi_re, Phi_im = st
                Phi_re = jax.lax.dynamic_update_slice_in_dim(
                    Phi_re, pc_re[None, :], j, axis=0
                )
                Phi_im = jax.lax.dynamic_update_slice_in_dim(
                    Phi_im, pc_im[None, :], j, axis=0
                )
                h = apply_h(Cplx(pc_re, pc_im))
                n_re = 2.0 * inv_lam * h.re - pp_re
                n_im = 2.0 * inv_lam * h.im - pp_im
                return pc_re, pc_im, n_re, n_im, Phi_re, Phi_im

            Phi0 = jnp.zeros((phi_block, dim))
            pp_re, pp_im, pc_re, pc_im, Phi_re, Phi_im = jax.lax.fori_loop(
                0, phi_block, term, (pp_re, pp_im, pc_re, pc_im, Phi0, Phi0)
            )
            cr = jax.lax.dynamic_slice_in_dim(C_re, b * phi_block, phi_block, 1)
            ci = jax.lax.dynamic_slice_in_dim(C_im, b * phi_block, phi_block, 1)
            # acc += C_block @ Phi  (complex; (T, B) @ (B, dim) MXU-shaped)
            acc_re = acc_re + cr @ Phi_re - ci @ Phi_im
            acc_im = acc_im + cr @ Phi_im + ci @ Phi_re
            return (pp_re, pp_im, pc_re, pc_im, acc_re, acc_im), None

        carry = (pp_re, pp_im, pc_re, pc_im, acc_re, acc_im)
        carry, _ = jax.lax.scan(block, carry, jnp.arange(n_blocks))
        return carry

    return sweep


def chebyshev_states(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    norm_bound: float | None = None,
    phi_block: int = 64,
    terms_per_dispatch: int = 4096,
    apply_h=None,
) -> np.ndarray:
    """(T, dim) complex output states psi(t_j) by one Chebyshev basis sweep.

    ``terms_per_dispatch`` bounds each device program's duration (the dev
    tunnel kills multi-minute dispatches); override via the
    QST_CHEB_DISPATCH_TERMS env var.
    """
    times = np.asarray(times)
    dim = len(psi0)
    if norm_bound is None:
        norm_bound = spectral_norm_bound(H)
    lam = float(norm_bound)
    C = chebyshev_coefficients(lam, times)
    T, K = C.shape
    if apply_h is None:
        apply_h = default_matrix_free_apply(H)

    terms_per_dispatch = int(
        os.environ.get("QST_CHEB_DISPATCH_TERMS", terms_per_dispatch)
    )
    terms_per_dispatch = max(phi_block, (terms_per_dispatch // phi_block) * phi_block)
    K_pad = int(np.ceil(K / phi_block)) * phi_block
    C_re = np.zeros((T, K_pad))
    C_im = np.zeros((T, K_pad))
    C_re[:, :K] = C.real
    C_im[:, :K] = C.imag

    sweep = _make_sweep(apply_h, lam, dim, T, phi_block)

    # seed: phi_cur = T_0 psi = psi; phi_prev = T_{-1} psi = T_1 psi = H~ psi
    pc = Cplx(jnp.asarray(psi0.real), jnp.asarray(psi0.imag))
    h0 = apply_h(pc)
    pp_re, pp_im = h0.re / lam, h0.im / lam
    pc_re, pc_im = pc.re, pc.im
    acc_re = jnp.zeros((T, dim))
    acc_im = jnp.zeros((T, dim))

    done = 0
    while done < K_pad:
        n_terms = min(terms_per_dispatch, K_pad - done)
        n_blocks = n_terms // phi_block
        pp_re, pp_im, pc_re, pc_im, acc_re, acc_im = sweep(
            pp_re, pp_im, pc_re, pc_im, acc_re, acc_im,
            jnp.asarray(C_re[:, done : done + n_terms]),
            jnp.asarray(C_im[:, done : done + n_terms]),
            n_blocks,
        )
        from ..utils.profiling import fetch_sync

        fetch_sync(acc_re)  # completion, not dispatch acceptance
        done += n_terms
    return np.asarray(acc_re) + 1j * np.asarray(acc_im)


def chebyshev_traces_assembled(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    norm_bound: float | None = None,
    phi_block: int = 64,
    terms_per_dispatch: int = 4096,
) -> np.ndarray:
    """Assembled-observable rows (8, T): TRACE_ROWS layout, same contract as
    eig_traces_assembled_batched / krylov_traces_assembled."""
    times = np.asarray(times)
    T = len(times)
    apply_h = default_matrix_free_apply(H)
    states = chebyshev_states(
        H, psi0, times, norm_bound=norm_bound, phi_block=phi_block,
        terms_per_dispatch=terms_per_dispatch, apply_h=apply_h,
    )

    psi_init = Cplx.from_numpy(psi0)
    hpsi = apply_h(psi_init)
    e0 = float(np.asarray(jnp.sum(psi_init.re * hpsi.re + psi_init.im * hpsi.im)))

    sea_mask = jnp.asarray(
        (np.arange(len(dims)) < n_sea_effective).astype(np.float64)
    )

    @partial(jax.jit, static_argnames=("dims_", "idx_rare_"))
    def obs(S_re, S_im, mask, dims_, idx_rare_):
        st = Cplx(S_re.T, S_im.T)  # (dim, T)
        xyz = site_xyz_expectations(st, dims_)
        nrm = state_norms(st)
        sea = jnp.einsum("j,jot->ot", mask, xyz)
        rare = xyz[idx_rare_]
        return jnp.stack(
            [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], nrm]
        ).reshape(-1)

    rows = np.empty((8, T))
    rows[:7] = np.asarray(
        obs(jnp.asarray(states.real), jnp.asarray(states.imag), sea_mask,
            dims, idx_rare)
    ).reshape(7, T)
    rows[7] = e0
    return rows
