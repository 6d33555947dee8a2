"""Sharded-statevector Hamiltonian apply: the beyond-single-chip engine.

The scaling axis of this problem is Hilbert dimension 2^N (SURVEY.md §5
"long-context" slot): past ~13 spins a single chip's HBM can't hold dense
operators, and past single-host RAM QuTiP simply stops.  Here the statevector
is sharded over the mesh axis ``sp`` by its leading k qubit axes
(2^k = n_devices, contiguous blocks <=> device index = first k bits), and
H psi is evaluated with only O(#masks) collective permutes:

  * All z/zz terms are DIAGONAL in the product basis -> one elementwise
    multiply with a diag vector sharded like the state (zero communication).
  * A term with x/y factors on sharded qubits flips those bits: amplitudes
    move between the devices whose indices differ by the XOR mask of the
    flipped bits -> one ``lax.ppermute``.  Terms are GROUPED BY MASK so the
    sea-sea xx+yy network costs one permute per qubit pair, not per term,
    and each device applies its local factors + a per-device +-1/+-i phase
    (from the z/y eigenstructure of its own index bits) to the received block.

This is the TPU-native analogue of the reference's "just call qt.sesolve"
inner loop (dipolar_ensemble_with_rare.py:653) for baths that QuTiP cannot
reach; the Krylov stepper (dynamics/krylov.py) runs on top of this apply
under ``shard_map`` with psum-reduced inner products.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cplx import Cplx
from ..ops.embed import OperatorSum, local_op
from ..ops.cplx import einsum as ceinsum


@dataclass(frozen=True)
class _MaskGroupTerm:
    coeff: float
    local_factors: tuple[tuple[int, str], ...]  # (axis within local dims, op)
    sharded_factors: tuple[tuple[int, str], ...]  # (bit position from MSB, op in xyz)


class ShardedHamiltonian:
    """Preprocessed term IR for a statevector sharded on its first k qubits."""

    def __init__(self, H: OperatorSum, n_shards: int):
        k = int(np.log2(n_shards))
        if 2**k != n_shards:
            raise ValueError("n_shards must be a power of two")
        if any(d != 2 for d in H.dims[:k]):
            raise ValueError("sharded sites must be qubits (dim 2)")
        self.H = H
        self.k = k
        self.n_shards = n_shards
        self.dims = H.dims
        self.local_dims = tuple(H.dims[k:])
        self.local_dim = int(np.prod(self.local_dims)) if self.local_dims else 1
        self.diag = H.diagonal_part()  # (global dim,) host f64

        groups: dict[int, list[_MaskGroupTerm]] = {}
        for term in H.offdiagonal_terms():
            mask = 0
            local_factors: list[tuple[int, str]] = []
            sharded_factors: list[tuple[int, str]] = []
            for site, which in term.factors:
                if site < k:
                    bitpos = k - 1 - site  # site 0 = MSB of the device index
                    sharded_factors.append((bitpos, which))
                    if which in ("x", "y"):
                        mask |= 1 << bitpos
                else:
                    local_factors.append((site - k, which))
            groups.setdefault(mask, []).append(
                _MaskGroupTerm(term.coeff, tuple(local_factors), tuple(sharded_factors))
            )
        self.mask_groups = groups

    # -- device-local computation (called INSIDE shard_map) -----------------
    def _local_term_apply(self, psi_local: Cplx, t: _MaskGroupTerm, my_idx) -> Cplx:
        """coeff * per-device phase * local-factor product applied to a block."""
        out = psi_local
        if t.local_factors:
            pt = out.reshape(self.local_dims)
            n = len(self.local_dims)
            letters = [chr(ord("a") + kk) for kk in range(n)]
            for axis, which in t.local_factors:
                op = Cplx.from_numpy(local_op(self.local_dims[axis], which))
                out_letters = letters.copy()
                out_letters[axis] = "Z"
                spec = f"Z{letters[axis]},{''.join(letters)}->{''.join(out_letters)}"
                pt = ceinsum(spec, op, pt)
            out = pt.reshape(psi_local.shape)
        # per-device scalar phase from sharded-site factors
        ph_re = jnp.asarray(t.coeff, jnp.float64)
        ph_im = jnp.asarray(0.0, jnp.float64)
        for bitpos, which in t.sharded_factors:
            b = ((my_idx >> bitpos) & 1).astype(jnp.float64)
            if which == "x":
                ph_re, ph_im = ph_re * 0.5, ph_im * 0.5
            elif which == "z":
                f = 0.5 * (1.0 - 2.0 * b)  # Iz eigenvalue: +1/2 for bit 0
                ph_re, ph_im = ph_re * f, ph_im * f
            elif which == "y":
                # (sigma_y psi)_b = i (2b - 1) psi_{1-b}; Iy = sigma_y / 2
                f = 0.5 * (2.0 * b - 1.0)
                ph_re, ph_im = -ph_im * f, ph_re * f
            else:
                raise ValueError(which)
        return Cplx(out.re * ph_re - out.im * ph_im, out.re * ph_im + out.im * ph_re)

    def local_apply(self, psi_local: Cplx, diag_local: jnp.ndarray, axis_name: str) -> Cplx:
        """(H psi) block for this device; runs inside shard_map."""
        my_idx = jax.lax.axis_index(axis_name)
        out = Cplx(psi_local.re * diag_local, psi_local.im * diag_local)
        for mask, terms in self.mask_groups.items():
            if mask == 0:
                src = psi_local
            else:
                perm = [(j, j ^ mask) for j in range(self.n_shards)]
                src = Cplx(
                    jax.lax.ppermute(psi_local.re, axis_name, perm),
                    jax.lax.ppermute(psi_local.im, axis_name, perm),
                )
            for t in terms:
                out = out + self._local_term_apply(src, t, my_idx)
        return out


def krylov_traces_assembled_sharded(
    H: OperatorSum,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: int,
    idx_rare: int,
    mesh: Mesh,
    axis: str = "sp",
    m: int | None = None,
    theta: float | None = None,
) -> np.ndarray:
    """Full assembled trace (8, T) on a statevector sharded over ``axis``.

    The whole propagation loop — Lanczos substeps with psum inner products,
    mask-grouped ppermute H applies, AND the per-step observables — runs as
    one shard_map program.  Observables are evaluated through the same
    sharded machinery: each named observable (collective sea Ix/Iy/Iz, rare
    x/y/z) is its own term IR, so <psi|O|psi> = psum(<psi_local | (O psi)_local>)
    with at most one permute per sharded-site x/y factor.

    This is the SURVEY.md §5 "long-context" slot made concrete: the
    reference's serial ``qt.sesolve`` loop (sweep_sea_detuning.py:611) for
    baths beyond single-host reach.
    """
    from ..dynamics.krylov import (
        KRYLOV_M,
        KRYLOV_THETA,
        _expm_n_squarings,
        _lanczos_expm_substep,
        spectral_norm_bound,
        spectral_norm_estimate,
    )

    m = KRYLOV_M if m is None else m
    theta = KRYLOV_THETA if theta is None else theta
    times = np.asarray(times)
    T = len(times)
    if T > 1:
        dts = np.diff(times)
        if not np.allclose(dts, dts[0], rtol=1e-9, atol=0.0):
            raise ValueError("krylov stepper requires a uniform time grid")
        dt = float(dts[0])
    else:
        dt = 0.0

    n_shards = mesh.shape[axis]
    sh = ShardedHamiltonian(H, n_shards)
    norm_bound = min(spectral_norm_bound(H), spectral_norm_estimate(H))
    n_sub = max(1, int(np.ceil(norm_bound * abs(dt) / theta)))
    dt_sub = dt / n_sub
    n_sq_small = _expm_n_squarings(2.0 * norm_bound * abs(dt_sub))
    bd_tol = 1e-13 * norm_bound

    # observable term IRs: Ix/Iy/Iz_sea (collective sums), rare x/y/z
    sea_sites = list(range(n_sea_effective))
    obs_ops = [
        OperatorSum.sum_over_sites(dims, sea_sites, w) for w in ("x", "y", "z")
    ] + [OperatorSum.single_site(dims, idx_rare, w) for w in ("x", "y", "z")]
    sh_obs = [ShardedHamiltonian(o, n_shards) for o in obs_ops]

    sharding = NamedSharding(mesh, P(axis))
    diag_H = jax.device_put(jnp.asarray(sh.diag), sharding)
    diags_obs = jax.device_put(
        jnp.stack([jnp.asarray(s.diag) for s in sh_obs]),
        NamedSharding(mesh, P(None, axis)),
    )
    psi_re = jax.device_put(jnp.asarray(psi0.real), sharding)
    psi_im = jax.device_put(jnp.asarray(psi0.imag), sharding)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, axis)),
        out_specs=P(),
    )
    def run(p_re, p_im, dH, dObs):
        local_apply = lambda p: sh.local_apply(p, dH, axis)

        def expect(psi: Cplx, i: int) -> jnp.ndarray:
            opsi = sh_obs[i].local_apply(psi, dObs[i], axis)
            return jax.lax.psum(
                jnp.sum(psi.re * opsi.re + psi.im * opsi.im), axis
            )

        def substep(_, p):
            return _lanczos_expm_substep(
                local_apply, p, dt_sub, m, axis_name=axis, n_sq=n_sq_small,
                breakdown_tol=bd_tol,
            )

        def body(psi, _):
            vals = [expect(psi, i) for i in range(6)]  # sea x,y,z, rare x,y,z
            nrm = jnp.sqrt(jax.lax.psum(jnp.sum(psi.abs2()), axis))
            row = jnp.stack(
                [vals[0], vals[1], vals[2], vals[5], vals[3], vals[4], nrm]
            )
            nxt = jax.lax.fori_loop(0, n_sub, substep, psi)
            return nxt, row

        psi = Cplx(p_re, p_im)
        hpsi = local_apply(psi)
        e0 = jax.lax.psum(jnp.sum(psi.re * hpsi.re + psi.im * hpsi.im), axis)
        _, rows = jax.lax.scan(body, psi, None, length=T)
        return rows, e0

    rows_dev, e0 = jax.jit(run)(psi_re, psi_im, diag_H, diags_obs)
    rows = np.empty((8, T))
    rows[:7] = np.asarray(rows_dev).T
    rows[7] = float(e0)
    return rows


def make_sharded_apply(H: OperatorSum, mesh: Mesh, axis: str = "sp"):
    """Build (apply_fn, diag_device, sharding) for the sharded H psi product.

    ``apply_fn(psi_re, psi_im) -> (re, im)`` is a jitted shard_map computation
    over global (dim,) arrays sharded on the mesh axis.
    """
    n_shards = mesh.shape[axis]
    sh = ShardedHamiltonian(H, n_shards)
    sharding = NamedSharding(mesh, P(axis))
    diag_dev = jax.device_put(jnp.asarray(sh.diag), sharding)

    spec_tuple = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_tuple, spec_tuple, spec_tuple),
        out_specs=(spec_tuple, spec_tuple),
    )
    def _apply(psi_re, psi_im, diag):
        out = sh.local_apply(Cplx(psi_re, psi_im), diag, axis)
        return out.re, out.im

    # the sharded diagonal goes in as an ARGUMENT, not a closure: a closed-
    # over global array becomes a trace-time constant, and fetching a
    # constant that spans non-addressable devices fails in multi-PROCESS
    # runs (tests/test_multiprocess.py)
    _apply_jit = jax.jit(_apply)

    def apply_fn(psi_re, psi_im):
        return _apply_jit(psi_re, psi_im, diag_dev)

    return apply_fn, diag_dev, sharding, sh
