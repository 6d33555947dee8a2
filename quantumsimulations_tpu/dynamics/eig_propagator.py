"""Exact propagation via dense eigendecomposition — the small/medium-N fast path.

The rotating-frame Hamiltonian is time-independent (the reference's drives are
static in the rotating frame, dipolar_ensemble_with_rare.py:515-528), so the
entire trace is available in closed form:

    psi(t_k) = V exp(-i L t_k) V^dag psi0

Where the reference pushes ~3e6 adaptive ODE steps through QuTiP/SciPy per
simulation (30 s horizon at max_step=1e-5, sweep_sea_detuning.py:1247-1250),
this propagator does ONE host-side eigendecomposition per Hamiltonian and then
produces all 20k output states with MXU-shaped complex matmuls in (re, im)
float64 planes.  Expectation traces come from per-site reduced density
matrices (observables.py) without materializing dense observables.

Hard-won TPU/tunnel lessons baked into the structure:
  * the whole time axis is processed inside ONE device program
    (lax.map over fixed-size chunks) — per-chunk host dispatches cost
    seconds each through the axon relay;
  * the x64 rewriter inflates f64 temporaries ~10x, so chunks are small
    (default_time_chunk) and nothing dim^2-sized is stacked over chunks;
  * device->host bandwidth through the tunnel is low and fluctuates, so the
    kernel ASSEMBLES the named observables on device (collective sea sums +
    rare site + norm + energy = 8 rows/sim) instead of shipping per-site
    component traces — the transfer is the irreducible artifact payload;
  * reshaping/transposing big tiled scan outputs inside jit stalls the
    remote compiler — outputs keep their scan-major layout and the cheap
    final reshape happens on host.

Phase arguments w*t (up to ~1e8 rad at 30 s) are handled by the uniform-grid
reduction in phase.py (host longdouble per-step reduction + small-argument
device reduction), adding < 1e-11 rad of error on any backend.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, matmul
from .observables import site_xyz_expectations, state_norms
from .phase import grid_expi_neg, reduce_wdt_host, uniform_grid_decomposition

#: row order of assembled trace blocks (matches the reference's observable
#: dict plus the two diagnostics)
TRACE_ROWS = ("Ix_sea", "Iy_sea", "Iz_sea", "Iz_R", "Ix_R", "Iy_R", "state_norm", "energy")


def eigh_host(H: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition on the host CPU (complex dtypes are TPU-unsupported)."""
    w, V = np.linalg.eigh(H)
    return w, V


def dense_matrix_host(op, device_threshold_dim: int = 2048) -> np.ndarray:
    """Dense complex128 matrix of an OperatorSum.

    to_dense now uses index-arithmetic assembly (O(nnz), ~1 s at dim 8192),
    so the host build is always the cheap path; kept as a named hook for a
    future device-resident pipeline.
    """
    return op.to_dense()


def _states_chunk(w, r, V: Cplx, c: Cplx, k_block, eps_block) -> Cplx:
    ph_re, ph_im = grid_expi_neg(r, k_block, w, eps_block)  # (dim, Tc)
    amp = Cplx(
        c.re[:, None] * ph_re - c.im[:, None] * ph_im,
        c.re[:, None] * ph_im + c.im[:, None] * ph_re,
    )
    return matmul(V, amp), amp


def _trace_chunk(w, r, V: Cplx, c: Cplx, k_block, eps_block, dims):
    """Per-site xyz (n,3,Tc), norms (Tc,), <H> (Tc,) for one block of times."""
    states, amp = _states_chunk(w, r, V, c, k_block, eps_block)
    xyz = site_xyz_expectations(states, dims)
    norms = state_norms(states)
    energy = jnp.sum(w[:, None] * amp.abs2(), axis=0)
    return xyz, norms, energy


def _assembled_chunk(w, r, V, c, k_block, eps_block, dims, sea_mask, idx_rare):
    """Named-observable rows (8, Tc) for one block (device-side assembly)."""
    xyz, norms, energy = _trace_chunk(w, r, V, c, k_block, eps_block, dims)
    sea = jnp.einsum("j,jot->ot", sea_mask, xyz)  # (3, Tc): Ix/Iy/Iz_sea
    rare = xyz[idx_rare]  # (3, Tc): x, y, z
    return jnp.stack(
        [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms, energy]
    )


# ---------------------------------------------------------------------------
# f32 speed mode: Pallas fused complex matmul + f32 observables (~1e-5
# accuracy — exploratory sweeps; the parity path stays f64).
# ---------------------------------------------------------------------------

def _assembled_chunk32(w, r, V32: Cplx, c, k_block, eps_block, dims, sea_mask, idx_rare, interpret: bool):
    from ..ops.pallas_kernels import cmatmul_f32

    ph_re, ph_im = grid_expi_neg(r, k_block, w, eps_block)  # f64 (dim, Tc)
    amp_re = (c.re[:, None] * ph_re - c.im[:, None] * ph_im).astype(jnp.float32)
    amp_im = (c.re[:, None] * ph_im + c.im[:, None] * ph_re).astype(jnp.float32)
    s_re, s_im = cmatmul_f32(V32.re, V32.im, amp_re, amp_im, interpret=interpret)
    states = Cplx(s_re, s_im)
    xyz = site_xyz_expectations(states, dims)
    norms = state_norms(states)
    energy = jnp.sum(
        w[:, None].astype(jnp.float32) * (amp_re * amp_re + amp_im * amp_im), axis=0
    )
    sea = jnp.einsum("j,jot->ot", sea_mask.astype(jnp.float32), xyz)
    rare = xyz[idx_rare]
    return jnp.stack(
        [sea[0], sea[1], sea[2], rare[2], rare[0], rare[1], norms, energy]
    ).astype(jnp.float64)


@partial(jax.jit, static_argnames=("dims", "idx_rare", "interpret"))
def _batched_assembled_all_kernel32(
    w, r, V32, c, sea_mask, k_chunks, eps_chunks, dims, idx_rare, interpret
):
    def per_chunk(blocks):
        kb, eb = blocks
        fn = lambda wb, rb, Vb, cb, mb: _assembled_chunk32(
            wb, rb, Vb, cb, kb, eb, dims, mb, idx_rare, interpret
        )
        return jax.vmap(fn)(w, r, V32, c, sea_mask)

    return jax.lax.map(per_chunk, (k_chunks, eps_chunks))


_trace_chunk_kernel = jax.jit(_trace_chunk, static_argnames=("dims",))


def _coeffs(V: Cplx, psi0: Cplx) -> Cplx:
    dag = V.dagger()
    re = dag.re @ psi0.re - dag.im @ psi0.im
    im = dag.re @ psi0.im + dag.im @ psi0.re
    return Cplx(re, im)


_coeffs_kernel = jax.jit(_coeffs)
_batched_coeffs_kernel = jax.jit(jax.vmap(_coeffs))
_flatten_kernel = jax.jit(lambda x: x.reshape(-1))


@partial(jax.jit, static_argnames=("dims", "idx_rare"))
def _batched_assembled_all_kernel(
    w, r, V, c, sea_mask, k_chunks, eps_chunks, dims, idx_rare
):
    """All chunks, all sims, assembled rows: (n_chunks, B, 8, Tc)."""

    def per_chunk(blocks):
        kb, eb = blocks
        fn = lambda wb, rb, Vb, cb, mb: _assembled_chunk(
            wb, rb, Vb, cb, kb, eb, dims, mb, idx_rare
        )
        return jax.vmap(fn)(w, r, V, c, sea_mask)

    return jax.lax.map(per_chunk, (k_chunks, eps_chunks))


# Packed transfer format for the trace download (the tunnel is byte-limited:
# ~12-17 MB/s single stream, streams multiply only marginally — measured in
# experiments/fetch_probe.json).  Observable rows ship as 48-bit fixed point
# (int32 high / uint16 low, per-(sim,row) physics-bound scale: quantization
# <= scale * 2^-46, ~6e-14 at n6 — the propagator's own f64 phase floor);
# the norm row ships as (norm - 1) f32 (drift values ~1e-13 keep 7 digits,
# error ~1e-20) and the energy row as (energy - e0) f32 with e0 = sum w|c|^2
# f64 per sim (exactly conserved; the row varies only by roundoff).
# 44 bytes/column vs 64 raw — a 31% cut of the dominant transfer.
# Fault visibility: a non-finite observable (device fault, NaN input) or one
# outside its physics bound (|y| > 2^_PACK_BITS: unrepresentable) marks the
# hi plane with _PACK_BAD_SENTINEL and unpacks to NaN — the packed path must
# never turn corruption into plausible finite values (the raw path ships the
# NaN as-is; casting NaN/Inf to int32 would be implementation-defined).
_PACK_BITS = 45  # |q| <= 2^45: hi = floor(q/2^16) fits i32, q exact in f64
_PACK_BAD_SENTINEL = np.int32(2**31 - 1)  # legit |hi| <= 2^29


def _pack_scales(n_sea_effective: np.ndarray, dims, idx_rare: int) -> np.ndarray:
    """Per-(sim,row) fixed-point scales from physics bounds: collective sea
    rows are bounded by 0.5/site, rare rows by (d_rare-1)/2; +0.5 margin."""
    nse = np.asarray(n_sea_effective, dtype=np.float64)
    B = nse.shape[0]
    s = np.empty((B, 6))
    s[:, :3] = (0.5 * nse + 0.5)[:, None]
    s[:, 3:] = (dims[idx_rare] - 1) / 2 + 0.5
    return s


@partial(jax.jit, static_argnames=("dims", "idx_rare"))
def _batched_assembled_all_kernel_packed(
    w, r, V, c, sea_mask, k_chunks, eps_chunks, qscale, dims, idx_rare
):
    """Same compute as _batched_assembled_all_kernel, but the outputs are
    the packed-transfer planes (flat): obs hi/lo, norm/energy residuals, e0.

    qscale is 2^_PACK_BITS / scale, shape (B, 6)."""
    out = _batched_assembled_all_kernel(
        w, r, V, c, sea_mask, k_chunks, eps_chunks, dims, idx_rare
    )  # (NC, B, 8, Tc)
    obs = out[:, :, :6, :]
    y = jnp.rint(obs * qscale[None, :, :, None])
    bad = ~jnp.isfinite(y) | (jnp.abs(y) > float(2**_PACK_BITS))
    y = jnp.where(bad, 0.0, y)  # keep the int casts defined
    hi = jnp.floor(y / 65536.0)
    lo = y - hi * 65536.0
    hi = jnp.where(bad, float(_PACK_BAD_SENTINEL), hi)
    e0 = jnp.sum(w * (c.re * c.re + c.im * c.im), axis=1)  # (B,)
    nres = (out[:, :, 6, :] - 1.0).astype(jnp.float32)
    eres = (out[:, :, 7, :] - e0[None, :, None]).astype(jnp.float32)
    return (
        hi.astype(jnp.int32).reshape(-1),
        lo.astype(jnp.uint16).reshape(-1),
        nres.reshape(-1),
        eres.reshape(-1),
        e0,
    )


def _unpack_group(flats_g, n_chunks_g: int, B: int, Tc: int,
                  scales: np.ndarray, e0: np.ndarray) -> np.ndarray:
    """Packed flats of one dispatch group -> (n_chunks_g, B, 8, Tc) f64."""
    hi, lo, nres, eres = flats_g
    sh = (n_chunks_g, B, 6, Tc)
    hi = hi.reshape(sh)
    q = hi.astype(np.float64) * 65536.0 + lo.astype(np.float64).reshape(sh)
    obs = q * (scales[None, :, :, None] / float(2 ** _PACK_BITS))
    obs = np.where(hi == _PACK_BAD_SENTINEL, np.nan, obs)
    norm = 1.0 + nres.astype(np.float64).reshape(n_chunks_g, B, 1, Tc)
    energy = e0[None, :, None, None] + eres.astype(np.float64).reshape(
        n_chunks_g, B, 1, Tc
    )
    return np.concatenate([obs, norm, energy], axis=2)


def _pack_enabled(pack: bool | None) -> bool:
    if pack is not None:
        return pack
    env = os.environ.get("QST_FETCH_PACK")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() in ("tpu", "axon")


def default_time_chunk(dim: int, T: int, batch: int = 1) -> int:
    """Bound the per-chunk states block (~32 MB of f64 pairs).

    Deliberately small: the TPU x64 rewriter expands f64 matmuls/einsums into
    multi-limb bf16/f32 passes with ~10x temporary inflation and heavy
    fragmentation.  Override with QST_TCHUNK for experiments.
    """
    env = os.environ.get("QST_TCHUNK")
    if env:
        return max(1, min(T, int(env)))
    return max(64, min(T, (1 << 22) // max(1, dim * batch)))


def _pad_grid(times: np.ndarray, t_chunk: int):
    T = len(times)
    dt, eps = uniform_grid_decomposition(times)
    n_chunks = int(np.ceil(T / t_chunk))
    Tp = n_chunks * t_chunk
    k_all = np.arange(T, dtype=np.float64)
    k_pad = np.concatenate([k_all, np.full(Tp - T, k_all[-1])])
    eps_pad = np.concatenate([eps, np.full(Tp - T, eps[-1])])
    return dt, k_pad.reshape(n_chunks, t_chunk), eps_pad.reshape(n_chunks, t_chunk)


def eig_traces_assembled_batched(
    w: np.ndarray,  # (B, dim)
    V: np.ndarray,  # (B, dim, dim) complex
    psi0: np.ndarray,  # (B, dim) complex
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: np.ndarray,  # (B,) number of sites in the sea sums
    idx_rare: int,
    t_chunk: int | None = None,
    device_put=None,
    pack: bool | None = None,
) -> np.ndarray:
    """Named-observable traces for a batch: returns (B, 8, T) float64.

    Row order is TRACE_ROWS.  ``device_put`` optionally places inputs (used
    by the dp-sharded path).  ``pack`` selects the byte-packed transfer
    format for the trace download (None: on for TPU backends, off on CPU;
    env QST_FETCH_PACK overrides) — see _PACK_BITS for the format and its
    quantization bound.
    """
    B, dim = w.shape
    T = len(times)
    n_sites = len(dims)
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=B)
    dt, k_chunks, eps_chunks = _pad_grid(times, t_chunk)
    r = np.stack([reduce_wdt_host(wb, dt) for wb in w])
    sea_mask = (np.arange(n_sites)[None, :] < np.asarray(n_sea_effective)[:, None]).astype(
        np.float64
    )

    custom_put = device_put is not None
    do_pack = _pack_enabled(pack) and not custom_put
    if device_put is None:
        device_put = lambda x, kind: jnp.asarray(x)
    wd = device_put(w, "batch")
    rd = device_put(r, "batch")
    Vc = Cplx(device_put(V.real, "batch"), device_put(V.imag, "batch"))
    psic = Cplx(device_put(psi0.real, "batch"), device_put(psi0.imag, "batch"))
    mask_d = device_put(sea_mask, "batch")
    c = _batched_coeffs_kernel(Vc, psic)
    if do_pack:
        scales = _pack_scales(n_sea_effective, dims, idx_rare)
        qscale_d = jnp.asarray(float(2 ** _PACK_BITS) / scales)

    # Ship results FLAT: the tunnel transfers N-D arrays one subarray at a
    # time (measured 300 s vs 1.8 s for the same 50 MB); the (NC, B, 8, Tc)
    # block is tiling-friendly (8 sublanes exactly), so the device-side
    # flatten is a cheap relayout and the host transpose is free numpy.
    #
    # Grouped overlap (QST_N6_FETCH_GROUPS > 1): the chunk axis splits into G
    # equal dispatches of ONE shared program, and each group's flat result is
    # fetched from its own thread while later groups still execute — the same
    # threads-overlap behavior measured for executable loads on this tunnel
    # (docs/ROUND4.md) applies to device->host transfers, hiding most of the
    # ~2.2 s trace download under the device program and under other fetches.
    groups = int(os.environ.get("QST_N6_FETCH_GROUPS", "4"))
    n_chunks = k_chunks.shape[0]
    Tc = k_chunks.shape[1]
    if custom_put or groups <= 1 or n_chunks < 2 * groups:
        if do_pack:
            hi, lo, nres, eres, e0 = _batched_assembled_all_kernel_packed(
                wd, rd, Vc, c, mask_d,
                device_put(k_chunks, "rep"), device_put(eps_chunks, "rep"),
                qscale_d, dims, idx_rare,
            )
            arr = _unpack_group(
                (np.asarray(hi), np.asarray(lo), np.asarray(nres),
                 np.asarray(eres)),
                n_chunks, B, Tc, scales, np.asarray(e0),
            )
        else:
            out = _batched_assembled_all_kernel(
                wd, rd, Vc, c, mask_d,
                device_put(k_chunks, "rep"), device_put(eps_chunks, "rep"),
                dims, idx_rare,
            )
            arr = np.asarray(_flatten_kernel(out)).reshape(n_chunks, B, 8, Tc)
        traces = np.moveaxis(arr, 0, 2).reshape(B, 8, -1)[:, :, :T]
        return traces

    import threading

    per = -(-n_chunks // groups)  # ceil
    n_pad = per * groups
    if n_pad != n_chunks:  # repeat the last chunk row; excess discarded below
        rep = np.repeat(k_chunks[-1:], n_pad - n_chunks, axis=0)
        k_chunks = np.concatenate([k_chunks, rep], axis=0)
        eps_chunks = np.concatenate(
            [eps_chunks, np.repeat(eps_chunks[-1:], n_pad - n_chunks, axis=0)],
            axis=0,
        )
    flats: list = [None] * groups
    threads = []
    e0_holder: list = [None]
    for g in range(groups):
        sl = slice(g * per, (g + 1) * per)
        if do_pack:
            hi, lo, nres, eres, e0 = _batched_assembled_all_kernel_packed(
                wd, rd, Vc, c, mask_d,
                device_put(k_chunks[sl], "rep"),
                device_put(eps_chunks[sl], "rep"),
                qscale_d, dims, idx_rare,
            )
            if g == 0:
                e0_holder[0] = e0

            def _fetch(i=g, parts=(hi, lo, nres, eres)):
                flats[i] = tuple(np.asarray(p) for p in parts)

        else:
            out_g = _batched_assembled_all_kernel(
                wd, rd, Vc, c, mask_d,
                device_put(k_chunks[sl], "rep"),
                device_put(eps_chunks[sl], "rep"),
                dims, idx_rare,
            )
            flat_g = _flatten_kernel(out_g)  # dispatched async; thread-fetched

            def _fetch(i=g, a=flat_g):
                flats[i] = np.asarray(a)

        th = threading.Thread(target=_fetch, daemon=True, name=f"n6-fetch-{g}")
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    if do_pack:
        e0_h = np.asarray(e0_holder[0])
        arr = np.concatenate(
            [_unpack_group(f, per, B, Tc, scales, e0_h) for f in flats]
        )
    else:
        arr = np.concatenate(flats).reshape(n_pad, B, 8, Tc)
    traces = np.moveaxis(arr, 0, 2).reshape(B, 8, -1)[:, :, :T]
    return traces


def eig_traces_assembled_batched32(
    w: np.ndarray,
    V: np.ndarray,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    n_sea_effective: np.ndarray,
    idx_rare: int,
    t_chunk: int | None = None,
    interpret: bool | None = None,
) -> np.ndarray:
    """f32 speed mode of the assembled traces (Pallas fused complex matmul).

    ~1e-4 observable accuracy (tested at atol=2e-4 vs the f64 path in
    tests/test_steppers.py); roughly half the memory/bandwidth of the f64
    path and native (non-emulated) MXU matmuls.  ``interpret`` defaults to
    True off-TPU so the same code runs in CI.
    """
    B, dim = w.shape
    T = len(times)
    n_sites = len(dims)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=B) * 2  # f32: half the bytes
    dt, k_chunks, eps_chunks = _pad_grid(times, t_chunk)
    r = np.stack([reduce_wdt_host(wb, dt) for wb in w])
    sea_mask = (np.arange(n_sites)[None, :] < np.asarray(n_sea_effective)[:, None]).astype(
        np.float64
    )
    V32 = Cplx(
        jnp.asarray(V.real, jnp.float32), jnp.asarray(V.imag, jnp.float32)
    )
    c = _batched_coeffs_kernel(
        Cplx.from_numpy(V), Cplx.from_numpy(psi0)
    )
    out = _batched_assembled_all_kernel32(
        jnp.asarray(w), jnp.asarray(r), V32, c, jnp.asarray(sea_mask),
        jnp.asarray(k_chunks), jnp.asarray(eps_chunks), dims, idx_rare, interpret,
    )
    n_chunks, Bk, _, Tc = out.shape
    arr = np.asarray(_flatten_kernel(out)).reshape(n_chunks, Bk, 8, Tc)
    return np.moveaxis(arr, 0, 2).reshape(B, 8, -1)[:, :, :T]


def traces_dict(row_block: np.ndarray) -> dict[str, np.ndarray]:
    """(8, T) assembled rows -> the reference's named trace dict (+energy)."""
    return {name: row_block[i] for i, name in enumerate(TRACE_ROWS)}


# ---------------------------------------------------------------------------
# Per-site API (tests, custom observables) — single and batched.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims",))
def _batched_trace_all_kernel(w, r, V, c, k_chunks, eps_chunks, dims):
    def per_chunk(blocks):
        kb, eb = blocks
        fn = lambda wb, rb, Vb, cb: _trace_chunk(wb, rb, Vb, cb, kb, eb, dims)
        return jax.vmap(fn)(w, r, V, c)

    return jax.lax.map(per_chunk, (k_chunks, eps_chunks))


def eig_propagate_traces_batched(
    w: np.ndarray,
    V: np.ndarray,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    t_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Batched per-site traces: site_xyz (B, n, 3, T), norm (B, T), energy (B, T)."""
    B, dim = w.shape
    T = len(times)
    if t_chunk is None:
        t_chunk = default_time_chunk(dim, T, batch=B)
    dt, k_chunks, eps_chunks = _pad_grid(times, t_chunk)
    r = np.stack([reduce_wdt_host(wb, dt) for wb in w])

    Vc = Cplx.from_numpy(V)
    wd = jnp.asarray(w)
    c = _batched_coeffs_kernel(Vc, Cplx.from_numpy(psi0))
    xyz, norms, energy = _batched_trace_all_kernel(
        wd, jnp.asarray(r), Vc, c, jnp.asarray(k_chunks), jnp.asarray(eps_chunks), dims
    )
    nc, _, n_sites, _, Tc = xyz.shape
    xyz = np.asarray(_flatten_kernel(xyz)).reshape(nc, B, n_sites, 3, Tc)
    norms = np.asarray(_flatten_kernel(norms)).reshape(nc, B, Tc)
    energy = np.asarray(_flatten_kernel(energy)).reshape(nc, B, Tc)
    return {
        "site_xyz": np.moveaxis(xyz, 0, 3).reshape(B, n_sites, 3, -1)[..., :T],
        "norm": np.moveaxis(norms, 0, 1).reshape(B, -1)[:, :T],
        "energy": np.moveaxis(energy, 0, 1).reshape(B, -1)[:, :T],
    }


def eig_propagate_traces(
    w: np.ndarray,
    V: np.ndarray,
    psi0: np.ndarray,
    times: np.ndarray,
    dims: tuple[int, ...],
    t_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Per-site traces for one simulation: site_xyz (n, 3, T), norm, energy."""
    out = eig_propagate_traces_batched(
        w[None, :], V[None, :, :], psi0[None, :], times, dims, t_chunk=t_chunk
    )
    return {
        "site_xyz": out["site_xyz"][0],
        "norm": out["norm"][0],
        "energy": out["energy"][0],
    }
