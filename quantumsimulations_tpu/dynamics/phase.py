"""Accurate evaluation of exp(-i * w * t) phases for long horizons.

The spin problem integrates to t = 30 s with eigenfrequencies up to a few
1e6 rad/s, so raw phase arguments reach ~1e8 rad.  A naive float64 product
w * t carries an absolute rounding error of ~ulp(1e8) ≈ 1.5e-8 rad — already
at the parity budget — and XLA backends compiled with
``--xla_allow_excess_precision`` are free to break error-free-transformation
tricks (observed on both CPU and TPU), so classic Dekker/Cody–Waite chains on
huge arguments cannot be trusted on-device.

The scheme here exploits the uniform output grid t_k = k*dt + eps_k
(eps_k = the tiny linspace rounding residual):

  1. HOST (true IEEE f64 + 80-bit longdouble): reduce each eigenfrequency's
     per-step phase r_n = (w_n * dt) mod 2pi exactly.
  2. DEVICE: theta_{n,k} = reduce(k * r_n) + w_n * eps_k.  All magnitudes stay
     <= T*pi (~6e4 rad), so even a fully reassociated Cody–Waite evaluation
     keeps the absolute error < ~1e-11 rad, and the usual evaluation ~1e-13.

This removes the phase term from the parity error budget; the floor is set by
the f64 eigensolve itself.
"""

from __future__ import annotations

from decimal import Decimal, getcontext

import jax.numpy as jnp
import numpy as np

getcontext().prec = 60

# 2*pi to 50+ significant digits
_TWO_PI_D = Decimal("6.283185307179586476925286766559005768394338798750211641949889")
_TWO_PI_HI = float(_TWO_PI_D)  # float64 nearest
_TWO_PI_LO = float(_TWO_PI_D - Decimal(_TWO_PI_HI))
_INV_TWO_PI = float(Decimal(1) / _TWO_PI_D)


def _mask_low_bits(x: float, keep_bits: int = 26) -> float:
    """Zero mantissa bits below ``keep_bits`` (Cody–Waite piece maker)."""
    u = np.float64(x).view(np.uint64)
    drop = 53 - keep_bits
    u &= np.uint64(~((1 << drop) - 1) & 0xFFFFFFFFFFFFFFFF)
    return float(np.uint64(u).view(np.float64))


_PI2_A = _mask_low_bits(float(_TWO_PI_D))
_PI2_B = _mask_low_bits(float(_TWO_PI_D - Decimal(_PI2_A)))
_PI2_C = float(_TWO_PI_D - Decimal(_PI2_A) - Decimal(_PI2_B))


# ---------------------------------------------------------------------------
# Host-side exact reduction (numpy, 80-bit longdouble on x86)
# ---------------------------------------------------------------------------

_TWO_PI_LD = np.longdouble(_TWO_PI_HI) + np.longdouble(_TWO_PI_LO)


def reduce_wdt_host(w: np.ndarray, dt: float) -> np.ndarray:
    """(w * dt) mod 2pi to ~1e-18 absolute, on the host, result in [-pi, pi]."""
    p = np.asarray(w, dtype=np.longdouble) * np.longdouble(dt)
    n = np.rint(p / _TWO_PI_LD)
    return np.asarray(p - n * _TWO_PI_LD, dtype=np.float64)


def uniform_grid_decomposition(times: np.ndarray) -> tuple[float, np.ndarray]:
    """Split an (approximately uniform) time grid into t_k = k*dt + eps_k.

    eps_k is measured against the EXACT real product k*dt (longdouble), so it
    also captures the float64 rounding of k*dt itself — at 30 s horizons and
    MHz frequencies that rounding alone is worth ~1e-8 rad of phase.
    """
    times = np.asarray(times, dtype=np.float64)
    if len(times) < 2:
        return 1.0, times.copy()
    dt = float(times[1] - times[0])
    k = np.arange(len(times), dtype=np.longdouble)
    eps = np.asarray(times, dtype=np.longdouble) - k * np.longdouble(dt)
    return dt, np.asarray(eps, dtype=np.float64)


# ---------------------------------------------------------------------------
# Device-side small-argument reduction
# ---------------------------------------------------------------------------

def _reduce_small(p: jnp.ndarray) -> jnp.ndarray:
    """p mod 2pi for |p| <~ 1e6 rad; safe under XLA excess-precision rewrites."""
    n = jnp.round(p * _INV_TWO_PI)
    return ((p - n * _PI2_A) - n * _PI2_B) - n * _PI2_C


def grid_angles(
    r: jnp.ndarray,  # (dim,)  per-step reduced phases from reduce_wdt_host
    k: jnp.ndarray,  # (T,)    output-step indices as float64
    w: jnp.ndarray,  # (dim,)  raw eigenfrequencies (for the eps correction)
    eps: jnp.ndarray,  # (T,)  linspace residuals t_k - k*dt
) -> jnp.ndarray:
    """theta[n, t] = (w_n * t_k) mod 2pi, accurate to ~1e-11 rad absolute."""
    p = r[:, None] * k[None, :]
    return _reduce_small(p) + w[:, None] * eps[None, :]


def grid_expi_neg(r, k, w, eps):
    """(re, im) planes of exp(-i w t) on the uniform grid."""
    theta = grid_angles(r, k, w, eps)
    return jnp.cos(theta), -jnp.sin(theta)


# ---------------------------------------------------------------------------
# Generic (non-uniform t) fallback — accurate on strict-IEEE backends (CPU).
# ---------------------------------------------------------------------------

def _split(a):
    """Head/tail split via float32 round-trip (opaque to XLA simplifiers)."""
    hi = a.astype(jnp.float32).astype(jnp.float64)
    return hi, a - hi


def reduced_angles(w: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(w[:, None] * t[None, :]) mod 2pi via split product + Cody–Waite.

    Accurate on strictly-rounded IEEE backends; on backends compiled with
    excess-precision rewrites, prefer the uniform-grid path above.
    """
    w2 = w[:, None]
    t2 = t[None, :]
    p = w2 * t2
    w_hi, w_lo = _split(w2)
    t_hi, t_lo = _split(t2)
    e = ((w_hi * t_hi - p) + w_hi * t_lo + w_lo * t_hi) + w_lo * t_lo
    n = jnp.round(p * _INV_TWO_PI)
    return ((p - n * _PI2_A) - n * _PI2_B) - n * _PI2_C + e
