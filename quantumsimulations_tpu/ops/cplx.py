"""Complex arithmetic as explicit (re, im) float planes.

The TPU backend in this environment supports float64 natively but has no
complex dtype support at all (neither complex64 matmul nor elementwise
complex128).  Every on-device complex computation in this framework therefore
carries a pair of real arrays.  :class:`Cplx` is a tiny pytree wrapper so that
propagator code reads like ordinary linear algebra while staying jit- and
vmap-friendly.

A complex matmul decomposes into four real matmuls (we deliberately avoid the
3-multiplication Karatsuba form: its extra additions introduce cancellation
that would eat into the 1e-8 parity budget).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Cplx:
    """A complex tensor stored as separate real and imaginary planes."""

    re: Any
    im: Any

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_numpy(z: np.ndarray, dtype=jnp.float64) -> "Cplx":
        z = np.asarray(z)
        return Cplx(jnp.asarray(np.real(z), dtype=dtype), jnp.asarray(np.imag(z), dtype=dtype))

    @staticmethod
    def zeros(shape, dtype=jnp.float64) -> "Cplx":
        return Cplx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.re) + 1j * np.asarray(self.im)

    # -- shape/dtype passthrough ---------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    @property
    def ndim(self):
        return self.re.ndim

    def astype(self, dtype) -> "Cplx":
        return Cplx(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape) -> "Cplx":
        return Cplx(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx) -> "Cplx":
        return Cplx(self.re[idx], self.im[idx])

    def transpose(self, *axes) -> "Cplx":
        return Cplx(self.re.transpose(*axes), self.im.transpose(*axes))

    @property
    def T(self) -> "Cplx":
        return Cplx(self.re.T, self.im.T)

    # -- arithmetic ----------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re + other.re, self.im + other.im)
        if isinstance(other, complex):
            return Cplx(self.re + other.real, self.im + other.imag)
        return Cplx(self.re + other, self.im)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re - other.re, self.im - other.im)
        if isinstance(other, complex):
            return Cplx(self.re - other.real, self.im - other.imag)
        return Cplx(self.re - other, self.im)

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def __mul__(self, other):
        if isinstance(other, Cplx):
            return Cplx(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        if isinstance(other, complex):
            return self * Cplx(jnp.asarray(other.real, self.dtype), jnp.asarray(other.imag, self.dtype))
        return Cplx(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __matmul__(self, other: "Cplx") -> "Cplx":
        return matmul(self, other)

    def conj(self) -> "Cplx":
        return Cplx(self.re, -self.im)

    def abs2(self):
        """|z|^2 elementwise (a real array)."""
        return self.re * self.re + self.im * self.im

    def dagger(self) -> "Cplx":
        """Conjugate transpose of the last two axes."""
        return Cplx(jnp.swapaxes(self.re, -1, -2), -jnp.swapaxes(self.im, -1, -2))

    def sum(self, axis=None):
        return Cplx(self.re.sum(axis=axis), self.im.sum(axis=axis))


def matmul(a: Cplx, b: Cplx, precision=None) -> Cplx:
    """Complex matmul via four real matmuls (MXU-friendly)."""
    dot = lambda x, y: jnp.matmul(x, y, precision=precision)
    return Cplx(
        dot(a.re, b.re) - dot(a.im, b.im),
        dot(a.re, b.im) + dot(a.im, b.re),
    )


def einsum(spec: str, *operands: Cplx, precision=None) -> Cplx:
    """Complex einsum over Cplx operands (expands via real/imag products).

    Supports 1 or 2 Cplx operands (enough for this framework's contractions).
    """
    if len(operands) == 1:
        (a,) = operands
        return Cplx(jnp.einsum(spec, a.re), jnp.einsum(spec, a.im))
    if len(operands) == 2:
        a, b = operands
        es = lambda x, y: jnp.einsum(spec, x, y, precision=precision)
        return Cplx(
            es(a.re, b.re) - es(a.im, b.im),
            es(a.re, b.im) + es(a.im, b.re),
        )
    raise NotImplementedError("cplx.einsum supports at most two Cplx operands")


def vdot(a: Cplx, b: Cplx) -> Cplx:
    """<a|b> = sum(conj(a) * b) over all elements."""
    re = jnp.sum(a.re * b.re + a.im * b.im)
    im = jnp.sum(a.re * b.im - a.im * b.re)
    return Cplx(re, im)


def norm(a: Cplx):
    return jnp.sqrt(jnp.sum(a.abs2()))


def expi(theta) -> Cplx:
    """exp(i * theta) for a real array theta."""
    return Cplx(jnp.cos(theta), jnp.sin(theta))


def scale_i(a: Cplx) -> Cplx:
    """Multiply by i: i*(re + i*im) = -im + i*re."""
    return Cplx(-a.im, a.re)


def scale_neg_i(a: Cplx) -> Cplx:
    """Multiply by -i."""
    return Cplx(a.im, -a.re)
