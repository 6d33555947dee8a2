"""quantumsimulations_tpu — a TPU-native spin-dynamics framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
study "rare-spin detection via driven nuclear-spin bath dynamics"
(TimHarrelson/QuantumSimulations): exact statevector evolution of a
dipolar-coupled nuclear-spin ensemble (N spin-1/2 "sea" spins on a spherical
shell plus one rare spin at the center) under a rotating-frame Hamiltonian,
detuning sweeps with slope/contrast metric extraction, and a stable on-disk
artifact contract consumed by downstream report/reprocess tooling.

Design (TPU-first, not a port):
  * Complex arithmetic is carried as explicit (re, im) float64 planes —
    this TPU backend supports f64 but not complex dtypes.
  * Hamiltonians are expressed as a product-term IR (sum of tensor products
    of single-site operators); dense assembly for small Hilbert spaces,
    matrix-free structured apply (einsum / Pallas) for large or sharded ones.
  * Propagation exploits the time-independent rotating-frame H: dense
    eigendecomposition / scaling-squaring expm propagators that turn the
    whole 20k-point trace into a handful of MXU matmuls, a matrix-free
    Lanczos (Krylov) expm-multiply stepper for big baths, and an adaptive
    Dormand–Prince stepper for time-dependent drives.
  * Sweeps are vmapped/batched on one chip and sharded over a
    ``jax.sharding.Mesh`` for 2D grids and sharded statevectors.

Precision: float64 is required for QuTiP-parity (1e-8); the package enables
JAX x64 mode on import unless ``QST_DISABLE_X64=1`` is set.
"""

from __future__ import annotations

import os

if os.environ.get("QST_DISABLE_X64", "0") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .models.params import DipolarRareParams, get_derived_frequencies  # noqa: E402
from .models.geometry import (  # noqa: E402
    shell_positions_with_rare_center,
    dipolar_couplings_from_positions,
)
from .dynamics.evolve import simulate_rare  # noqa: E402
from .models.labframe import simulate_lab_frame  # noqa: E402
from .analysis.metrics import (  # noqa: E402
    coarse_grain,
    iz_slope_from_coarse,
    contrast_michelson_with_t_gate,
    detuning_label,
    f1R_for_resonance,
)

__all__ = [
    "DipolarRareParams",
    "get_derived_frequencies",
    "shell_positions_with_rare_center",
    "dipolar_couplings_from_positions",
    "simulate_rare",
    "simulate_lab_frame",
    "coarse_grain",
    "iz_slope_from_coarse",
    "contrast_michelson_with_t_gate",
    "detuning_label",
    "f1R_for_resonance",
    "__version__",
]
