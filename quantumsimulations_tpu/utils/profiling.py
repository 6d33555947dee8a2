"""Tracing/profiling and debug-mode hooks (SURVEY.md §5).

The reference's only observability is wall-clock prints around each solve
(sweep_sea_detuning.py:672-690).  This module keeps that per-stage timing
(machine-readable) and adds the JAX-native layers: jax.profiler traces for
kernel-level inspection and a NaN-checking debug configuration.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


def fetch_sync(x) -> None:
    """Force COMPLETION of the computation producing ``x``.

    On the axon tunnel backend ``jax.block_until_ready`` returns at dispatch
    ACCEPTANCE, not completion (docs/ROUND3.md): any wall-clock measured or
    queue-depth throttled through it is acceptance-timed only.  Fetching one
    element's VALUE is the only honest sync — use this at every measured
    boundary and wherever queued transients must actually have drained
    (HBM-pressure serialization points).
    """
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


@dataclass
class StageTimer:
    """Accumulates named wall-clock stages; serializable into run artifacts."""

    stages: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self) -> dict:
        return {
            name: {"seconds": self.stages[name], "calls": self.counts[name]}
            for name in self.stages
        }

    def dump(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.as_dict(), f, indent=2)

    def report(self) -> str:
        lines = [f"{name:30s} {v['seconds']:10.3f}s  x{v['calls']}"
                 for name, v in self.as_dict().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: inspect fused kernels in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_mode() -> None:
    """Numerical-debug configuration: NaN checks on every primitive.

    Equivalent in spirit to running the reference with tight tolerances and
    watching the state norm; here XLA raises at the first NaN-producing op.
    """
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


def disable_debug_mode() -> None:
    import jax

    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
