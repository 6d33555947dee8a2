"""Persistent XLA compilation cache setup.

Cold compiles through the remote TPU compiler dominate fresh-process
wall-clock for this package's big f64/limb programs (measured: the batched
n_sea=6 trace program costs ~430 s to compile and ~1 s to execute; the
dim-8192 ext-chain programs cost tens of minutes cold).  JAX's persistent
compilation cache makes every later process skip those compiles, so every
entry point (bench, sweep CLIs, experiments) should enable it before the
first jit dispatch.

The default location is the repo-local ``.jax_cache/`` when the package is
running from a git checkout (that directory ships pre-populated with the
production bench program entries), else ``~/.cache/quantumsimulations_tpu``.
Override with ``QST_COMPILE_CACHE=<dir>`` or disable with
``QST_COMPILE_CACHE=0``.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent compile cache; returns the dir (None = off).

    Safe to call multiple times and before/after backend init; entries are
    keyed by backend + program, so CPU test runs and TPU runs coexist.
    """
    import jax

    env = os.environ.get("QST_COMPILE_CACHE")
    if env == "0":
        return None
    if path is None:
        path = env
    if path is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        # .git is a FILE in worktrees/submodules; what matters anyway is
        # whether the shipped cache directory is present
        if os.path.exists(os.path.join(pkg_root, ".git")) or os.path.isdir(
            os.path.join(pkg_root, ".jax_cache")
        ):
            path = os.path.join(pkg_root, ".jax_cache")
        else:
            path = os.path.join(os.path.expanduser("~"), ".cache", "quantumsimulations_tpu")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
