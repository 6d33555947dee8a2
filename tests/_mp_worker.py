"""Worker process for tests/test_multiprocess.py (NOT collected by pytest).

Each of the two spawned processes owns 2 virtual CPU devices; together they
form a 4-device global mesh through ``jax.distributed`` (Gloo CPU
collectives).  The worker runs the framework's state-sharded Hamiltonian
apply — mask-grouped ``lax.ppermute`` over the 'sp' axis
(parallel/state_sharded.py) — so the permute collective genuinely crosses a
process boundary, then compares against the dense single-host product.

The reference has no communication backend at all (single Python process,
SURVEY.md §2.6); this is the multi-host slot's first real multi-process run.
"""

import os
import sys

# must precede any jax import
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from jax.sharding import NamedSharding, PartitionSpec as P

    from quantumsimulations_tpu.models.dipolar import build_model
    from quantumsimulations_tpu.models.params import DipolarRareParams
    from quantumsimulations_tpu.parallel.distributed import (
        global_mesh,
        initialize_multihost,
    )
    from quantumsimulations_tpu.parallel.state_sharded import make_sharded_apply

    assert initialize_multihost(f"localhost:{port}", 2, pid)
    assert jax.device_count() == 4, jax.devices()
    assert jax.local_device_count() == 2
    assert jax.process_count() == 2

    mesh = global_mesh(sp=4)  # ('dp', 'sp') = (1, 4) over both processes

    gamma = 8.1812e7
    p = DipolarRareParams(
        n_sea=5, gamma_sea=gamma, gamma_rare=6.976e7, B0_sea=3.0, B0_rare=3.0,
        B1_sea=2 * np.pi * 5e4 / gamma, B1_rare=2 * np.pi * 70710.678 / 6.976e7,
        omega_rf_sea=gamma * 3.0 - 2 * np.pi * 900.0,
        omega_rf_rare=6.976e7 * 3.0,
        phi_sea=np.pi / 2, phi_rare=np.pi / 2,
        dipolar_scale=1e-7 * 1.054571817e-34, shell_scale=0.282393e-9,
        t_final=1e-4, steps=4, drive_sea=True, drive_rare=True,
        is_spin_three_half=False, is_center_rare=True,
    )
    m = build_model(p)
    dim = int(np.prod(m.dims))

    apply_fn, _diag, sharding, _sh = make_sharded_apply(m.hamiltonian, mesh)

    rng = np.random.default_rng(7)
    psi = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    psi /= np.linalg.norm(psi)
    xre = jax.make_array_from_callback(
        (dim,), sharding, lambda idx: psi.real[idx]
    )
    xim = jax.make_array_from_callback(
        (dim,), sharding, lambda idx: psi.imag[idx]
    )
    yre, yim = apply_fn(xre, xim)

    # replicate the sharded result so every process can fetch it whole
    rep = NamedSharding(mesh, P())
    gather = jax.jit(lambda a: a, out_shardings=rep)
    y = np.asarray(gather(yre)) + 1j * np.asarray(gather(yim))

    ref = m.hamiltonian.to_dense() @ psi
    # relative to the product scale: H entries are rad/s-scale (~1e6), so
    # summation-order roundoff lands around 1e-11 absolute
    err = float(np.abs(y - ref).max() / np.abs(ref).max())
    assert err < 1e-14, f"sharded apply rel mismatch across processes: {err}"

    with open(os.path.join(outdir, f"ok_{pid}"), "w", encoding="utf-8") as f:
        f.write(f"{err:.3e}")


if __name__ == "__main__":
    main()
