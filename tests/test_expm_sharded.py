"""Row-sharded dense step-operator engine vs the dense eig oracle
(virtual 8-device CPU mesh; SURVEY.md §4.4 "distributed without a cluster").

The sharded limb-expm is the beyond-single-chip dense path (SURVEY.md §5
"14-16 spins" slot, replacing the reference's single-process qt.sesolve at
dipolar_ensemble_with_rare.py:653 for baths no single chip can hold).
"""

import jax
import numpy as np
import pytest

from quantumsimulations_tpu.dynamics.eig_propagator import (
    eig_traces_assembled_batched,
    eigh_host,
)
from quantumsimulations_tpu.models.dipolar import build_model
from quantumsimulations_tpu.parallel.expm_sharded import (
    auto_limb_cfg,
    expm_traces_sharded,
)
from quantumsimulations_tpu.parallel.mesh import make_mesh

from test_sharding import _params

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _eig_rows(model, t):
    H = model.hamiltonian.to_dense()
    w, V = eigh_host(H)
    return eig_traces_assembled_batched(
        w[None], V[None], model.psi0[None], t, model.dims,
        np.asarray([model.n_sea_effective]), model.idx_rare,
    )[0]


def test_auto_limb_cfg():
    # 55+ bits of significand, exact i32 accumulation at each size
    for dim in (128, 8192, 16384, 32768):
        n_limbs, bits = auto_limb_cfg(dim)
        assert n_limbs * bits >= 55
        assert dim * 4**bits * n_limbs < 2**31
    # 5-bit limbs (the cheapest config) hold through every reachable dim
    assert auto_limb_cfg(32768) == (11, 5)


@requires_8
@pytest.mark.parametrize("sp", [4, 8])
def test_expm_sharded_matches_eig(sp):
    # dim 64: exercises >=1 squaring, the doubling pass, and 2 advance blocks
    params = _params(n_sea=5, t_final=2.0e-4, steps=48)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    mesh = make_mesh(sp, sp=sp)
    rows = expm_traces_sharded(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, mesh=mesh, block=32, panel=16,
    )
    ref = _eig_rows(model, t)
    assert np.abs(rows[:6] - ref[:6]).max() < 1e-10
    assert np.abs(rows[6] - 1.0).max() < 1e-12  # norm conservation
    # energy row is the conserved <H>(0)
    assert np.allclose(rows[7], rows[7][0])


@requires_8
def test_expm_sharded_long_horizon_and_spin32():
    # mixed local dims (spin-3/2 rare site, dim 4 at the non-sharded end)
    params = _params(n_sea=4, t_final=1.0e-3, steps=40, is_spin_three_half=True)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    mesh = make_mesh(4, sp=4)
    rows = expm_traces_sharded(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, mesh=mesh, block=16, panel=16,
    )
    ref = _eig_rows(model, t)
    assert np.abs(rows[:6] - ref[:6]).max() < 1e-10
    assert np.abs(rows[6] - 1.0).max() < 1e-12


@requires_8
@pytest.mark.parametrize("sp", [4, 8])
def test_expm_sharded_ext_parity_grade(sp):
    """The exact-limb sharded chain (VERDICT r3 missing #2): must match the
    SINGLE-CHIP ext engine to the limb truncation floor and the eig oracle
    to parity grade — this is what makes BASELINE config 5 (N=14-16) real
    rather than Ozaki-floored."""
    from quantumsimulations_tpu.dynamics.expm_propagator import (
        expm_traces_assembled_ext,
    )
    from quantumsimulations_tpu.parallel.expm_sharded import (
        expm_traces_sharded_ext,
    )

    params = _params(n_sea=5, t_final=2.0e-4, steps=48)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    mesh = make_mesh(sp, sp=sp)
    rows = expm_traces_sharded_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, mesh=mesh, block=32, panel=16,
    )
    ref_ext = expm_traces_assembled_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, block=32, panel=16,
    )
    # same exact-integer chain, different partitioning: only the observable
    # recombination differs (full ext_val vs the q-diagonal limb obs)
    assert np.abs(rows[:7] - ref_ext[:7]).max() < 1e-12
    ref = _eig_rows(model, t)
    assert np.abs(rows[:6] - ref[:6]).max() < 1e-10
    assert np.abs(rows[6] - 1.0).max() < 1e-12
    assert np.allclose(rows[7], rows[7][0])


@requires_8
def test_expm_sharded_ext_spin32():
    params = _params(n_sea=4, t_final=1.0e-3, steps=40, is_spin_three_half=True)
    model = build_model(params)
    t = np.linspace(0.0, params.t_final, params.steps)
    mesh = make_mesh(4, sp=4)
    from quantumsimulations_tpu.parallel.expm_sharded import (
        expm_traces_sharded_ext,
    )

    rows = expm_traces_sharded_ext(
        model.hamiltonian, model.psi0, t, model.dims,
        model.n_sea_effective, model.idx_rare, mesh=mesh, block=16, panel=16,
    )
    ref = _eig_rows(model, t)
    assert np.abs(rows[:6] - ref[:6]).max() < 1e-10
    assert np.abs(rows[6] - 1.0).max() < 1e-12
