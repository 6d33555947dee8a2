"""Native C++ analysis kernels vs the pure-Python golden implementations."""

import numpy as np
import pytest

from quantumsimulations_tpu import native
from quantumsimulations_tpu.analysis.metrics import (
    coarse_grain,
    contrast_michelson_with_t_gate,
    iz_slope_from_coarse,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

rng = np.random.default_rng(17)


def test_coarse_grain_batch_matches_python():
    y = rng.standard_normal((5, 1003))
    t = np.linspace(0, 1, 1003)
    got = native.coarse_grain_batch(y, window=25)
    for i in range(5):
        _, want = coarse_grain(t, y[i], window=25)
        # sequential vs numpy pairwise summation differ at ~eps*window
        assert np.allclose(got[i], want, rtol=1e-13, atol=1e-15)


def test_coarse_grain_batch_noop_window():
    y = rng.standard_normal((2, 10))
    got = native.coarse_grain_batch(y, window=1)
    assert np.array_equal(got, y)
    got = native.coarse_grain_batch(y, window=100)  # window longer than trace
    assert np.array_equal(got, y)


@pytest.mark.parametrize("n", [4, 10, 50, 400])
def test_slope_fit_matches_python(n):
    t = np.linspace(0.0, 3.0, n)
    y = 0.3 + 1.7 * t + 0.05 * rng.standard_normal(n)
    a = native.iz_slope_from_coarse(t, y)
    b = iz_slope_from_coarse(t, y)
    for k in a:
        va, vb = a[k], b[k]
        assert (np.isnan(va) and np.isnan(vb)) or np.isclose(va, vb, rtol=1e-12, atol=1e-300), k


def test_slope_fit_too_few_nans():
    a = native.iz_slope_from_coarse(np.arange(3.0), np.arange(3.0))
    assert all(np.isnan(v) for v in a.values())


def test_slope_batch_matches_scalar():
    t = np.linspace(0.0, 1.0, 60)
    Y = rng.standard_normal((7, 60)).cumsum(axis=1)
    batch = native.iz_slope_batch(t, Y)
    for i in range(7):
        single = iz_slope_from_coarse(t, Y[i])
        for k in single:
            va, vb = batch[i][k], single[k]
            assert (np.isnan(va) and np.isnan(vb)) or np.isclose(va, vb, rtol=1e-12), (i, k)


def test_native_contrast_matches_python():
    lib = native.load()
    cases = [
        (2.0, 1.0, 10.0, 10.0),
        (2.0, 1.0, 0.5, 10.0),
        (2.0, 1.0, 10.0, 0.5),
        (2.0, 1.0, 0.5, 0.5),
        (-2.0, 1.0, -10.0, 10.0),
        (np.nan, 1.0, 10.0, 10.0),
        (2.0, 1.0, np.nan, 10.0),
    ]
    for s_on, s_off, t_on, t_off in cases:
        want = contrast_michelson_with_t_gate(s_on, s_off, t_on, t_off)
        got = lib.contrast_michelson_with_t_gate(s_on, s_off, t_on, t_off, 1.0)
        assert (np.isnan(got) and np.isnan(want)) or got == want
