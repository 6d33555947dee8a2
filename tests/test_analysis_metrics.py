"""Golden tests for the metric kernel: coarse grain, slope fit, contrast,
exponential tau/t90, stable region, aggregation."""

import numpy as np
import pytest

from quantumsimulations_tpu.analysis.metrics import (
    SLOPE_T_MIN,
    contrast_michelson_with_t_gate,
    coarse_grain,
    detuning_label,
    eta_mismatch,
    f1R_for_resonance,
    iz_slope_from_coarse,
)
from quantumsimulations_tpu.analysis.exponential import (
    fit_exponential_to_plateau,
    interp_threshold_time,
    mad_sigma,
)
from quantumsimulations_tpu.analysis.stable_region import (
    compute_bin_stats,
    find_stable_regions,
    stable_region_stats,
)


# ---------------- coarse grain ----------------

def test_coarse_grain_blocks_and_remainder():
    t = np.arange(10, dtype=float)
    y = np.arange(10, dtype=float) * 2
    tc, yc = coarse_grain(t, y, window=3)
    # 10 // 3 * 3 = 9 samples used; remainder dropped
    assert np.allclose(tc, [1.0, 4.0, 7.0])
    assert np.allclose(yc, [2.0, 8.0, 14.0])


def test_coarse_grain_noop_cases():
    t = np.arange(5, dtype=float)
    y = t.copy()
    tc, yc = coarse_grain(t, y, window=1)
    assert tc is t and yc is y
    tc, yc = coarse_grain(t, y, window=10)  # window longer than trace
    assert tc is t and yc is y


# ---------------- slope fit ----------------

def test_slope_fit_exact_line():
    t = np.linspace(0.0, 10.0, 50)
    y = 3.0 + 0.5 * t
    r = iz_slope_from_coarse(t, y)
    # central 60%: indices 10..40
    assert np.isclose(r["slope"], 0.5, atol=1e-12)
    assert np.isclose(r["t_start"], t[10])
    assert np.isclose(r["t_end"], t[39])
    assert np.isclose(r["I_z_slope"], 0.5 * (t[39] - t[10]), atol=1e-12)
    assert np.isclose(r["R_value"], 1.0, atol=1e-12)
    # perfect line: slope_std ~ 0 so t-value huge or nan; R2 = 1
    assert np.isclose(r["R2_value"], 1.0, atol=1e-12)


def test_slope_fit_too_few_points_gives_nans():
    r = iz_slope_from_coarse(np.arange(3, dtype=float), np.arange(3, dtype=float))
    assert np.isnan(r["I_z_slope"]) and np.isnan(r["t_value"])


def test_slope_fit_noisy_statistics():
    rng = np.random.default_rng(42)
    t = np.linspace(0.0, 1.0, 200)
    y = 1.0 + 2.0 * t + 0.01 * rng.standard_normal(200)
    r = iz_slope_from_coarse(t, y)
    assert abs(r["slope"] - 2.0) < 0.05
    assert r["t_value"] > 100  # clearly significant
    assert 0.9 < r["R2_value"] <= 1.0


# ---------------- contrast ----------------

def test_contrast_basic_and_gates():
    # both significant
    c = contrast_michelson_with_t_gate(2.0, 1.0, 10.0, 10.0)
    assert np.isclose(c, (2 - 1) / (2 + 1))
    # off gated to zero -> contrast +1
    assert contrast_michelson_with_t_gate(2.0, 1.0, 10.0, 0.5) == 1.0
    # on gated to zero -> contrast -1
    assert contrast_michelson_with_t_gate(2.0, 1.0, 0.5, 10.0) == -1.0
    # both gated -> exactly 0.0
    assert contrast_michelson_with_t_gate(2.0, 1.0, 0.5, 0.5) == 0.0
    # non-finite slope or t -> NaN
    assert np.isnan(contrast_michelson_with_t_gate(np.nan, 1.0, 10.0, 10.0))
    assert np.isnan(contrast_michelson_with_t_gate(2.0, 1.0, np.nan, 10.0))
    # negative slopes use magnitudes
    assert np.isclose(
        contrast_michelson_with_t_gate(-2.0, 1.0, -10.0, 10.0), (2 - 1) / 3
    )
    assert SLOPE_T_MIN == 1.0


# ---------------- labels / f1R / eta ----------------

def test_detuning_label_formats():
    assert detuning_label(1000.0) == "delta_p1000.0Hz"
    assert detuning_label(-1000.0) == "delta_m1000.0Hz"
    assert detuning_label(0.0) == "delta_p0.0Hz"
    assert detuning_label(12500.25) == "delta_p12500.2Hz"  # one decimal, round-half-even


def test_f1R_for_resonance():
    assert np.isclose(f1R_for_resonance(50e3, 50e3, 0.0), np.hypot(50e3, 50e3))
    assert np.isclose(f1R_for_resonance(50e3, 0.0, 0.0), 50e3)
    # with rare detuning subtracted
    assert np.isclose(f1R_for_resonance(3.0, 4.0, 5.0), 0.0)


def test_eta_mismatch_values_and_nan():
    r = eta_mismatch(0.0, 50e3, np.hypot(50e3, 50e3), rms_b_AR_Hz=600.0)
    # Omega_A = 50e3, Omega_R = 70.7e3, sin_A = 1, sin_R = 1
    assert np.isclose(r["DeltaOmega_Hz"], 50e3 - np.hypot(50e3, 50e3))
    assert np.isclose(r["g_eff_Hz"], 150.0)
    assert np.isclose(r["DeltaOmega_over_geff"], r["DeltaOmega_Hz"] / 150.0)
    r0 = eta_mismatch(0.0, 50e3, 70.7e3, rms_b_AR_Hz=0.0)
    assert np.isnan(r0["DeltaOmega_over_geff"])


# ---------------- exponential fit ----------------

def test_mad_sigma_gaussian():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100_000) * 2.5
    assert abs(mad_sigma(x) - 2.5) < 0.05


def test_interp_threshold_time():
    t = np.array([0.0, 1.0, 2.0])
    r = np.array([1.0, 0.5, 0.0])
    assert np.isclose(interp_threshold_time(t, r, 0.25), 1.5)
    assert np.isclose(interp_threshold_time(t, r, 2.0), 0.0)  # already below
    assert np.isnan(interp_threshold_time(t, np.array([1.0, 1.0, 1.0]), 0.5))


def test_exponential_fit_recovers_tau():
    rng = np.random.default_rng(1)
    t = np.linspace(0.0, 10.0, 400)
    tau = 1.7
    y = 5.0 - 2.0 * np.exp(-t / tau) + 1e-4 * rng.standard_normal(len(t))
    fit = fit_exponential_to_plateau(t, y)
    assert fit.status == "OK"
    assert abs(fit.tau_s - tau) / tau < 0.05
    assert abs(fit.I_inf - 5.0) < 0.01
    # t90: |y - I_inf| = 2 exp(-t/tau) hits 0.1*R0, where R0 is the MEDIAN
    # residual over the first 10% of samples (t in [0, 1] -> t_med ~ 0.5)
    r0 = 2.0 * np.exp(-0.5 / tau)
    want_t90 = tau * np.log(2.0 / (0.1 * r0))
    assert abs(fit.t90_s - want_t90) / want_t90 < 0.1


def test_exponential_fit_flat_trace():
    rng = np.random.default_rng(2)
    t = np.linspace(0.0, 1.0, 100)
    y = 3.0 + 1e-6 * rng.standard_normal(100)
    fit = fit_exponential_to_plateau(t, y)
    assert fit.status == "FLAT"
    assert np.isnan(fit.tau_s)
    assert fit.t90_s == 0.0


def test_exponential_fit_too_few():
    fit = fit_exponential_to_plateau(np.array([0.0, 1.0]), np.array([1.0, 2.0]))
    assert fit.status == "TOO_FEW"


# ---------------- stable region ----------------

def test_stable_region_pass_fraction_and_runs():
    # x bins at 0.0, 0.1, 0.2, 0.3; contrast passes (< 0, |c| >= 0.2) in middle two
    x = np.repeat([0.0, 0.1, 0.2, 0.3], 5)
    contrast = np.concatenate([
        np.full(5, +0.5),          # fails (positive)
        np.full(5, -0.5),          # passes
        np.full(5, -0.3),          # passes
        np.full(5, -0.1),          # fails (|c| < 0.2)
    ])
    bins = compute_bin_stats(x, contrast, c_min=0.2, bin_decimals=1)
    assert [b.pass_fraction for b in bins] == [0.0, 1.0, 1.0, 0.0]
    regions = find_stable_regions(bins, p_min=0.8)
    assert regions[0].x_lo == 0.1 and regions[0].x_hi == 0.2
    assert regions[0].n_bins == 2 and regions[0].total_points == 10

    stats = stable_region_stats(x, contrast, c_min=0.2, p_min=0.8, bin_decimals=1)
    assert stats["best_region"]["n_bins"] == 2
    assert len(stats["per_bin"]) == 4


def test_stable_region_none_found():
    stats = stable_region_stats(
        np.array([0.0, 0.1]), np.array([0.5, 0.4]), c_min=0.2, p_min=0.8, bin_decimals=1
    )
    assert stats["best_region"] is None
