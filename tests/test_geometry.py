"""Geometry and coupling parity: Platonic exactness, Fibonacci fallback,
coupling law symmetry/values (reference dipolar_ensemble_with_rare.py:107-299)."""

import numpy as np
import pytest

from quantumsimulations_tpu.models.geometry import (
    coupling_statistics,
    dipolar_couplings_from_positions,
    fibonacci_sphere,
    platonic_vertices,
    shell_positions_with_rare_center,
)


@pytest.mark.parametrize("n", [4, 6, 8, 12, 20])
def test_platonic_on_unit_sphere_and_symmetric(n):
    pts = platonic_vertices(n)
    assert pts.shape == (n, 3)
    assert np.allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-12)
    # vertex-transitive: every vertex has the same sorted distance profile
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    profiles = np.sort(d, axis=1)
    assert np.allclose(profiles, profiles[0], atol=1e-9)


def test_platonic_octahedron_exact():
    pts = platonic_vertices(6)
    expected = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=float,
    )
    assert np.allclose(pts, expected)


def test_platonic_unsupported_raises():
    with pytest.raises(ValueError):
        platonic_vertices(7)


def test_fibonacci_matches_reference_formula():
    n = 9
    pts = fibonacci_sphere(n)
    golden = (1.0 + np.sqrt(5.0)) / 2.0
    for i in range(n):
        y = 1.0 - 2.0 * (i + 0.5) / n
        r_xy = np.sqrt(max(0.0, 1.0 - y * y))
        ang = 2.0 * np.pi * i / golden
        assert np.allclose(pts[i], [r_xy * np.cos(ang), y, r_xy * np.sin(ang)], atol=1e-12)


@pytest.mark.parametrize("n_sea", [4, 6, 9, 12])
def test_shell_positions_shape_and_center(n_sea):
    radius = 0.282393
    pos = shell_positions_with_rare_center(n_sea, radius)
    assert pos.shape == (n_sea + 1, 3)
    assert np.allclose(pos[-1], 0.0)
    assert np.allclose(np.linalg.norm(pos[:-1], axis=1), radius, atol=1e-12)


def test_shell_positions_rejects_nonpositive():
    with pytest.raises(ValueError):
        shell_positions_with_rare_center(0)


def test_couplings_match_pairwise_oracle():
    pos = shell_positions_with_rare_center(6, 0.282393)
    gs, gr, scale = 8.1812e7, 6.976e7, 2 * np.pi
    b = dipolar_couplings_from_positions(pos, scale, gs, gr)
    n = pos.shape[0]
    assert np.allclose(b, b.T)
    assert np.allclose(np.diag(b), 0.0)
    # scalar oracle, straight from the coupling law
    for i in range(n):
        for j in range(i + 1, n):
            r = pos[i] - pos[j]
            rij = np.linalg.norm(r)
            cos_th = r[2] / rij
            geom = (1.0 - 3.0 * cos_th**2) / rij**3
            gi = gr if i == n - 1 else gs
            gj = gr if j == n - 1 else gs
            assert np.isclose(b[i, j], gi * gj * scale * geom, rtol=1e-14)


def test_couplings_coincident_sites_raise():
    pos = np.zeros((3, 3))
    pos[0] = [1.0, 0, 0]
    pos[1] = [1.0, 0, 0]
    with pytest.raises(ValueError):
        dipolar_couplings_from_positions(pos, 1.0, 1.0, 1.0)


def test_coupling_statistics_keys_and_consistency():
    pos = shell_positions_with_rare_center(6, 0.282393e-9)
    scale = 1.0e-7 * 1.054571817e-34
    b = dipolar_couplings_from_positions(pos, scale, 8.1812e7, 6.976e7)
    stats = coupling_statistics(b, n_sea=6)
    sea_rare = np.abs(b[:6, 6]) / (2 * np.pi)
    assert np.isclose(stats["avg_b_AR_Hz"], sea_rare.mean())
    assert np.isclose(stats["max_b_AR_Hz"], sea_rare.max())
    assert stats["rms_b_AA_Hz"] > 0
