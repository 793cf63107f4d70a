"""Palette-extraction tests: histogram parity, point-triangle distance, hull
simplification, Tan18 weights, and the full orchestrator on synthetic colors."""

import numpy as np
import pytest

from palettenerf_tpu.extraction.geometry import point_triangle_distance
from palettenerf_tpu.extraction.histogram import compute_rgb_histogram
from palettenerf_tpu.extraction.hull import hull_simplification, outside_hull_rmse
from palettenerf_tpu.extraction.tan18 import star_tetra_weights


def test_histogram_binning_and_centers():
    colors = np.array([[0.0, 0.0, 0.0], [0.99, 0.99, 0.99], [0.5, 0.25, 0.75]], np.float32)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    bw, bc = compute_rgb_histogram(colors, w, bits_per_channel=3)
    assert bw.shape == (512,) and bc.shape == (512, 3)
    assert bw.sum() == pytest.approx(6.0)
    # black -> bin 0; near-white -> last bin
    assert bw[0] == 1.0
    assert bw[-1] == 2.0
    # [0.5, 0.25, 0.75] -> bins (4, 2, 6) -> idx 4*64 + 2*8 + 6 = 278
    assert bw[278] == 3.0
    np.testing.assert_allclose(bc[0], [0.0625, 0.0625, 0.0625])
    np.testing.assert_allclose(bc[278], [(4 + 0.5) / 8, (2 + 0.5) / 8, (6 + 0.5) / 8])


def test_histogram_weighted_sum_matches_numpy():
    rng = np.random.default_rng(0)
    colors = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    w = rng.uniform(0, 2, 5000).astype(np.float32)
    bw, _ = compute_rgb_histogram(colors, w, 5)
    assert bw.shape == (32768,)
    assert bw.sum() == pytest.approx(w.sum(), rel=1e-5)


def test_point_triangle_distance_cases():
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    # above interior -> perpendicular distance
    d, c = point_triangle_distance(np.array([0.25, 0.25, 1.0]), tri)
    assert d == pytest.approx(1.0)
    np.testing.assert_allclose(c, [0.25, 0.25, 0.0], atol=1e-12)
    # beyond vertex a
    d, c = point_triangle_distance(np.array([-1.0, -1.0, 0.0]), tri)
    assert d == pytest.approx(np.sqrt(2))
    np.testing.assert_allclose(c, [0, 0, 0], atol=1e-12)
    # beyond edge b->c
    d, c = point_triangle_distance(np.array([1.0, 1.0, 0.0]), tri)
    assert d == pytest.approx(np.sqrt(2) / 2)
    # inside the plane region -> zero distance
    d, c = point_triangle_distance(np.array([0.2, 0.3, 0.0]), tri)
    assert d == pytest.approx(0.0, abs=1e-12)


def test_point_triangle_distance_random_vs_bruteforce():
    rng = np.random.default_rng(1)
    tri = rng.normal(size=(3, 3))
    pts = rng.normal(size=(50, 3))
    d, c = point_triangle_distance(pts[:, None], tri[None])
    # brute force: dense barycentric sampling of the triangle
    u = np.linspace(0, 1, 200)
    uu, vv = np.meshgrid(u, u)
    m = uu + vv <= 1
    samples = (1 - uu[m] - vv[m])[:, None] * tri[0] + uu[m][:, None] * tri[1] + vv[m][:, None] * tri[2]
    brute = np.linalg.norm(pts[:, None, :] - samples[None], axis=-1).min(1)
    np.testing.assert_allclose(d[:, 0], brute, atol=2e-2)


def _tetra_cloud(rng, n=2000):
    """Points inside a known tetrahedron + corner concentrations."""
    verts = np.array([[0.05, 0.05, 0.05], [0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.2, 0.2, 0.9]])
    w = rng.dirichlet(np.ones(4) * 0.4, n)
    return w @ verts, verts


def test_hull_simplification_recovers_tetra():
    rng = np.random.default_rng(2)
    pts, verts = _tetra_cloud(rng)
    pal = hull_simplification(pts, error_thres=5.0 / 255.0)
    assert 4 <= len(pal) <= 10
    # every true vertex should be within ~0.12 of some palette color
    dmat = np.linalg.norm(verts[:, None] - pal[None], axis=-1)
    assert dmat.min(1).max() < 0.12


def test_hull_simplification_target_size():
    rng = np.random.default_rng(3)
    pts, _ = _tetra_cloud(rng)
    # add extra structure so the initial hull has more vertices
    pts = np.concatenate([pts, rng.uniform(0.2, 0.8, (500, 3))])
    pal = hull_simplification(pts, target_size=4)
    # like the reference, the collapse can stall just above target when every
    # remaining edge's LP cone is degenerate — accept a small palette
    assert 4 <= len(pal) <= 6


def test_outside_hull_rmse_zero_when_inside():
    verts = np.eye(3)
    verts = np.vstack([verts, [0, 0, 0], [1, 1, 1]])
    pts = np.full((10, 3), 0.4)
    assert outside_hull_rmse(verts, pts, np.ones(10)) == 0.0


def test_star_tetra_weights_reconstruct():
    rng = np.random.default_rng(4)
    palette = np.array([
        [0.02, 0.02, 0.02], [0.95, 0.1, 0.1], [0.1, 0.95, 0.1],
        [0.1, 0.1, 0.95], [0.9, 0.9, 0.9],
    ])
    # points inside the palette hull
    w_true = rng.dirichlet(np.ones(5) * 0.5, 500)
    pts = w_true @ palette
    w = star_tetra_weights(pts, palette, order=0)
    assert w.shape == (500, 5)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    assert (w > -1e-9).all()
    recon = w @ palette
    err = np.abs(recon - pts).max()
    assert err < 1e-6, f"reconstruction error {err}"


def test_star_tetra_weights_projects_outside_points():
    palette = np.array([
        [0.1, 0.1, 0.1], [0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.2, 0.2, 0.8],
    ])
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])  # outside
    w = star_tetra_weights(pts, palette)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_full_extraction_pipeline(tmp_path):
    from palettenerf_tpu.extraction.extract import palette_extraction

    rng = np.random.default_rng(5)
    pts, verts = _tetra_cloud(rng, 20000)
    pal, hw = palette_extraction({"colors": pts.clip(0, 1)}, str(tmp_path))
    assert pal.shape[1] == 3 and 4 <= len(pal) <= 10
    assert hw.shape == (32, 32, 32, len(pal))
    import os

    assert os.path.exists(tmp_path / "palette.npz")
    assert os.path.exists(tmp_path / "hist_weights.npz")
    np.testing.assert_allclose(hw.reshape(-1, len(pal)).sum(-1), 1.0, atol=1e-5)
