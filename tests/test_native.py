"""Native C++ kernels vs NumPy golden implementations."""

import numpy as np
import pytest

from palettenerf_tpu.native import (
    get_lib,
    point_triangle_min_dist_native,
    rgb_histogram_native,
)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (g++ build failed)")
    return lib


def test_native_histogram_matches_numpy(lib):
    # compare against the pure-NumPy formulation (inline here to avoid the
    # native fast path inside compute_rgb_histogram)
    rng = np.random.default_rng(0)
    colors = rng.uniform(0, 1, (10000, 3)).astype(np.float32)
    w = rng.uniform(0, 2, 10000).astype(np.float32)
    bpc = 5
    bw, bc = rgb_histogram_native(colors, w, bpc)

    side = 1 << bpc
    c = np.clip(colors, 0.0, 0.999)
    bins = (c * side).astype(np.uint32)
    idx = (bins[:, 0] << (2 * bpc)) | (bins[:, 1] << bpc) | bins[:, 2]
    ref = np.bincount(idx, weights=w.astype(np.float64), minlength=side ** 3)
    np.testing.assert_allclose(bw, ref, rtol=1e-10)

    codes = np.arange(side ** 3, dtype=np.uint32)
    centers = (np.stack([(codes >> (2 * bpc)) & (side - 1),
                         (codes >> bpc) & (side - 1),
                         codes & (side - 1)], -1) + 0.5) / side
    np.testing.assert_allclose(bc, centers, atol=1e-6)


def test_native_point_triangle_matches_numpy(lib):
    from palettenerf_tpu.extraction.geometry import point_triangle_distance

    rng = np.random.default_rng(1)
    tris = rng.normal(size=(20, 3, 3))
    pts = rng.normal(size=(100, 3))
    nd, nc = point_triangle_min_dist_native(pts, tris.reshape(-1, 9))

    d, _ = point_triangle_distance(pts[:, None], tris[None])
    ref = d.min(1)
    np.testing.assert_allclose(nd, ref, atol=1e-10)
