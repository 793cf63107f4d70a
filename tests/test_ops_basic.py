"""Unit tests for core ops: activations, color, SH, freq, morton, rays."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.ops import (
    freq_encode,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    sh_encode,
    sph_from_ray,
    trunc_exp,
)
from palettenerf_tpu.utils.color import hsv_to_rgb, linear_to_srgb, rgb_to_hsv, srgb_to_linear


def test_trunc_exp_forward_backward():
    x = jnp.array([-20.0, -1.0, 0.0, 1.0, 10.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=2e-3)


def test_hsv_roundtrip_matches_opencv_convention():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)
    assert hsv[:, 0].max() < 360 and hsv[:, 0].min() >= 0
    assert hsv[:, 1:].max() <= 100 + 1e-4

    cv2 = pytest.importorskip("cv2")
    ref = cv2.cvtColor(rgb[None], cv2.COLOR_RGB2HSV)[0]  # H in [0,360) for float input
    np.testing.assert_allclose(hsv[:, 0], ref[:, 0], atol=1e-2)
    np.testing.assert_allclose(hsv[:, 1], ref[:, 1] * 100, atol=1e-2)
    np.testing.assert_allclose(hsv[:, 2], ref[:, 2] * 100, atol=1e-2)


def _sh_reference(d, degree):
    """Independent real-SH reference evaluated with numpy (same basis table)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    out = [np.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        c = 0.48860251190291987
        out += [-c * y, c * z, -c * x]
    if degree >= 3:
        out += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.94617469575755997 * z**2 - 0.31539156525251999,
            -1.0925484305920792 * x * z,
            0.54627421529603959 * (x**2 - y**2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3 * x**2 + y**2),
            2.8906114426405538 * x * y * z,
            0.45704579946446572 * y * (1 - 5 * z**2),
            0.3731763325901154 * z * (5 * z**2 - 3),
            0.45704579946446572 * x * (1 - 5 * z**2),
            1.4453057213202769 * z * (x**2 - y**2),
            0.59004358992664352 * x * (-(x**2) + 3 * y**2),
        ]
    return np.stack(out, -1)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_sh_encode(degree):
    rng = np.random.default_rng(1)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d), degree))
    assert out.shape == (128, degree**2)
    np.testing.assert_allclose(out, _sh_reference(d, degree), atol=1e-5)


def test_sh_grad_finite():
    d = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)), jnp.float32)
    g = jax.grad(lambda v: sh_encode(v, 4).sum())(d)
    assert np.isfinite(np.asarray(g)).all()


def test_freq_encode_shape_and_values():
    x = jnp.asarray([[0.5, -0.25]])
    out = freq_encode(x, degree=3)
    assert out.shape == (1, 2 * (1 + 6))
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25], atol=1e-6)
    np.testing.assert_allclose(out[0, 2:4], np.sin([0.5, -0.25]), atol=1e-6)
    np.testing.assert_allclose(out[0, 4:6], np.cos([0.5, -0.25]), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:8], np.sin([1.0, -0.5]), atol=1e-6)


def _morton_ref(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip():
    rng = np.random.default_rng(3)
    coords = rng.integers(0, 1024, (256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expected = np.array([_morton_ref(*c) for c in coords], dtype=np.uint32)
    np.testing.assert_array_equal(codes, expected)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    o = jnp.asarray([[0.0, 0, -3], [0, 0, -3], [5.0, 5, 5]])
    d = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [0.0, 0, 1]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(far[0], 4.0, atol=1e-5)
    assert near[1] > 1e9 and far[2] > 1e9  # misses


def test_near_far_min_near_clamp():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside the box
    d = jnp.asarray([[0.0, 0, 1.0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 0.2, atol=1e-6)
    np.testing.assert_allclose(far[0], 1.0, atol=1e-6)


def test_sph_from_ray_on_sphere():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])  # straight up (y-up) -> theta = 0
    c = sph_from_ray(o, d, radius=2.0)
    np.testing.assert_allclose(c[0, 0], -1.0, atol=1e-5)  # 2*0/pi - 1
