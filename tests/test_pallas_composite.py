"""Pallas fused compositor vs the XLA golden implementation (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.ops.composite import composite_rays
from palettenerf_tpu.ops.pallas_composite import composite_rays_pallas


def test_pallas_composite_matches_xla():
    rng = np.random.default_rng(0)
    N, S = 100, 64  # non-multiple of the block size exercises padding
    sig = jnp.asarray(rng.uniform(0, 40, (N, S)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (N, S, 3)), jnp.float32)
    dts = jnp.full((N, S), 0.01)
    tc = jnp.cumsum(dts, 1)
    nv = rng.integers(0, S + 1, N)
    mask = jnp.asarray(np.arange(S)[None] < nv[:, None])

    a_ws, a_d, a_img = composite_rays(sig, rgb, dts, tc, mask, 1e-2)
    interpret = jax.default_backend() != "tpu"
    b_ws, b_d, b_img = composite_rays_pallas(sig, rgb, dts, tc, mask,
                                             t_thresh=1e-2, interpret=interpret)
    np.testing.assert_allclose(np.asarray(a_ws), np.asarray(b_ws), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(b_d), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_img), np.asarray(b_img), rtol=1e-4, atol=1e-5)
