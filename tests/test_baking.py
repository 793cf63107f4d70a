"""Baked-volume rendering: bake a field and check renders approximate the live model."""

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
from palettenerf_tpu.models.palette import PaletteSpec, init_palette, initialize_palette
from palettenerf_tpu.render.baking import bake_nerf, bake_palette, render_baked


def test_bake_nerf_and_render():
    spec = NeRFSpec.build(bound=1.0, grid_levels=4, log2_hashmap_size=13)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    baked = bake_nerf(params, spec, resolution=32, chunk=8192)
    assert baked.density.shape == (32, 32, 32)
    assert np.isfinite(np.asarray(baked.density)).all()

    ro = jnp.tile(jnp.asarray([[0, 0, -1.5]], jnp.float32), (8, 1))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (8, 1))
    out = jax.jit(lambda: render_baked(baked, ro, rd, num_samples=64))()
    assert out["image"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_bake_palette_keeps_edits_live():
    spec = PaletteSpec.build(bound=1.0, num_basis=4, grid_levels=4, log2_hashmap_size=13)
    params = init_palette(jax.random.PRNGKey(0), spec)
    palette = np.array([[0.1, 0.1, 0.1], [0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.2, 0.2, 0.8]])
    params = initialize_palette(params, spec, palette, None)
    baked = bake_palette(params, spec, resolution=24, chunk=8192)
    assert baked.omega.shape == (24, 24, 24, 4)
    np.testing.assert_allclose(np.asarray(baked.omega.sum(-1)), 1.0, atol=1e-4)

    ro = jnp.tile(jnp.asarray([[0, 0, -1.5]], jnp.float32), (8, 1))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (8, 1))
    img0 = render_baked(baked, ro, rd, num_samples=48, basis_color=palette)["image"]
    edited = palette.copy()
    edited[1] = [0.1, 0.1, 0.9]  # recolor basis 1 without re-baking
    img1 = render_baked(baked, ro, rd, num_samples=48, basis_color=edited)["image"]
    assert not np.allclose(np.asarray(img0), np.asarray(img1), atol=1e-4)
