"""Compacted eval renderer vs the plain fixed-width renderer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
from palettenerf_tpu.ops.occupancy import packbits
from palettenerf_tpu.render.nerf_renderer import RenderSettings, render_nerf_eval


def _setup():
    spec = NeRFSpec.build(bound=1.0, grid_levels=8, log2_hashmap_size=15)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    bitfield = packbits(jnp.ones((64 ** 3,), jnp.uint8))
    n = 128
    rng = np.random.default_rng(0)
    ro = np.tile(np.array([[0, 0, -1.5]], np.float32), (n, 1))
    rd = rng.normal(size=(n, 3)) * 0.15 + [0, 0, 1]
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32)
    # density_scale makes the random-init field opaque, mimicking a converged scene
    # where rays saturate after a few samples (the compaction premise)
    base = RenderSettings(bound=1.0, cascade=1, grid_size=64, dt_gamma=0.0,
                          max_steps=64, num_samples=48, t_thresh=1e-2, min_near=0.05,
                          density_scale=30.0)
    return spec, params, bitfield, jnp.asarray(ro), jnp.asarray(rd), base


def _jit_render(spec, settings):
    return jax.jit(lambda p, b, ro, rd: render_nerf_eval(p, spec, b, ro, rd, settings))


def test_full_coverage_rounds_match_plain():
    """divisor-1 rounds must reproduce the single-pass result exactly."""
    spec, params, bitfield, ro, rd, base = _setup()
    plain = _jit_render(spec, base)(params, bitfield, ro, rd)
    rounds = dataclasses.replace(base, compaction_rounds=((1, 16), (1, 16), (1, 16)))
    comp = _jit_render(spec, rounds)(params, bitfield, ro, rd)
    np.testing.assert_allclose(np.asarray(comp["image"]), np.asarray(plain["image"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp["weights_sum"]), np.asarray(plain["weights_sum"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp["depth"]), np.asarray(plain["depth"]),
                               rtol=1e-3, atol=1e-4)


def test_compaction_rounds_close_to_plain():
    """Real compaction (shrinking ray sets) should stay visually identical: the rays
    dropped between rounds are the saturated ones."""
    spec, params, bitfield, ro, rd, base = _setup()
    plain = _jit_render(spec, base)(params, bitfield, ro, rd)
    rounds = dataclasses.replace(base, compaction_rounds=((1, 16), (2, 16), (4, 16)))
    comp = _jit_render(spec, rounds)(params, bitfield, ro, rd)
    diff = np.abs(np.asarray(comp["image"]) - np.asarray(plain["image"]))
    assert diff.mean() < 5e-3, f"mean image diff too large: {diff.mean()}"
