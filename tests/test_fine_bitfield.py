"""bake_fine_bitfield + dt-aware dual-grid march: refinement and exactness.

The fine eval bitfield (ops/occupancy.bake_fine_bitfield) must (a) never mark a
cell whose parent train cell is unoccupied, (b) actually cull empty space inside
chunky occupied train cells, and (c) leave composited renders unchanged when the
culled cells genuinely hold zero density (the train grid is chunky, the field is
a hard-edged blob) — the samples it removes have sigma 0 and contribute nothing.

The marcher consumes it as ``bitfield=(train, fine)`` with
``fine_grid_size=F``; the fine test applies ONLY where the step dt cannot skip
a fine cell (dt <= cell edge). Where dt is too coarse the marcher must fall
back to the train grid bit-exactly — the round-5 verify run showed that naively
marching a fine grid with a coarse dt steps over occupied shell cells and eats
the object. Reference culling semantics: nerf/renderer.py:552-553 packbits
threshold; dt-aware grid choice mirrors mip_from_dt (raymarching.cu:45-57).
"""

import numpy as np
import jax.numpy as jnp

from palettenerf_tpu.ops.composite import composite_rays
from palettenerf_tpu.ops.march import march_rays
from palettenerf_tpu.ops.occupancy import (
    GridState,
    bake_fine_bitfield,
    cell_world_coords,
    packbits,
)

BOUND = 1.0
H, F = 32, 64
R2 = 0.25  # hard sphere radius^2 (fat vs fine cell size 2/64)


def _density(pts):
    r2 = (pts ** 2).sum(-1)
    return jnp.where(r2 < R2, 30.0, 0.0)


def _make_state():
    xyz, _ = cell_world_coords(1, H, BOUND)
    occ = (jnp.abs(xyz[0]) < 0.75).all(-1)  # generous box around the sphere
    return GridState(
        density_grid=jnp.where(occ, 30.0, 0.0)[None, :],
        bitfield=packbits(occ),
        mean_density=jnp.asarray(20.0),  # > thresh, so thresh = density_thresh
        iter_density=jnp.asarray(0, jnp.int32),
    ), occ


def _bits(bf, n):
    return np.unpackbits(np.asarray(bf), bitorder="little")[:n].astype(bool)


def _rays(n=64):
    ang = np.linspace(-0.45, 0.45, n)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.6], (n, 1)), jnp.float32)
    d = np.stack([np.sin(ang), 0.1 * np.cos(3 * ang), np.cos(ang)], -1)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
    nears = jnp.full((n,), 0.05, jnp.float32)
    fars = jnp.full((n,), 3.2, jnp.float32)
    return rays_o, rays_d, nears, fars


def _render(bitfield, max_steps, num_samples, fine_grid_size=0):
    rays_o, rays_d, nears, fars = _rays()
    m = march_rays(rays_o, rays_d, nears, fars, bitfield, BOUND, 1,
                   H, 0.0, max_steps, num_samples, None,
                   fine_grid_size=fine_grid_size)
    sig = jnp.where(m.mask, _density(m.xyzs), 0.0)
    rgb = jnp.broadcast_to(
        jnp.asarray([0.8, 0.6, 0.4]), m.xyzs.shape).astype(jnp.float32)
    ws, depth, image = composite_rays(sig, rgb, m.dts, m.t_cum, m.mask, 1e-4)
    return np.asarray(ws), np.asarray(depth), np.asarray(image), int(
        m.mask.sum())


def test_fine_bitfield_refines_coarse():
    state, occ_coarse = _make_state()
    fine = bake_fine_bitfield(state, _density, BOUND, density_thresh=10.0,
                              fine_size=F, grid_size=H, chunk=1 << 15)
    fine_bits = _bits(fine, F ** 3).reshape(F, F, F)
    coarse_rep = np.asarray(occ_coarse).reshape(H, H, H)
    for ax in range(3):
        coarse_rep = np.repeat(coarse_rep, F // H, axis=ax)
    # (a) strict refinement: no fine bit outside an occupied train cell
    assert not (fine_bits & ~coarse_rep).any()
    # (b) real culling: the box is far bigger than the sphere
    assert fine_bits.sum() < 0.5 * coarse_rep.sum()
    # sphere interior cells (away from the surface) all stay occupied
    xyz, _ = cell_world_coords(1, F, BOUND)
    inside = np.asarray((xyz[0] ** 2).sum(-1)) < 0.8 * R2
    assert fine_bits.reshape(-1)[inside].all()


def test_fine_bitfield_composite_exact():
    """With dt well below the fine cell edge (max_steps=512, F=64) the fine
    test is active everywhere, touches far fewer samples, and composites
    identically: every sample it culls has sigma exactly 0."""
    state, _ = _make_state()
    fine = bake_fine_bitfield(state, _density, BOUND, density_thresh=10.0,
                              fine_size=F, grid_size=H, chunk=1 << 15)

    ws_c, dep_c, img_c, nvalid_c = _render(state.bitfield, 512, 512)
    ws_f, dep_f, img_f, nvalid_f = _render(
        (state.bitfield, fine), 512, 512, fine_grid_size=F)

    assert nvalid_f < 0.7 * nvalid_c
    np.testing.assert_allclose(ws_f, ws_c, atol=1e-5)
    np.testing.assert_allclose(img_f, img_c, atol=1e-5)
    np.testing.assert_allclose(dep_f, dep_c, atol=1e-4)


def test_fine_bitfield_coarse_dt_falls_back():
    """When dt > fine cell edge the fine test is UNSOUND (a step can skip an
    occupied shell cell). The dt-aware guard must then reproduce the train-grid
    march bit-exactly instead of eating the object (the round-5 verify-run
    failure mode: PSNR collapsed to 15 dB)."""
    state, _ = _make_state()
    fine = bake_fine_bitfield(state, _density, BOUND, density_thresh=10.0,
                              fine_size=F, grid_size=H, chunk=1 << 15)

    # dt_min = 2*sqrt(3)/48 ~ 0.072 >> fine edge 2/64 ~ 0.031: never safe
    ws_c, dep_c, img_c, nvalid_c = _render(state.bitfield, 48, 48)
    ws_f, dep_f, img_f, nvalid_f = _render(
        (state.bitfield, fine), 48, 48, fine_grid_size=F)

    assert nvalid_f == nvalid_c
    np.testing.assert_array_equal(ws_f, ws_c)
    np.testing.assert_array_equal(img_f, img_c)
