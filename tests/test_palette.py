"""Palette model/renderer unit tests: forward contracts, blend math, edit hooks,
hist-weight lookup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.models.palette import (
    PaletteSpec,
    get_palette_weight_with_hist,
    init_palette,
    initialize_palette,
    palette_forward,
)
from palettenerf_tpu.ops.occupancy import packbits
from palettenerf_tpu.render.nerf_renderer import RenderSettings
from palettenerf_tpu.render.palette_renderer import (
    apply_region_edit,
    apply_stylizer,
    init_stylizer,
    make_region_edit,
    region_edit_delta_hsv,
    render_palette_eval,
    render_palette_train,
    stylizer_arap_loss,
)


@pytest.fixture(scope="module")
def spec():
    return PaletteSpec.build(bound=1.0, num_basis=4, pred_clip=False,
                             grid_levels=6, log2_hashmap_size=15)


@pytest.fixture(scope="module")
def params(spec):
    p = init_palette(jax.random.PRNGKey(0), spec)
    palette = np.array([[0.1, 0.1, 0.1], [0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.2, 0.2, 0.8]])
    hist = np.random.default_rng(0).dirichlet(np.ones(4), (32, 32, 32))
    return initialize_palette(p, spec, palette, hist)


def test_palette_forward_contracts(spec, params):
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (64, 3)), jnp.float32)
    d = jnp.asarray(np.random.default_rng(2).normal(size=(64, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sigma, clip_feat, omega, off_rad, view_dep, diffuse = palette_forward(params, spec, x, d)
    assert sigma.shape == (64,) and (np.asarray(sigma) > 0).all()
    assert clip_feat.shape == (64, spec.clip_dim)
    assert omega.shape == (64, 4)
    np.testing.assert_allclose(np.asarray(omega.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(omega) > 0).all()  # softplus + 0.05, normalized
    assert off_rad.shape == (64, 13)
    assert view_dep.shape == (64, 3) and diffuse.shape == (64, 3)
    assert (np.asarray(view_dep) >= 0).all() and (np.asarray(view_dep) <= 1).all()


def test_geo_feat_detached_from_palette_heads(spec, params):
    """Palette-head losses must NOT backprop into the sigma branch (network.py:168)."""
    x = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    def loss(p):
        _, _, omega, off_rad, view_dep, diffuse = palette_forward(p, spec, x, d)
        return (omega ** 2).sum() + (off_rad ** 2).sum() + (view_dep ** 2).sum() + (diffuse ** 2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(jnp.asarray(jax.tree_util.tree_leaves(g["sigma_net"])[0])).sum()) == 0.0
    assert float(jnp.abs(g["encoder"]).sum()) == 0.0
    # but the palette encoder and heads DO receive gradient
    assert float(jnp.abs(g["encoder_palette"]).sum()) > 0.0


def test_hist_weight_lookup_matches_manual_trilinear(params):
    hw = params["hist_weights"]
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.uniform(0, 1, (32, 3)), jnp.float32)
    out = np.asarray(get_palette_weight_with_hist(rgb, hw))
    # manual trilinear at a few points
    hw_np = np.asarray(hw)
    for i in range(5):
        g = np.clip(np.asarray(rgb[i]), 0, 1) * 31
        i0 = np.clip(np.floor(g).astype(int), 0, 30)
        f = g - i0
        acc = np.zeros(hw_np.shape[-1])
        for c in range(8):
            b = [(c >> k) & 1 for k in range(3)]
            w = np.prod([f[k] if b[k] else 1 - f[k] for k in range(3)])
            acc += hw_np[i0[0] + b[0], i0[1] + b[1], i0[2] + b[2]] * w
        np.testing.assert_allclose(out[i], acc, atol=1e-5)


def test_region_edit_identity_and_recolor():
    edit = make_region_edit(num_basis=2)
    rgbs = jnp.asarray(np.random.default_rng(4).uniform(0.1, 0.9, (8, 2, 3)), jnp.float32)
    xyz = jnp.zeros((8, 3))
    clip = jnp.zeros((8, 16))
    out = apply_region_edit(edit, rgbs, xyz, clip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgbs), atol=1e-4)

    # hue rotation of basis 0 only
    orig = jnp.asarray([[0.8, 0.2, 0.2], [0.2, 0.8, 0.2]])
    new = jnp.asarray([[0.2, 0.8, 0.2], [0.2, 0.8, 0.2]])  # basis 0: red -> green
    edit2 = edit._replace(delta_hsv=region_edit_delta_hsv(orig, new))
    out2 = np.asarray(apply_region_edit(edit2, rgbs, xyz, clip))
    assert not np.allclose(out2[:, 0], np.asarray(rgbs[:, 0]), atol=1e-3)  # basis0 changed
    np.testing.assert_allclose(out2[:, 1], np.asarray(rgbs[:, 1]), atol=1e-4)  # basis1 same


def test_region_edit_spatial_mask():
    edit = make_region_edit(num_basis=1, mean_xyz=[0, 0, 0], std_xyz=0.01)
    orig = jnp.asarray([[0.8, 0.2, 0.2]])
    new = jnp.asarray([[0.2, 0.2, 0.8]])
    edit = edit._replace(delta_hsv=region_edit_delta_hsv(orig, new))
    rgbs = jnp.tile(jnp.asarray([[[0.8, 0.2, 0.2]]]), (2, 1, 1))
    xyz = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]])  # near vs far from the edit center
    out = np.asarray(apply_region_edit(edit, rgbs, xyz, jnp.zeros((2, 16))))
    assert abs(out[0] - np.asarray(rgbs[0])).max() > 0.1   # near: recolored
    assert abs(out[1] - np.asarray(rgbs[1])).max() < 1e-4  # far: untouched


def test_stylizer_identity_and_arap():
    s = init_stylizer(3)
    assert float(stylizer_arap_loss(s)) == 0.0
    M = 5
    radiance = jnp.zeros((M, 1, 1))
    omega = jnp.full((M, 3, 1), 1 / 3)
    palette = jnp.asarray(np.random.default_rng(5).uniform(0, 0.5, (1, 3, 3)), jnp.float32)
    offsets = jnp.asarray(np.random.default_rng(6).uniform(-0.1, 0.1, (M, 3, 3)), jnp.float32)
    out = apply_stylizer(s, radiance, omega, palette, offsets)
    # identity params: rgbs == sum_p omega * clip(softplus(0)*(P+off), 0, 1)
    expect = (np.asarray(omega) * np.clip(
        np.log(2) * (np.asarray(palette) + np.asarray(offsets)), 0, 1)).sum(-2)
    np.testing.assert_allclose(np.asarray(out), expect, atol=3e-4)

    s2 = s._replace(ddelta=s.ddelta * 2.0)
    assert float(stylizer_arap_loss(s2)) > 0


def _full_bitfield():
    return packbits(jnp.ones((64 ** 3,), jnp.uint8))


def test_render_palette_train_and_eval(spec, params):
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=64, dt_gamma=0.0,
                              max_steps=64, num_samples=16, t_thresh=1e-4, min_near=0.05)
    n = 32
    rng = np.random.default_rng(7)
    rays_o = np.tile(np.array([[0, 0, -1.5]], np.float32), (n, 1))
    rd = rng.normal(size=(n, 3)) * 0.05 + [0, 0, 1]
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32)

    out = render_palette_train(params, spec, _full_bitfield(), jnp.asarray(rays_o),
                               jnp.asarray(rd), jax.random.PRNGKey(0), settings,
                               require_smooth_loss=True)
    for k in ["image", "depth", "weights_sum", "omega_sparsity", "view_dep_norm",
              "offsets_norm", "smooth_norm", "view_dep_rgb", "direct_rgb",
              "diffuse_rgb", "clip_feat", "basis_acc"]:
        assert k in out, k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["image"].shape == (n, 3)
    assert out["basis_acc"].shape == (n, 4)
    # basis_acc sums to ~weights_sum (omegas sum to 1 per sample)
    np.testing.assert_allclose(np.asarray(out["basis_acc"].sum(-1)),
                               np.asarray(out["weights_sum"]), atol=1e-3)

    ev = render_palette_eval(params, spec, _full_bitfield(), jnp.asarray(rays_o),
                             jnp.asarray(rd), settings)
    for k in ["image", "depth", "depth_origin", "weights_sum", "clip_feat",
              "direct_rgb", "view_dep_rgb", "basis_acc", "basis_rgb", "unscaled_basis_rgb"]:
        assert k in ev and np.isfinite(np.asarray(ev[k])).all(), k
    assert ev["basis_rgb"].shape == (n, 12)

    # weight-mode visualization and edit hooks compile + run
    edit = make_region_edit(4, mean_xyz=[0, 0, 0], std_xyz=0.5)
    ev2 = render_palette_eval(params, spec, _full_bitfield(), jnp.asarray(rays_o),
                              jnp.asarray(rd), settings, edit=edit)
    assert np.isfinite(np.asarray(ev2["image"])).all()

    sty = init_stylizer(4)
    ev3 = render_palette_eval(params, spec, _full_bitfield(), jnp.asarray(rays_o),
                              jnp.asarray(rd), settings, stylizer=sty)
    assert np.isfinite(np.asarray(ev3["image"])).all()


def test_palette_train_gradients_flow(spec, params):
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=64, dt_gamma=0.0,
                              max_steps=32, num_samples=8, t_thresh=1e-4, min_near=0.05)
    rays_o = jnp.tile(jnp.asarray([[0, 0, -1.5]], jnp.float32), (8, 1))
    rays_d = jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (8, 1))
    gt = jnp.full((8, 3), 0.5)

    def loss(p, freeze):
        out = render_palette_train(p, spec, _full_bitfield(), rays_o, rays_d,
                                   jax.random.PRNGKey(1), settings,
                                   freeze_basis_color=freeze)
        return ((out["image"] - gt) ** 2).mean()

    g = jax.grad(lambda p: loss(p, True))(params)
    # sigma branch is detached in the palette stage (renderer.py:335)
    assert float(jnp.abs(g["encoder"]).sum()) == 0.0
    assert float(jnp.abs(g["basis_color"]).sum()) == 0.0  # frozen
    assert float(jnp.abs(g["encoder_palette"]).sum()) > 0.0

    g2 = jax.grad(lambda p: loss(p, False))(params)
    assert float(jnp.abs(g2["basis_color"]).sum()) > 0.0  # released


def test_render_palette_train_compact_parity(spec, params):
    """compact_frac=1.0 train render matches the plain path (values + grads),
    with the smooth re-forward included."""
    import dataclasses

    base = RenderSettings(bound=1.0, cascade=1, grid_size=64, dt_gamma=0.0,
                          max_steps=64, num_samples=16, t_thresh=1e-4,
                          min_near=0.05)
    n = 32
    rng = np.random.default_rng(8)
    rays_o = jnp.asarray(np.tile(np.array([[0, 0, -1.5]], np.float32), (n, 1)))
    rd = rng.normal(size=(n, 3)) * 0.05 + [0, 0, 1]
    rd = jnp.asarray((rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))

    def loss(p, settings):
        out = render_palette_train(p, spec, _full_bitfield(), rays_o, rd,
                                   jax.random.PRNGKey(1), settings,
                                   freeze_basis_color=False,
                                   require_smooth_loss=True)
        return (((out["image"] - gt) ** 2).mean() + out["smooth_norm"].mean()
                + out["omega_sparsity"].mean() + out["offsets_norm"].mean())

    l0, g0 = jax.value_and_grad(loss)(params, base)
    l1, g1 = jax.value_and_grad(loss)(
        params, dataclasses.replace(base, compact_frac=1.0))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for (path, a0), a1 in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=5e-4, atol=1e-6, err_msg=str(path))


def test_render_palette_eval_compact_parity(spec, params):
    """Eval render with compact_frac=1.0 (full budget) matches the plain path,
    including the per-basis aux maps and an active RegionEdit."""
    import dataclasses

    base = RenderSettings(bound=1.0, cascade=1, grid_size=64, dt_gamma=0.0,
                          max_steps=64, num_samples=16, t_thresh=1e-2,
                          min_near=0.05)
    n = 32
    rng = np.random.default_rng(9)
    rays_o = jnp.asarray(np.tile(np.array([[0, 0, -1.5]], np.float32), (n, 1)))
    rd = rng.normal(size=(n, 3)) * 0.05 + [0, 0, 1]
    rd = jnp.asarray((rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32))
    edit = make_region_edit(spec.num_basis, clip_dim=spec.clip_dim,
                            mean_xyz=(0.1, 0.0, 0.0), std_xyz=0.4)
    edit = edit._replace(delta_hsv=np.asarray(
        [[90.0, 1.0, 1.0]] + [[0.0, 1.0, 1.0]] * (spec.num_basis - 1), np.float32))

    a = render_palette_eval(params, spec, _full_bitfield(), rays_o, rd, base,
                            edit=edit)
    b = render_palette_eval(params, spec, _full_bitfield(), rays_o, rd,
                            dataclasses.replace(base, compact_frac=1.0),
                            edit=edit)
    for k in a:
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
