"""Shear-warp sweep renderer vs an independent per-ray reference.

The reference here marches each output ray in WORLD space, samples the baked
field bilinearly at the exact slice-crossing points (the same sample set the
sweep uses), and composites identically. It shares no geometry code with the
sweep (no homothety, no intermediate image), so agreement validates the whole
factorization: slice ordering, per-slice scale/shift, segment lengths, the
palette blend, RegionEdit, and the final homography warp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from palettenerf_tpu.data.rays import gen_rays
from palettenerf_tpu.render.baking import BakedVolume, render_baked
from palettenerf_tpu.render.palette_renderer import apply_region_edit, make_region_edit
from palettenerf_tpu.render.sweep import build_sweep_volume, plan_sweep, render_sweep

R = 48
BOUND = 1.0
P = 4


def _smooth_field(key, shape, scale=4):
    """Low-frequency random field via upsampled noise."""
    coarse = jax.random.uniform(key, tuple(max(s // scale, 2) for s in shape[:3]) + shape[3:])
    z = jax.image.resize(coarse, shape, method="linear")
    return np.asarray(z)


def make_palette_baked(seed=0) -> BakedVolume:
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    lin = np.linspace(-BOUND, BOUND, R, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    r2 = (g ** 2).sum(-1)
    density = 25.0 * np.exp(-r2 / 0.18).astype(np.float32)
    density *= _smooth_field(k[0], (R, R, R)) * 0.8 + 0.2
    diffuse = _smooth_field(k[1], (R, R, R, 3)).astype(np.float32)
    om = _smooth_field(k[2], (R, R, R, P)).astype(np.float32) + 1e-3
    om /= om.sum(-1, keepdims=True)
    offsets = (_smooth_field(k[3], (R, R, R, 3 * P)).astype(np.float32) - 0.5) * 0.2
    rad = _smooth_field(k[4], (R, R, R)).astype(np.float32) * 2.0 - 0.5
    return BakedVolume(R, BOUND, jnp.asarray(density), jnp.asarray(diffuse),
                       jnp.asarray(om), jnp.asarray(offsets), jnp.asarray(rad))


def make_nerf_baked(seed=1) -> BakedVolume:
    b = make_palette_baked(seed)
    return BakedVolume(R, BOUND, b.density, b.diffuse, None, None, None)


def look_at_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """OpenCV-style c2w (camera +z looks at target) matching data/rays.gen_rays."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, down, fwd, eye
    return pose.astype(np.float32)


def reference_render(baked: BakedVolume, pose, intr, H, W, basis_color=None,
                     edit=None, offsets_weight=1.0, bg=1.0, min_near=0.05,
                     t_thresh=1e-2, density_scale=1.0):
    """Slow per-ray reference at the sweep's sample set (world-space, gathers)."""
    rays_o, rays_d = gen_rays(pose, intr, H, W)
    o, d = rays_o.astype(np.float64), rays_d.astype(np.float64)
    fwd = pose[:3, :3] @ np.array([0, 0, 1.0])
    a = int(np.argmax(np.abs(fwd)))

    dens = np.asarray(baked.density, np.float32)
    if baked.omega is not None:
        fused = np.concatenate([dens[..., None], np.asarray(baked.diffuse),
                                np.asarray(baked.omega), np.asarray(baked.offsets),
                                np.asarray(baked.radiance)[..., None]], -1)
    else:
        fused = np.concatenate([dens[..., None], np.asarray(baked.diffuse)], -1)
    Rv = baked.resolution
    zv = np.linspace(-BOUND, BOUND, Rv)
    dz = zv[1] - zv[0]

    N = o.shape[0]
    T = np.ones(N)
    rgb_acc = np.zeros((N, 3))
    da = d[:, a]
    assert np.all(np.sign(da) == np.sign(da[0]))
    order = range(Rv) if da[0] > 0 else range(Rv - 1, -1, -1)
    delta = dz / np.abs(da)  # [N]

    bc = None if basis_color is None else np.clip(np.asarray(basis_color), 0, 1)
    for k in order:
        t_k = (zv[k] - o[:, a]) / da                       # [N]
        p = o + t_k[:, None] * d                           # [N,3] on the slice plane
        # bilinear sample in the two non-sweep dims, zero outside the volume
        ax = [i for i in range(3) if i != a]
        cu = (p[:, ax[0]] + BOUND) / (2 * BOUND) * (Rv - 1)
        cv = (p[:, ax[1]] + BOUND) / (2 * BOUND) * (Rv - 1)
        feat = np.zeros((N, fused.shape[-1]))
        u0 = np.floor(cu).astype(int)
        v0 = np.floor(cv).astype(int)
        for du in (0, 1):
            for dv in (0, 1):
                uu, vv = u0 + du, v0 + dv
                wgt = (1 - np.abs(cu - uu)) * (1 - np.abs(cv - vv))
                ok = (uu >= 0) & (uu < Rv) & (vv >= 0) & (vv < Rv) & (wgt > 0)
                idx = [None, None, None]
                idx[a] = np.full(N, k)
                idx[ax[0]] = np.clip(uu, 0, Rv - 1)
                idx[ax[1]] = np.clip(vv, 0, Rv - 1)
                vals = fused[idx[0], idx[1], idx[2]]
                feat += np.where(ok, wgt, 0.0)[:, None] * vals

        sigma = feat[:, 0] * density_scale
        if bc is not None:
            Pn = bc.shape[0]
            om = feat[:, 4:4 + Pn]
            off = feat[:, 4 + Pn:4 + 4 * Pn].reshape(N, Pn, 3)
            rad = feat[:, 4 + 4 * Pn:4 + 4 * Pn + 1]
            sp = np.logaddexp(0.0, rad)                     # softplus
            final = sp[..., None] * (bc[None] + offsets_weight * off)
            if edit is not None:
                final = np.asarray(apply_region_edit(
                    edit, jnp.asarray(final, jnp.float32), jnp.asarray(p, jnp.float32),
                    jnp.zeros((N, edit.mean_clip.shape[0]), jnp.float32)))
            rgb = (om[..., None] * final).sum(-2)
        else:
            rgb = feat[:, 1:4]

        valid = (t_k > min_near) & (T > t_thresh)
        alpha = np.where(valid, 1.0 - np.exp(-sigma * delta), 0.0)
        w = T * alpha
        rgb_acc += w[:, None] * rgb
        T *= 1.0 - alpha

    img = rgb_acc + (1.0 - T)[:, None] * 0.0 + T[:, None] * bg
    return img.reshape(H, W, 3), (1.0 - T).reshape(H, W)


INTR = (70.0, 70.0, 32.0, 32.0)
HW = 64


def _psnr(x, y):
    return -10 * np.log10(np.mean((np.asarray(x) - np.asarray(y)) ** 2) + 1e-12)


@pytest.mark.parametrize("eye", [(0.0, 0.1, -2.6), (2.4, 0.8, 0.9), (-0.9, 2.5, -0.4)])
def test_sweep_matches_ray_reference_palette(eye):
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose(eye)
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    ref_img, ref_ws = reference_render(baked, pose, INTR, HW, HW, basis_color=bc)
    p = _psnr(out["image"], ref_img)
    assert p > 31.0, f"sweep vs per-ray reference PSNR {p:.2f} (eye {eye})"
    assert np.mean(np.abs(np.asarray(out["weights_sum"]) - ref_ws)) < 0.02


def test_sweep_matches_ray_reference_nerf():
    baked = make_nerf_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.3, -2.5, 0.8))
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160)
    ref_img, _ = reference_render(baked, pose, INTR, HW, HW)
    p = _psnr(out["image"], ref_img)
    assert p > 31.0, f"nerf sweep PSNR {p:.2f}"


def test_sweep_region_edit_matches_reference():
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.0, 0.2, -2.6))
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, -0.1), std_xyz=0.3)
    edit = edit._replace(delta_hsv=jnp.asarray(
        [[120.0, 1.0, 1.0], [0.0, 0.5, 1.5], [180.0, 1.0, 0.5], [0.0, 1.0, 1.0]]))
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc, edit=edit,
                       offsets_weight=0.5)
    ref_img, _ = reference_render(baked, pose, INTR, HW, HW, basis_color=bc,
                                  edit=edit, offsets_weight=0.5)
    p = _psnr(out["image"], ref_img)
    assert p > 30.0, f"edited sweep PSNR {p:.2f}"
    # and the edit actually does something
    base = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    assert np.abs(np.asarray(out["image"]) - np.asarray(base["image"])).max() > 0.05


def test_sweep_vs_render_baked_consistency():
    """Different sample sets (slice crossings vs uniform-t), so PSNR-level only."""
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.0, 0.3, -2.6))
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=192, basis_color=bc)
    rays_o, rays_d = gen_rays(pose, INTR, HW, HW)
    gold = render_baked(baked, jnp.asarray(rays_o), jnp.asarray(rays_d),
                        num_samples=160, t_thresh=1e-2, bg_color=1.0,
                        min_near=0.05, basis_color=bc)
    p = _psnr(out["image"], np.asarray(gold["image"]).reshape(HW, HW, 3))
    assert p > 26.0, f"sweep vs render_baked PSNR {p:.2f}"


def test_sweep_occupancy_skip_is_lossless():
    baked = make_palette_baked()
    # hollow out a z-slab entirely
    dens = np.asarray(baked.density).copy()
    dens[:, :, 5:12] = 0.0
    baked = baked._replace(density=jnp.asarray(dens))
    sv = build_sweep_volume(baked)
    assert not bool(np.asarray(sv.occ[2])[6])  # slab slices marked empty
    pose = look_at_pose((0.2, 0.4, -2.6))
    bc = np.eye(4, 3, dtype=np.float32) * 0.8 + 0.1
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    ref_img, _ = reference_render(baked, pose, INTR, HW, HW, basis_color=bc)
    assert _psnr(out["image"], ref_img) > 31.0


def test_plan_picks_major_axis():
    for eye, want in [((0, 0, -3), 2), ((3, 0.2, 0), 0), ((0.1, 3, 0.2), 1)]:
        plan = plan_sweep(look_at_pose(eye), INTR, HW, HW, BOUND, 128)
        assert plan.axis == want


def test_sweep_block_skip_matches_per_slice():
    """skip='block' (slab-granularity lax.cond) vs skip='slice': identical math,
    only the skip predicate granularity differs — must agree to rounding."""
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.1, 0.0, 0.0), std_xyz=0.4)
    edit = edit._replace(delta_hsv=jnp.asarray(
        [[90.0, 1.0, 1.0], [0.0, 0.7, 1.2], [200.0, 1.0, 0.8], [0.0, 1.0, 1.0]]))
    for eye in [(0.0, 0.1, -2.6), (2.4, 0.8, 0.9)]:  # covers flip both ways
        pose = look_at_pose(eye)
        a = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc,
                         edit=edit, skip="block")
        b = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc,
                         edit=edit, skip="slice")
        p = _psnr(a["image"], b["image"])
        assert p > 45.0, f"block vs per-slice PSNR {p:.2f} (eye {eye})"
        assert np.mean(np.abs(np.asarray(a["weights_sum"])
                              - np.asarray(b["weights_sum"]))) < 5e-3


def test_sweep_localized_edit_culling():
    """A tightly-localized RegionEdit (std_xyz=0.05 -> ~0.59 world-unit cull
    radius) exercises the per-slice HSV-culling cond; result must still match
    the per-ray reference which always applies the full gaussian."""
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.0, 0.2, -2.6))
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.15, 0.1, 0.0), std_xyz=0.05)
    edit = edit._replace(delta_hsv=jnp.asarray(
        [[160.0, 1.0, 1.0], [200.0, 1.0, 1.4], [60.0, 1.0, 0.6], [300.0, 1.0, 1.0]]))
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc, edit=edit)
    ref_img, _ = reference_render(baked, pose, INTR, HW, HW, basis_color=bc, edit=edit)
    p = _psnr(out["image"], ref_img)
    assert p > 30.0, f"culled localized edit PSNR {p:.2f}"
    # the edit is visible somewhere (the cull didn't silently kill it)
    base = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    assert np.abs(np.asarray(out["image"]) - np.asarray(base["image"])).max() > 5e-3


def test_sweep_single_basis_localized_edit():
    """Single touched basis AND tight spatial mask: exercises the restricted
    delta-form edit (om_e * (edited - plain) added to the plain contraction)
    together with the per-slice cull cond's zero-delta branch."""
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.0, 0.2, -2.6))
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.15, 0.1, 0.0), std_xyz=0.05)
    edit = edit._replace(delta_hsv=jnp.asarray(
        [[0.0, 1.0, 1.0], [0.0, 1.0, 1.0], [140.0, 1.2, 0.7], [0.0, 1.0, 1.0]]))
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc, edit=edit)
    ref_img, _ = reference_render(baked, pose, INTR, HW, HW, basis_color=bc, edit=edit)
    p = _psnr(out["image"], ref_img)
    assert p > 30.0, f"single-basis culled edit PSNR {p:.2f}"
    base = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    assert np.abs(np.asarray(out["image"]) - np.asarray(base["image"])).max() > 5e-3


def test_sweep_neutral_edit_is_plain_render():
    """An edit whose deltas are all (0,1,1) must drop the HSV branch entirely
    and bit-match the no-edit render (edit_bases static pruning)."""
    baked = make_palette_baked()
    sv = build_sweep_volume(baked)
    pose = look_at_pose((0.0, 0.2, -2.6))
    bc = np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9], [0.8, 0.8, 0.2]])
    edit = make_region_edit(P, clip_dim=1)  # neutral deltas, no masks
    out = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc, edit=edit)
    base = render_sweep(sv, pose, INTR, HW, HW, u_res=160, basis_color=bc)
    np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(base["image"]))
