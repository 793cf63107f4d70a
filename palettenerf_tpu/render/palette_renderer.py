"""Palette volume renderer: training branch, eval branch with edit hooks.

TPU-native re-design of ``palette/renderer.py`` (PaletteRenderer.run_cuda). Same
fixed-width pipeline as the NeRF renderer; the palette blend

    rgbs = sum_p omega_p * softplus(radiance) * (basis_color_p + offsets_p) + view_dep

(renderer.py:349-351) runs per-sample, sigma is **detached** in training (:335), and ALL
auxiliary channel maps (sparsity/offset/view-dep/smooth norms, view-dep / direct /
diffuse rgb, clip features, per-basis omegas+rgbs) are composited with ONE shared weight
computation instead of the reference's repeated flex-composite passes (:383-397,
:508-515; the ordering hazard on ``rays_alive`` documented at :517-519 disappears
entirely — there is no mutable ray state).

Edit hooks (eval): ``RegionEdit`` per-palette HSV recolor with spatial/semantic Gaussian
masks (:83-147), ``Stylizer`` photorealistic style transfer (:151-183), plus the scalar
``offsets_weight`` / ``view_dep_weight`` dials (:484, :494).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.nerf import encode_rand_for
from ..models.palette import PaletteSpec, palette_background, palette_forward
from ..ops.composite import composite_channels, composite_weights
from ..ops.march import march_rays
from ..ops.rays import near_far_from_aabb, sph_from_ray
from ..utils.color import hsv_to_rgb, rgb_to_hsv
from .nerf_renderer import RenderSettings, _sup
from .nerf_renderer import _compact_budget as _cb
from .nerf_renderer import compact_overflow as _co
from .nerf_renderer import forward_compact as _fc


# --------------------------------------------------------------------------- edits

class RegionEdit(NamedTuple):
    """Render-time recoloring state (palette/renderer.py:83-147). All fields are
    arrays so the edit is jit-compatible; use ``make_region_edit`` to build."""

    delta_hsv: jnp.ndarray        # [P, 3]: dH (deg), S scale, V scale
    mean_xyz: jnp.ndarray         # [3]
    use_xyz: jnp.ndarray          # [] bool
    std_xyz: jnp.ndarray          # []
    mean_clip: jnp.ndarray        # [clip_dim]
    use_clip: jnp.ndarray         # [] bool
    std_clip: jnp.ndarray         # []
    weight_mode: bool = False     # static: visualize the mask instead of recoloring


def make_region_edit(num_basis: int, clip_dim: int = 16,
                     mean_xyz=None, std_xyz=1.0, mean_clip=None, std_clip=1.0,
                     weight_mode: bool = False) -> RegionEdit:
    # HOST (numpy) arrays: jit paths accept them as inputs transparently, and the
    # sweep renderer reads the scalar fields on the host every frame — numpy
    # fields avoid a device->host sync per read (delta_hsv may be either; it is
    # only ever passed INTO jit).
    import numpy as _np

    dh = _np.zeros((num_basis, 3), _np.float32)
    dh[:, 1:] = 1.0
    return RegionEdit(
        delta_hsv=dh,
        mean_xyz=_np.zeros(3, _np.float32) if mean_xyz is None
        else _np.asarray(mean_xyz, _np.float32),
        use_xyz=_np.asarray(mean_xyz is not None),
        std_xyz=_np.asarray(float(std_xyz), _np.float32),
        mean_clip=_np.zeros(clip_dim, _np.float32) if mean_clip is None
        else _np.asarray(mean_clip, _np.float32),
        use_clip=_np.asarray(mean_clip is not None),
        std_clip=_np.asarray(float(std_clip), _np.float32),
        weight_mode=weight_mode,
    )


def region_edit_delta_hsv(rgb_orig, rgb_new) -> jnp.ndarray:
    """Per-palette (dH, S-scale, V-scale) from original/modified palette colors
    (renderer.py:105-119)."""
    hsv_o = rgb_to_hsv(jnp.asarray(rgb_orig))
    hsv_n = rgb_to_hsv(jnp.asarray(rgb_new))
    dh = jnp.mod(hsv_n[:, 0] - hsv_o[:, 0] + 360.0, 360.0)
    ds = hsv_n[:, 1] / (hsv_o[:, 1] + 1e-9)
    dv = hsv_n[:, 2] / (hsv_o[:, 2] + 1e-9)
    return jnp.stack([dh, ds, dv], -1)


def apply_region_edit(edit: RegionEdit, rgbs, xyz, clip_feat):
    """rgbs [M, P, 3] per-sample per-basis colors; xyz [M,3]; clip_feat [M,C].
    Returns edited rgbs (renderer.py:121-147)."""
    hsv = rgb_to_hsv(rgbs)
    w = jnp.ones(rgbs.shape[:-2] + (1,))
    w = jnp.where(
        edit.use_xyz,
        w * jnp.exp(-((xyz - edit.mean_xyz) ** 2).sum(-1, keepdims=True) / edit.std_xyz),
        w,
    )
    w = jnp.where(
        edit.use_clip,
        w * jnp.exp(-((clip_feat - edit.mean_clip) ** 2).sum(-1, keepdims=True) / edit.std_clip),
        w,
    )
    hsv_new = jnp.stack([
        jnp.mod(hsv[..., 0] + edit.delta_hsv[:, 0] + 360.0, 360.0),
        jnp.clip(hsv[..., 1] * edit.delta_hsv[:, 1], 0.0, None),
        jnp.clip(hsv[..., 2] * edit.delta_hsv[:, 2], 0.0, None),
    ], -1)
    rgb_new = hsv_to_rgb(hsv_new)
    if edit.weight_mode:
        return jnp.broadcast_to(w[..., None], rgbs.shape) * jnp.ones_like(rgbs)
    return rgbs + w[..., None] * (rgb_new - rgbs)


class StylizerParams(NamedTuple):
    """Learnable style-transfer parameters (palette/renderer.py:151-183)."""

    dI: jnp.ndarray      # [P] intensity offsets
    dP: jnp.ndarray      # [1, P, 3] palette color offsets
    ddelta: jnp.ndarray  # [P, 3, 3] per-palette offset transforms


def init_stylizer(num_basis: int) -> StylizerParams:
    return StylizerParams(
        dI=jnp.zeros((num_basis,)),
        dP=jnp.zeros((1, num_basis, 3)),
        ddelta=jnp.tile(jnp.eye(3)[None], (num_basis, 1, 1)),
    )


def stylizer_arap_loss(s: StylizerParams) -> jnp.ndarray:
    """Orthogonality (as-rigid-as-possible) penalty on ddelta (renderer.py:162-164)."""
    eye = jnp.eye(3)[None]
    return ((jnp.einsum("pij,pkj->pik", s.ddelta, s.ddelta) - eye) ** 2).sum()


def apply_stylizer(s: StylizerParams, radiance, omega, palette, offsets, view_dep=None):
    """radiance [M,1,1], omega [M,P,1], palette [1|M,P,3], offsets [M,P,3]
    -> rgbs [M,3] (renderer.py:166-183)."""
    P = s.dI.shape[0]
    pal = palette + s.dP
    offs = jnp.einsum("npi,pij->npj", offsets, s.ddelta)
    basis_rgb = jnp.clip(
        jnp.clip(jax.nn.softplus(radiance) + s.dI[None, :, None], 0.0, None) * (pal + offs),
        0.0, 1.0,
    )
    rgbs = (omega * basis_rgb).sum(-2)
    if view_dep is not None:
        rgbs = rgbs + jax.lax.stop_gradient(view_dep)
    return rgbs


# --------------------------------------------------------------------------- render

def _bg(params, spec: PaletteSpec, rays_o, rays_d, bg_color, settings: RenderSettings):
    if settings.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, settings.bg_radius)
        return palette_background(params, spec, sph, rays_d)
    if bg_color is None:
        return jnp.ones((3,), jnp.float32)
    return bg_color


def render_palette_train(
    params,
    spec: PaletteSpec,
    bitfield,
    rays_o,
    rays_d,
    key,
    settings: RenderSettings,
    bg_color=None,
    freeze_basis_color: bool = True,
    require_smooth_loss: bool = False,
    perturb: bool = True,
):
    """Differentiable palette train render (palette/renderer.py:321-429).

    Returns the reference's full result dict: image, depth, weights_sum, plus composited
    aux maps (omega_sparsity, view_dep_norm, offsets_norm, smooth_norm, view_dep_rgb,
    direct_rgb, diffuse_rgb, clip_feat, basis_acc).
    """
    n = rays_o.shape[0]
    P = spec.num_basis
    b = settings.bound
    aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    bg = _bg(params, spec, rays_o, rays_d, bg_color, settings)

    k_noise, k_smooth, k_enc = jax.random.split(key, 3)
    noise = jax.random.uniform(k_noise, (n,)) if perturb else None
    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield, b, settings.cascade,
        settings.grid_size, settings.dt_gamma, settings.max_steps,
        settings.num_samples, noise,
        sup_bitfield=_sup(bitfield, settings), max_groups=settings.march_groups,
        fine_grid_size=settings.fine_grid_size,
    )
    S = settings.num_samples
    xyzs = m.xyzs.reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape).reshape(-1, 3)
    M = xyzs.shape[0]

    compact = settings.compact_frac > 0
    n_eff = _cb(settings, M) if compact else M
    rand = encode_rand_for(k_enc, spec, n_eff)

    def sample_fields(x, d, jit_u):
        """All per-sample work (both forwards + blend + regularizers) for a
        [B, ...] batch — run in the compact domain when compact_frac > 0."""
        mb = x.shape[0]
        sigma, clip_feat, omega, offsets_radiance, view_dep, diffuse = palette_forward(
            params, spec, x, d, training=True, rand=rand
        )
        sigma = jax.lax.stop_gradient(sigma * settings.density_scale)  # renderer.py:334-335

        offsets = offsets_radiance[..., :-1].reshape(mb, P, 3)
        radiance = offsets_radiance[..., -1:].reshape(mb, 1, 1)
        omega_c = omega.reshape(mb, P, 1)

        basis_color = jnp.clip(params["basis_color"], 0.0, 1.0)[None]
        if freeze_basis_color:
            basis_color = jax.lax.stop_gradient(basis_color)

        final_color = jax.nn.softplus(radiance) * (basis_color + offsets)
        basis_rgb = omega_c * final_color
        rgbs = basis_rgb.sum(-2) + jax.lax.stop_gradient(view_dep)  # :349-351
        direct_rgb = diffuse + view_dep

        # per-sample regularizer channels (:357-359)
        omega_sparsity = omega.sum(-1, keepdims=True) / ((omega ** 2).sum(-1, keepdims=True) + 1e-6) - 1.0
        offsets_norm = (offsets ** 2).sum(-1).sum(-1, keepdims=True)
        view_dep_norm = (view_dep ** 2).sum(-1, keepdims=True)

        if require_smooth_loss:
            # jittered re-forward with bilateral weight (:360-378)
            xyzs_diff = jnp.clip(x + jit_u * b * 0.03, -b, b)
            _, clip_d, omega_d, _, _, diffuse_d = palette_forward(
                params, spec, xyzs_diff, d, training=True, rand=rand)
            xyz_w = ((x - xyzs_diff) ** 2).sum(-1, keepdims=True) / b ** 2 / spec.smooth_sigma_xyz
            rgb_w = ((diffuse - diffuse_d) ** 2).sum(-1, keepdims=True) / spec.smooth_sigma_color
            if spec.pred_clip and spec.smooth_sigma_clip > 0:
                clip_w = jnp.sqrt(((clip_feat - clip_d) ** 2).sum(-1, keepdims=True) + 1e-12) / spec.smooth_sigma_clip
            else:
                clip_w = 0.0
            smooth_w = jax.lax.stop_gradient(jnp.exp(-xyz_w - rgb_w - clip_w))
            smooth_norm = ((omega_d - omega) ** 2).sum(-1, keepdims=True) * smooth_w
            if spec.pred_clip:
                smooth_norm = smooth_norm + ((clip_d - clip_feat) ** 2).sum(-1, keepdims=True) * smooth_w
        else:
            smooth_norm = jnp.zeros_like(omega_sparsity)
        return (sigma, rgbs, omega_sparsity, offsets_norm, view_dep_norm,
                smooth_norm, view_dep, direct_rgb, diffuse, clip_feat, omega)

    jit_u = jax.random.uniform(k_smooth, (M, 3))
    overflow = None
    if compact:
        overflow = _co(m.mask.reshape(-1), n_eff)
        outs = _fc(sample_fields, m.mask.reshape(-1), n_eff, xyzs, dirs, jit_u)
    else:
        outs = sample_fields(xyzs, dirs, jit_u)
    (sigma, rgbs, omega_sparsity, offsets_norm, view_dep_norm, smooth_norm,
     view_dep, direct_rgb, diffuse, clip_feat, omega) = outs

    # composite everything with ONE weight pass
    sig = sigma.reshape(n, S)
    w, ws, _ = composite_weights(sig, m.dts, m.mask, settings.t_thresh)
    depth = (w * m.t_cum).sum(-1)
    image = composite_channels(w, rgbs.reshape(n, S, 3))

    aux = jnp.concatenate([
        omega_sparsity, view_dep_norm, offsets_norm, smooth_norm,
        view_dep, direct_rgb, diffuse, clip_feat, omega,
    ], -1).reshape(n, S, -1)
    aux_map = composite_channels(w, aux)

    c0 = 4
    image = image + (1.0 - ws)[:, None] * bg
    direct_rgb_map = aux_map[:, c0 + 3:c0 + 6] + (1.0 - ws)[:, None] * bg
    out = {
        "image": image,
        "depth": jnp.clip(depth - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6),
        "weights_sum": ws,
        "omega_sparsity": aux_map[:, 0],
        "view_dep_norm": aux_map[:, 1],
        "offsets_norm": aux_map[:, 2],
        "smooth_norm": aux_map[:, 3],
        "view_dep_rgb": aux_map[:, c0:c0 + 3],
        "direct_rgb": direct_rgb_map,
        "diffuse_rgb": aux_map[:, c0 + 6:c0 + 9],
        "clip_feat": aux_map[:, c0 + 9:c0 + 9 + spec.clip_dim],
        "basis_acc": aux_map[:, c0 + 9 + spec.clip_dim:c0 + 9 + spec.clip_dim + P],
    }
    if overflow is not None:
        out["compact_overflow"] = overflow
    return out


def render_palette_eval(
    params,
    spec: PaletteSpec,
    bitfield,
    rays_o,
    rays_d,
    settings: RenderSettings,
    bg_color=None,
    edit: Optional[RegionEdit] = None,
    stylizer: Optional[StylizerParams] = None,
    offsets_weight: float = 1.0,
    view_dep_weight: float = 1.0,
    gui_mode: bool = False,
):
    """Eval/editing render (palette/renderer.py:430-552). Single fixed-width pass —
    no alive-ray host loop. Returns the reference's eval dict incl. per-basis maps."""
    n = rays_o.shape[0]
    P = spec.num_basis
    b = settings.bound
    aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    bg = _bg(params, spec, rays_o, rays_d, bg_color, settings)

    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield, b, settings.cascade,
        settings.grid_size, settings.dt_gamma, settings.max_steps,
        settings.num_samples, None,
        sup_bitfield=_sup(bitfield, settings), max_groups=settings.march_groups,
        fine_grid_size=settings.fine_grid_size,
    )
    S = settings.num_samples
    xyzs = m.xyzs.reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape).reshape(-1, 3)
    M = xyzs.shape[0]

    def sample_fields(x, d):
        """Per-sample field eval + blend + edit hooks for a [B, ...] batch —
        runs in the compact valid-sample domain when compact_frac > 0."""
        mb = x.shape[0]
        sigma, clip_feat, omega, offsets_radiance, view_dep, diffuse = palette_forward(
            params, spec, x, d
        )
        sigma = sigma * settings.density_scale
        offsets = offsets_radiance[..., :-1].reshape(mb, P, 3)
        radiance = offsets_radiance[..., -1:].reshape(mb, 1, 1)
        omega_c = omega.reshape(mb, P, 1)
        basis_color = jnp.clip(params["basis_color"], 0.0, 1.0)[None]

        if stylizer is not None:
            rgbs = apply_stylizer(stylizer, radiance, omega_c, basis_color,
                                  offsets, view_dep)
            basis_rgb = omega_c * jnp.clip(
                jax.nn.softplus(radiance) * (basis_color + offsets), 0.0, 1.0)
            unscaled = basis_color + offsets
        else:
            final_color = jax.nn.softplus(radiance) * (basis_color + offsets_weight * offsets)
            unscaled = basis_color + offsets
            if edit is not None:
                final_color = apply_region_edit(edit, final_color, x, clip_feat)
            basis_rgb = omega_c * final_color
            rgbs = basis_rgb.sum(-2) + view_dep_weight * view_dep  # :494
        return (sigma, rgbs, clip_feat, view_dep, diffuse,
                omega, basis_rgb.reshape(mb, P * 3),
                jnp.broadcast_to(unscaled, (mb, P, 3)).reshape(mb, P * 3))

    overflow = None
    if settings.compact_frac > 0:
        budget = _cb(settings, M)
        overflow = _co(m.mask.reshape(-1), budget)
        outs = _fc(sample_fields, m.mask.reshape(-1), budget, xyzs, dirs)
    else:
        outs = sample_fields(xyzs, dirs)
    sigma, rgbs, clip_feat, view_dep, diffuse, omega, basis_rgb, unscaled = outs

    sig = sigma.reshape(n, S)
    w, ws, _ = composite_weights(sig, m.dts, m.mask, settings.t_thresh)
    depth = (w * m.t_cum).sum(-1)
    image = composite_channels(w, rgbs.reshape(n, S, 3)) + (1.0 - ws)[:, None] * bg

    depth_abs = depth + ws * nears  # absolute, matching raymarching.cu:1078-1079
    out = {
        "image": image,
        "depth": jnp.clip(depth_abs - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6),
        "depth_origin": depth_abs,
        "weights_sum": ws,
        "clip_feat": composite_channels(w, clip_feat.reshape(n, S, -1)),
    }
    if not gui_mode:
        direct_rgb = diffuse + view_dep
        aux = jnp.concatenate([
            direct_rgb, view_dep, omega, basis_rgb, unscaled,
        ], -1).reshape(n, S, -1)
        aux_map = composite_channels(w, aux)
        out["direct_rgb"] = aux_map[:, 0:3] + (1.0 - ws)[:, None] * bg
        out["view_dep_rgb"] = aux_map[:, 3:6]
        out["basis_acc"] = aux_map[:, 6:6 + P]
        out["basis_rgb"] = aux_map[:, 6 + P:6 + P + 3 * P]
        out["unscaled_basis_rgb"] = aux_map[:, 6 + 4 * P:6 + 7 * P]
    if overflow is not None:
        out["compact_overflow"] = overflow
    return out
