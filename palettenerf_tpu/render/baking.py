"""Baking: sample a trained field into dense feature volumes for fast serving.

This is the foundation of the TPU-native real-time path (README roadmap #1; the
SNeRG/MERF idea): after training, the hash-grid MLP field is evaluated once on a dense
voxel grid, producing

- ``density``  [R^3]             (sigma, for alpha compositing)
- ``diffuse``  [R^3, 3]          (view-independent color)
- palette extras when baking a PaletteNeRF: ``omega`` [R^3, P], ``offsets`` [R^3, 3P],
  ``radiance`` [R^3], so the palette blend (renderer.py:349-351) stays editable at
  render time — recoloring is linear in these baked quantities.

Rendering from the baked volume replaces 128 hash gathers/sample with ONE trilinear
fetch from a dense, spatially-local volume (the prerequisite for the frustum-tiled
plane-sweep Pallas renderer). ``render_baked`` below is the XLA reference renderer over
the baked grid; the tiled Pallas kernel lands next round with this as its golden check.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BakedVolume(NamedTuple):
    resolution: int
    bound: float
    density: jnp.ndarray            # [R, R, R]
    diffuse: jnp.ndarray            # [R, R, R, 3]
    omega: Optional[jnp.ndarray]    # [R, R, R, P] or None (plain NeRF bake)
    offsets: Optional[jnp.ndarray]  # [R, R, R, 3P]
    radiance: Optional[jnp.ndarray]  # [R, R, R]


def bake_nerf(params, spec, resolution: int = 256, chunk: int = 131072) -> BakedVolume:
    """Bake a stage-1 NeRF: density + diffuse color (direction-averaged: queried at a
    fixed canonical direction; view-dependence is dropped, as in SNeRG's diffuse term)."""
    from ..models.nerf import nerf_forward

    b = spec.bound
    lin = np.linspace(-b, b, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    d_canon = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (chunk, 1))

    f = jax.jit(lambda p, x, d: nerf_forward(p, spec, x, d))
    sig = np.zeros(len(grid), np.float32)
    diff = np.zeros((len(grid), 3), np.float32)
    for s in range(0, len(grid), chunk):
        pts = grid[s:s + chunk]
        pad = chunk - len(pts)
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        sg, rgb = f(params, jnp.asarray(pts), jnp.asarray(d_canon))
        end = s + chunk - pad
        sig[s:end] = np.asarray(sg)[: chunk - pad]
        diff[s:end] = np.asarray(rgb)[: chunk - pad]
    R = resolution
    return BakedVolume(R, b, jnp.asarray(sig.reshape(R, R, R)),
                       jnp.asarray(diff.reshape(R, R, R, 3)), None, None, None)


def bake_palette(params, spec, resolution: int = 256, chunk: int = 131072) -> BakedVolume:
    """Bake a PaletteNeRF: density + palette quantities (keeps recoloring editable)."""
    from ..models.palette import palette_forward

    b = spec.bound
    P = spec.num_basis
    lin = np.linspace(-b, b, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    d_canon = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (chunk, 1))

    f = jax.jit(lambda p, x, d: palette_forward(p, spec, x, d))
    sig = np.zeros(len(grid), np.float32)
    diff = np.zeros((len(grid), 3), np.float32)
    om = np.zeros((len(grid), P), np.float32)
    off = np.zeros((len(grid), 3 * P), np.float32)
    rad = np.zeros(len(grid), np.float32)
    for s in range(0, len(grid), chunk):
        pts = grid[s:s + chunk]
        pad = chunk - len(pts)
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        sg, _clip, omega, off_rad, _vd, diffuse = f(params, jnp.asarray(pts), jnp.asarray(d_canon))
        n = chunk - pad
        end = s + n
        sig[s:end] = np.asarray(sg)[:n]
        diff[s:end] = np.asarray(diffuse)[:n]
        om[s:end] = np.asarray(omega)[:n]
        off[s:end] = np.asarray(off_rad)[:n, :-1]
        rad[s:end] = np.asarray(off_rad)[:n, -1]
    R = resolution
    return BakedVolume(R, b, jnp.asarray(sig.reshape(R, R, R)),
                       jnp.asarray(diff.reshape(R, R, R, 3)),
                       jnp.asarray(om.reshape(R, R, R, P)),
                       jnp.asarray(off.reshape(R, R, R, 3 * P)),
                       jnp.asarray(rad.reshape(R, R, R)))


def _trilinear(vol, x01):
    """vol [R, R, R, C?]; x01 [N, 3] in [0,1] -> [N, C?] trilinear samples."""
    R = vol.shape[0]
    g = jnp.clip(x01, 0.0, 1.0) * (R - 1)
    i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, R - 2)
    f = g - i0
    out = 0.0
    for c in range(8):
        b = [(c >> k) & 1 for k in range(3)]
        w = 1.0
        for k in range(3):
            w = w * (f[:, k] if b[k] else 1.0 - f[:, k])
        v = vol[i0[:, 0] + b[0], i0[:, 1] + b[1], i0[:, 2] + b[2]]
        out = out + v * (w[:, None] if v.ndim == 2 else w)
    return out


def fuse_volume(baked: BakedVolume) -> jnp.ndarray:
    """Concatenate all channels into one [R^3, C_total] array so rendering needs ONE
    row gather per trilinear corner (gather cost on TPU is row-count-bound)."""
    R = baked.resolution
    parts = [baked.density.reshape(R ** 3, 1), baked.diffuse.reshape(R ** 3, 3)]
    if baked.omega is not None:
        P = baked.omega.shape[-1]
        parts += [baked.omega.reshape(R ** 3, P), baked.offsets.reshape(R ** 3, 3 * P),
                  baked.radiance.reshape(R ** 3, 1)]
    return jnp.concatenate(parts, -1)


def _trilinear_flat(flat, R, x01):
    """flat [R^3, C]; x01 [N, 3] in [0,1] -> [N, C] trilinear (row-major z-minor)."""
    g = jnp.clip(x01, 0.0, 1.0) * (R - 1)
    i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, R - 2)
    f = g - i0
    out = 0.0
    for c in range(8):
        b = [(c >> k) & 1 for k in range(3)]
        w = 1.0
        for k in range(3):
            w = w * (f[:, k] if b[k] else 1.0 - f[:, k])
        idx = ((i0[:, 0] + b[0]) * R + (i0[:, 1] + b[1])) * R + (i0[:, 2] + b[2])
        out = out + flat[idx] * w[:, None]
    return out


def render_baked(baked: BakedVolume, rays_o, rays_d, num_samples: int = 192,
                 t_thresh: float = 1e-2, bg_color=1.0, min_near: float = 0.05,
                 basis_color=None, density_scale: float = 1.0, fused=None):
    """XLA reference renderer over a baked volume (golden check for the tiled kernel).

    For palette bakes, pass ``basis_color`` [P,3] (possibly edited!) — the blend
    ``sum_p omega_p * softplus(radiance) * (basis_color_p + offsets_p)`` happens at
    render time, so palette edits stay live without re-baking. Pass a precomputed
    ``fused = fuse_volume(baked)`` to avoid re-fusing per call.
    """
    from ..ops.composite import composite_rays
    from ..ops.rays import near_far_from_aabb

    b = baked.bound
    R = baked.resolution
    n = rays_o.shape[0]
    aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    t = jnp.linspace(0.0, 1.0, num_samples)[None]
    ts = nears[:, None] + (fars - nears)[:, None] * t
    dts = jnp.diff(ts, axis=1)
    dts = jnp.concatenate([dts, dts[:, -1:]], 1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    x01 = (xyz.reshape(-1, 3) + b) / (2 * b)

    if fused is None:
        fused = fuse_volume(baked)
    feats = _trilinear_flat(fused, R, x01)  # [n*S, C_total]

    sig = feats[:, 0].reshape(n, num_samples) * density_scale
    if baked.omega is not None and basis_color is not None:
        P = baked.omega.shape[-1]
        om = feats[:, 4:4 + P, None]
        off = feats[:, 4 + P:4 + 4 * P].reshape(-1, P, 3)
        rad = feats[:, 4 + 4 * P:4 + 4 * P + 1, None]
        bc = jnp.clip(jnp.asarray(basis_color), 0, 1)[None]
        rgb = (om * (jax.nn.softplus(rad) * (bc + off))).sum(-2)
    else:
        rgb = feats[:, 1:4]
    rgb = rgb.reshape(n, num_samples, 3)

    mask = ts < fars[:, None]
    t_cum = jnp.where(mask, ts - nears[:, None] + dts, 0.0)
    ws, depth, image = composite_rays(sig, rgb, dts, t_cum, mask, t_thresh)
    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, jnp.float32)
    return {"image": image, "depth": depth, "weights_sum": ws}
