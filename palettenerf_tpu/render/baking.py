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
    # view-dependent color as per-voxel SH coefficients (SNeRG-style; matches the
    # reference's view_dep compositing, palette/renderer.py:484,494). Channel-major
    # layout [.., 3*B]: [r coeffs | g coeffs | b coeffs], B = vd_bands^2.
    view_sh: Optional[jnp.ndarray] = None   # [R, R, R, 3*B]
    vd_bands: int = 0
    clip_feat: Optional[jnp.ndarray] = None  # [R, R, R, clip_dim] (palette+clip only)


def _fibonacci_dirs(n: int) -> np.ndarray:
    """n roughly-uniform unit directions (spherical Fibonacci lattice)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], -1).astype(np.float32)


def _sh_fit(dirs: np.ndarray, bands: int) -> np.ndarray:
    """Least-squares SH projection weights W [B, Nd]: coeffs = W @ samples."""
    from ..ops.sh import sh_encode
    Y = np.asarray(sh_encode(jnp.asarray(dirs), bands))    # [Nd, B]
    return np.linalg.pinv(Y).astype(np.float32)


def _bake_grid(params, bound: float, resolution: int, chunk: int, eval_chunk):
    """Evaluate ``eval_chunk(params, x[chunk, 3])`` over the dense R^3 voxel grid
    entirely ON DEVICE: one jit dispatch, grid coordinates generated from iota,
    ``lax.map`` over chunks, results never leave HBM.

    The previous host loop dispatched each chunk separately and read every
    result back with ``np.asarray`` — through the tunneled TPU that cost
    ~1 s/chunk of pure RTT (an R=384 stage-1 bake measured 510 s; the actual
    field compute is ~15 s). Returns a pytree of [R^3, ...] device arrays."""
    R = resolution
    n = R ** 3
    n_chunks = -(-n // chunk)

    @jax.jit
    def run(p):
        lin = jnp.linspace(-bound, bound, R, dtype=jnp.float32)

        def do(start):
            idx = jnp.minimum(start + jnp.arange(chunk), n - 1)
            i, j, k = idx // (R * R), (idx // R) % R, idx % R
            x = jnp.stack([lin[i], lin[j], lin[k]], -1)
            return eval_chunk(p, x)

        outs = jax.lax.map(do, jnp.arange(n_chunks) * chunk)
        return jax.tree_util.tree_map(
            lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[:n], outs)

    return run(params)


def bake_nerf(params, spec, resolution: int = 256, chunk: int = 131072,
              vd_bands: int = 0, vd_dirs: int = 32) -> BakedVolume:
    """Bake a stage-1 NeRF: density + diffuse color (queried at a fixed canonical
    direction) and, when ``vd_bands > 0``, per-voxel SH coefficients of the FULL
    view-dependent color minus the canonical diffuse (the sweep/baked renderers
    reconstruct color as diffuse + Y(d) . coeffs)."""
    from ..models.nerf import nerf_color, nerf_density

    b = spec.bound
    d_canon = np.array([0.0, 0.0, 1.0], np.float32)
    B = vd_bands * vd_bands
    if vd_bands:
        dirs = _fibonacci_dirs(vd_dirs)
        W = jnp.asarray(_sh_fit(dirs, vd_bands))           # [B, Nd]
        dirs_j = jnp.asarray(dirs)

    def eval_chunk(p, x):
        dens = nerf_density(p, spec, x)
        geo = dens["geo_feat"]
        dc = jnp.broadcast_to(d_canon, x.shape)
        diffuse = nerf_color(p, spec, dc, geo)
        out = (dens["sigma"], diffuse)
        if vd_bands:
            vd = jax.lax.map(
                lambda d: nerf_color(p, spec, jnp.broadcast_to(d, x.shape), geo)
                - diffuse,
                dirs_j)                                     # [Nd, M, 3]
            coef = jnp.einsum("bn,nmc->mcb", W, vd).reshape(x.shape[0], 3 * B)
            out = out + (coef,)
        return out

    outs = _bake_grid(params, b, resolution, chunk, eval_chunk)
    R = resolution
    return BakedVolume(R, b, outs[0].reshape(R, R, R),
                       outs[1].reshape(R, R, R, 3), None, None, None,
                       view_sh=(outs[2].reshape(R, R, R, 3 * B)
                                if vd_bands else None),
                       vd_bands=vd_bands)


def bake_palette(params, spec, resolution: int = 256, chunk: int = 131072,
                 vd_bands: int = 3, vd_dirs: int = 32,
                 bake_clip: bool = True) -> BakedVolume:
    """Bake a PaletteNeRF: density + palette quantities (keeps recoloring editable),
    per-voxel SH coefficients of ``view_dep`` (``vd_bands`` > 0; the additive
    view-dependent channel of palette/renderer.py:349-351,484,494), and — when the
    model predicts clip features — the clip volume for baked semantic edit masks."""
    from ..models.palette import palette_forward, palette_view_dep

    b = spec.bound
    P = spec.num_basis
    d_canon = np.array([0.0, 0.0, 1.0], np.float32)
    B = vd_bands * vd_bands
    if vd_bands:
        dirs = _fibonacci_dirs(vd_dirs)
        W = jnp.asarray(_sh_fit(dirs, vd_bands))            # [B, Nd]
        dirs_j = jnp.asarray(dirs)
    want_clip = bool(bake_clip and spec.pred_clip)

    def eval_chunk(p, x):
        from ..models.palette import palette_density
        dc = jnp.broadcast_to(d_canon, x.shape)
        sg, clip_feat, omega, off_rad, _vd, diffuse = palette_forward(p, spec, x, dc)
        out = [sg, diffuse, omega, off_rad]
        if vd_bands:
            geo = palette_density(p, spec, x)["geo_feat"]
            vd = jax.lax.map(
                lambda d: palette_view_dep(p, spec, jnp.broadcast_to(d, x.shape), geo),
                dirs_j)                                      # [Nd, M, 3]
            out.append(jnp.einsum("bn,nmc->mcb", W, vd).reshape(x.shape[0], 3 * B))
        if want_clip:
            out.append(clip_feat)
        return tuple(out)

    outs = _bake_grid(params, b, resolution, chunk, eval_chunk)
    R = resolution
    off_rad = outs[3]
    k = 4
    vsh = None
    if vd_bands:
        vsh = outs[k].reshape(R, R, R, 3 * B)
        k += 1
    clp = outs[k].reshape(R, R, R, spec.clip_dim) if want_clip else None
    return BakedVolume(R, b, outs[0].reshape(R, R, R),
                       outs[1].reshape(R, R, R, 3),
                       outs[2].reshape(R, R, R, P),
                       off_rad[:, :-1].reshape(R, R, R, 3 * P),
                       off_rad[:, -1].reshape(R, R, R),
                       view_sh=vsh, vd_bands=vd_bands, clip_feat=clp)


def mask_with_bitfield(baked: BakedVolume, grid_state: Dict) -> BakedVolume:
    """Zero baked density in occupancy cells the trained marcher never sampled.

    The field is unconstrained fog in never-sampled cells; unmasked fog both
    speckles the background and defeats the sweep renderer's slice skipping.
    Baked voxel centers lie ON ``linspace(-b, b, R)`` (normalized i/(R-1), not
    (i+0.5)/R cell centers), so the cell map uses i/(R-1); the occupancy is
    dilated one cell so a boundary voxel whose center lands exactly on a cell
    edge never loses real surface density. ``grid_state`` is the checkpoint's
    grid-state dict (bitfield + density_grid); cascade 0 covers |x| < bound.
    """
    bf = np.asarray(grid_state["bitfield"])
    G = round(np.asarray(grid_state["density_grid"]).shape[-1] ** (1 / 3) + 1e-6)
    R = baked.resolution

    @jax.jit
    def apply(density, bf_u8):
        # device-side unpackbits(bitorder="little"): bit k of byte i -> 8*i+k,
        # then 3x3x3 binary dilation as a max reduce_window (zero padding and
        # the -inf reduce identity agree on {0,1} values).
        bits = (bf_u8[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        occ = bits.reshape(-1)[: G ** 3].reshape(G, G, G).astype(jnp.float32)
        dil = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max,
                                    (3, 3, 3), (1, 1, 1), "SAME")
        cell = jnp.minimum(jnp.arange(R) * G // max(R - 1, 1), G - 1)
        occ_up = dil[cell][:, cell][:, :, cell]
        return density * occ_up

    # only the G^3/8-byte bitfield crosses the host->device link (the old host
    # path shipped an R^3 f32 mask — 226 MB at R=384 — through the tunnel)
    return baked._replace(
        density=apply(baked.density, jnp.asarray(bf[: G ** 3 // 8])))


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
    row gather per trilinear corner (gather cost on TPU is row-count-bound).
    Layout: [density, diffuse(3), (omega P, offsets 3P, radiance), (view_sh 3B)]."""
    R = baked.resolution
    parts = [baked.density.reshape(R ** 3, 1), baked.diffuse.reshape(R ** 3, 3)]
    if baked.omega is not None:
        P = baked.omega.shape[-1]
        parts += [baked.omega.reshape(R ** 3, P), baked.offsets.reshape(R ** 3, 3 * P),
                  baked.radiance.reshape(R ** 3, 1)]
    if baked.view_sh is not None:
        parts.append(baked.view_sh.reshape(R ** 3, -1))
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
                 basis_color=None, density_scale: float = 1.0, fused=None,
                 view_dep_weight: float = 1.0):
    """XLA reference renderer over a baked volume (golden check for the tiled kernel).

    For palette bakes, pass ``basis_color`` [P,3] (possibly edited!) — the blend
    ``sum_p omega_p * softplus(radiance) * (basis_color_p + offsets_p)`` happens at
    render time, so palette edits stay live without re-baking. Pass a precomputed
    ``fused = fuse_volume(baked)`` to avoid re-fusing per call. When the bake
    carries view-SH coefficients, the per-sample color adds
    ``view_dep_weight * Y(d) . coeffs`` (palette/renderer.py:484,494 semantics).
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
        vd_at = 5 + 4 * P
    else:
        rgb = feats[:, 1:4]
        vd_at = 4
    if baked.view_sh is not None and baked.vd_bands:
        from ..ops.sh import sh_encode
        B = baked.vd_bands * baked.vd_bands
        Y = sh_encode(rays_d, baked.vd_bands)                    # [n, B]
        coef = feats[:, vd_at:vd_at + 3 * B].reshape(-1, num_samples, 3, B)
        vd = jnp.einsum("nb,nscb->nsc", Y, coef).reshape(-1, 3)
        rgb = rgb + view_dep_weight * vd
    rgb = rgb.reshape(n, num_samples, 3)

    mask = ts < fars[:, None]
    t_cum = jnp.where(mask, ts - nears[:, None] + dts, 0.0)
    ws, depth, image = composite_rays(sig, rgb, dts, t_cum, mask, t_thresh)
    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, jnp.float32)
    return {"image": image, "depth": depth, "weights_sum": ws}
