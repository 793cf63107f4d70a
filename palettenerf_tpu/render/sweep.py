"""Shear-warp plane-sweep renderer: the TPU-native real-time serving path.

This replaces the CUDA reference's gather-heavy inference pipeline (adaptive ray
marching + alive-ray compaction, ``raymarching/src/raymarching.cu:907-1021`` +
``nerf/renderer.py:336-386``) with a formulation built around what the TPU is
actually fast at — dense matmuls on the MXU — instead of what it is slow at
(HBM gathers, measured ~1.3-3 GB/s effective on v5e; see docs/tiled_renderer_design.md).

The factorization (shear-warp, Lacroute & Levoy '94, re-derived for pinhole cameras):

1. Pick the volume axis most aligned with the view direction ("sweep axis").
2. Central projection between PARALLEL planes is a homothety: for camera center
   ``o`` and slice plane ``z = z_k``, the map from a fixed reference plane
   ``z = z_ref`` to the slice is ``p_xy = o_xy + (q_xy - o_xy) * lam_k`` with
   ``lam_k = (z_k - o_z) / (z_ref - o_z)`` — a per-slice *uniform scale + shift*.
3. Therefore a fixed "intermediate image" grid on the reference plane (one pixel ==
   one camera ray) samples every slice through a SEPARABLE affine resample:
   two banded interpolation matrices ``A_k [U,X]``, ``B_k [V,Y]`` applied as dense
   matmuls. Zero gathers; the MXU does the interpolation. (Bilinear at the exact
   slice plane == trilinear sampling of the baked field at the ray/plane crossing.)
4. Front-to-back alpha compositing runs as a ``lax.scan`` over slices with the
   transmittance carried; the palette blend + RegionEdit run per-sample inside the
   sweep as dense VPU math (sample positions are analytic — no lookups needed).
5. One final 2D homography warp (output pixel -> intersection of its camera ray with
   the reference plane) resamples the composited intermediate maps to the screen —
   the only gather in the whole frame, H*W*4 rows.

Empty slices (precomputed occupancy) and fully-terminated frames (max transmittance
below ``t_thresh``) skip their matmuls via ``lax.cond``.

Parity targets: the palette blend & edit semantics match
``render/palette_renderer.py`` (reference ``palette/renderer.py:321-429, 430-552``);
the per-pixel early-termination mask matches ``ops/composite.py`` /
``raymarching.cu:1100-1104``. Supported cameras: FOV < 90 deg across the sweep axis
(always true for the reference's Blender/LLFF/Mip-360 cameras and the GUI orbiter).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .baking import BakedVolume
from .palette_renderer import RegionEdit, make_region_edit


class SweepVolume(NamedTuple):
    """Baked volume re-packed for sweeping: one axis-major copy per world axis
    (HBM is cheap; a per-frame transpose is not), plus per-slice occupancy."""

    resolution: int
    bound: float
    num_basis: int                       # 0 for a plain NeRF bake
    vols: Tuple[jnp.ndarray, ...]        # 3 x [Z, X, C, Y] bf16, axis-major
    occ: Tuple[jnp.ndarray, ...]         # 3 x [Z] bool — slice has any density
    vd_bands: int = 0                    # SH bands of the baked view-dep channels


# channel layout inside vols (CHANNEL-MIDDLE [Z, X, C, Y]):
#   nerf:    [sigma, r, g, b]                                   C = 4
#   palette: [sigma, omega(P), off_r(P), off_g(P), off_b(P), rad] C = 2 + 4P
# When the bake carries view-dependent SH (vd_bands > 0), 3*B coefficient
# channels append to either layout ([r coeffs | g | b], B = vd_bands^2); the
# sweep composites them into rgb as Y(d_pixel) . coeffs — compositing is LINEAR
# in the coefficients, so the per-pixel SH basis applies per SLICE at ~B madds
# per pixel, reproducing the exact path's additive view_dep channel
# (palette/renderer.py:484,494).
# Channel-middle makes the second interpolation matmul emit [Ucol, C, Urow]
# directly, so every per-channel plane is a contiguous [Ucol, Urow] slice with
# the 512-wide image axis in the lane dimension — no moveaxis transposes, and
# elementwise palette math on [Ucol, P, Urow] pads sublanes 6->8 (1.33x) instead
# of padding a P-minor layout's lanes 6->128 (21x). Offsets are regrouped from
# the bake's per-basis interleave [p0r p0g p0b p1r ...] into color planes.
# (palette drops diffuse — the sweep's blend never reads it, and matmul cost is
#  linear in C; render_baked/fuse_volume keep their own layout for the aux paths)


def build_sweep_volume(baked: BakedVolume, sigma_thresh: float = 1e-3) -> SweepVolume:
    R = baked.resolution
    P = 0
    if baked.omega is not None:
        P = baked.omega.shape[-1]
        parts = [baked.density[..., None], baked.omega,
                 baked.offsets[..., 0::3], baked.offsets[..., 1::3],
                 baked.offsets[..., 2::3], baked.radiance[..., None]]
    else:
        parts = [baked.density[..., None], baked.diffuse]
    if baked.view_sh is not None and baked.vd_bands:
        parts.append(baked.view_sh)
    vol4 = jnp.concatenate(parts, -1)  # [R, R, R, C] world-axis order

    vols, occs = [], []
    occ_any = np.asarray(baked.density) > sigma_thresh  # [R,R,R]
    for a in range(3):
        perm = (a, (a + 1) % 3, 3, (a + 2) % 3)          # -> [Z, X, C, Y]
        vols.append(jnp.transpose(vol4, perm).astype(jnp.bfloat16))
        occs.append(jnp.asarray(occ_any.any(axis=tuple(i for i in range(3) if i != a))))
    return SweepVolume(R, float(baked.bound), P, tuple(vols), tuple(occs),
                       vd_bands=(baked.vd_bands if baked.view_sh is not None else 0))


def build_clip_masks(clip_feat, mean_clip, std_clip,
                     sigma_thresh_mask: float = 0.0) -> Tuple[jnp.ndarray, ...]:
    """Semantic edit-mask volumes for the sweep: exp(-||clip - mean||^2 / std)
    evaluated ONCE over the baked clip volume (the exact path computes the same
    weight per sample from the live network, palette/renderer.py:127-136). Returns
    one axis-major [Z, X, Y] bf16 copy per sweep axis; rebuild on mean/std change
    (~R^3 * clip_dim flops, milliseconds)."""
    m = jnp.exp(-((clip_feat - jnp.asarray(mean_clip)) ** 2).sum(-1)
                / jnp.asarray(std_clip))
    return tuple(
        jnp.transpose(m, (a, (a + 1) % 3, (a + 2) % 3)).astype(jnp.bfloat16)
        for a in range(3))


class SweepPlan(NamedTuple):
    """Host-side per-frame camera factorization (cheap NumPy, ~50 flops)."""

    axis: int                    # sweep axis (world index) — selects vols[axis]
    perm: Tuple[int, int, int]   # world -> permuted (sweep-axis-first) order
    o_p: np.ndarray              # [3] camera center, permuted frame
    rot_p: np.ndarray            # [3,3] permuted rows of c2w rotation
    dsign: float                 # sign of ray z-components in permuted frame
    z_ref: float                 # reference plane (near volume face)
    gx0: float
    gdx: float
    gy0: float
    gdy: float                   # intermediate grid on the z_ref plane
    flip: bool                   # sweep slices high-to-low instead of low-to-high


def plan_sweep(pose: np.ndarray, intrinsics, H: int, W: int, bound: float,
               U: int) -> SweepPlan:
    """Factorize one camera into sweep parameters."""
    pose = np.asarray(pose, np.float64)
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    o = pose[:3, 3]
    Rw = pose[:3, :3]

    fwd = Rw @ np.array([0.0, 0.0, 1.0])
    axis = int(np.argmax(np.abs(fwd)))
    perm = (axis, (axis + 1) % 3, (axis + 2) % 3)
    o_p = o[list(perm)]
    rot_p = Rw[list(perm), :]

    # corner + center rays in the permuted frame
    px = np.array([0.5, W - 0.5, 0.5, W - 0.5, W / 2.0])
    py = np.array([0.5, 0.5, H - 0.5, H - 0.5, H / 2.0])
    d = np.stack([(px - cx) / fx, (py - cy) / fy, np.ones(5)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_p = d @ rot_p.T
    dz = d_p[:, 0]
    dsign = float(np.sign(dz[-1]))
    assert np.all(np.sign(dz) == dsign), (
        "sweep renderer: FOV spans 90 deg across the sweep axis — unsupported camera"
    )

    # reference plane: the volume face nearest the camera along the sweep axis
    z_ref = -dsign * bound

    # intermediate grid extent on z_ref: bbox of output corner-ray intersections
    # (the image rect maps projectively to a convex quad — corners suffice),
    # intersected with the volume's shadow (projection of its 8 corners from o)
    t_ref = (z_ref - o_p[0]) / dz
    q = o_p[None, 1:] + t_ref[:, None] * d_p[:, 1:]
    lo, hi = q.min(0), q.max(0)
    if abs(o_p[0]) > bound:  # camera outside the slab: shadow projection is valid
        c = np.array([[sx, sy, sz] for sx in (-bound, bound)
                      for sy in (-bound, bound) for sz in (-bound, bound)])
        c_p = c[:, list(perm)]
        lam = (z_ref - o_p[0]) / (c_p[:, 0] - o_p[0])
        s = o_p[None, 1:] + lam[:, None] * (c_p[:, 1:] - o_p[None, 1:])
        lo = np.maximum(lo, s.min(0))
        hi = np.minimum(hi, s.max(0))
    span = np.maximum(hi - lo, 1e-6)
    pad = 0.5 * span / max(U - 1, 1)
    lo, hi = lo - pad, hi + pad
    gdx = float((hi[0] - lo[0]) / (U - 1))
    gdy = float((hi[1] - lo[1]) / (U - 1))

    return SweepPlan(axis, perm, o_p.astype(np.float32), rot_p.astype(np.float32),
                     dsign, float(z_ref), float(lo[0]), gdx, float(lo[1]), gdy,
                     bool(dsign < 0))


# --------------------------------------------------------------------------- kernel

def _interp_matrix(src: jnp.ndarray, n_src: int) -> jnp.ndarray:
    """src [U] fractional voxel coords -> banded bilinear weights [U, n_src].
    Out-of-range coordinates get all-zero rows (the volume is vacuum-padded)."""
    i = jax.lax.broadcasted_iota(jnp.float32, (src.shape[0], n_src), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i))
    return w.astype(jnp.bfloat16)


def _hsv_edit_planar(r, g, b, dh, ds, dv, wgt):
    """Fused per-sample RegionEdit recolor on planar [P, U, U] channel arrays.

    Single-pass rgb->hsv->(H+dh, S*ds, V*dv)->rgb with the weight lerp, matching
    apply_region_edit / reference palette/renderer.py:121-147 — but ~2x fewer ops
    than the stacked round trip and shaped for clean (8,128) VPU tiling (the
    [..., 3]-stacked form measured ~51 ms/frame of the sweep; this form ~20 ms).
    dh/ds/dv are per-basis [P, 1, 1]; wgt is the spatial mask [1, U, U].
    """
    cmax = jnp.maximum(jnp.maximum(r, g), b)
    cmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = cmax - cmin
    safe = jnp.where(diff == 0, 1.0, diff)
    # range-limited mods as single selects (a jnp.mod is div+floor+mul+sub on
    # the VPU; these run on [U, P, U] planes in the frame's hot loop):
    # 60*(g-b)/safe is in [-60, 60], so mod 360 == +360 when negative
    t_r = 60.0 * (g - b) / safe
    h = jnp.where(
        diff == 0, 0.0,
        jnp.where(cmax == r, jnp.where(t_r < 0, t_r + 360.0, t_r),
                  jnp.where(cmax == g, 60.0 * (b - r) / safe + 120.0,
                            60.0 * (r - g) / safe + 240.0)))
    s = jnp.clip(jnp.where(cmax == 0, 0.0, diff / jnp.where(cmax == 0, 1.0, cmax)) * ds,
                 0.0, None)
    v = jnp.clip(cmax * dv, 0.0, None)

    # hsv->rgb via the K-function form (fewer VPU slots than the 6-way select):
    # chan(n) = v - v*s*clamp(min(k, 4-k), 0, 1), k = (n + h/60) mod 6.
    # dh is a tiny [1, P, 1] constant — mod it once there so h + dh_n lands in
    # [0, 720) and the big-plane mod reduces to one select.
    dh_n = jnp.mod(dh, 360.0)
    h2 = h + dh_n
    h2 = jnp.where(h2 >= 360.0, h2 - 360.0, h2) * (1.0 / 60.0)
    vs = v * s

    def chan(n):
        k = n + h2                       # [n, n+6) for n in {1, 3, 5}
        k = jnp.where(k >= 6.0, k - 6.0, k)
        return v - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    r2, g2, b2 = chan(5.0), chan(3.0), chan(1.0)
    return r + wgt * (r2 - r), g + wgt * (g2 - g), b + wgt * (b2 - b)


# layout of the per-frame "uniform" vector (ONE host->device transfer per frame;
# separate scalar args measured ~0.8 ms EACH through the remote-TPU tunnel):
#   0:3  o_p (camera center, permuted frame)
#   3:7  gx0 gdx gy0 gdy (intermediate grid)
#   7    z_ref            8  dsign (<0 -> flip)
#   9    offsets_weight  10  density_scale   11  min_near   12  bound
#  13:16 edit mean_xyz (permuted frame)     16  use_xyz     17  std_xyz
#  18    view_dep_weight
#  19:28 world-from-permuted rotation rows (for SH directions in world frame)
_UNI_LEN = 28


@partial(jax.jit, static_argnames=(
    "num_basis", "u_res", "t_thresh", "weight_mode", "has_edit", "edit_cull",
    "skip", "unroll", "vd_bands", "has_style", "has_mask", "edit_bases",
    "shade_bf16"))
def _sweep_composite(
    vol,            # [Z, X, C, Y] bf16
    occ,            # [Z] bool
    basis_color,    # [P, 3] (or [1, 3] dummy for nerf mode)
    delta_hsv,      # [P, 3] RegionEdit per-basis dH/dS/dV
    uni,            # [_UNI_LEN] f32 packed per-frame uniforms (see above)
    mask_vol,       # [Z, X, Y] bf16 semantic edit mask (dummy [1,1,1] when off)
    sty_dI,         # [P] stylizer intensity offsets (dummy when has_style=False)
    sty_dP,         # [P, 3] stylizer palette offsets
    sty_dd,         # [P, 3, 3] stylizer offset transforms
    *,
    num_basis: int,
    u_res: int,
    t_thresh: float,
    weight_mode: bool,
    has_edit: bool = True,
    edit_cull: bool = False,  # per-slice HSV skip for tight spatial edits
    skip: str = "slice",   # none | slice | block — lax.cond granularity
    unroll: int = 1,
    vd_bands: int = 0,     # baked view-dep SH bands carried in the channel tail
    has_style: bool = False,
    has_mask: bool = False,
    edit_bases: Optional[tuple] = None,  # static basis subset to recolor (None=all):
    # unedited bases' HSV round-trip is the identity, so restricting the ~35-op
    # chain to the touched bases is exact and cuts the worst-case (global
    # recolor) edit cost by P/|edited|
    shade_bf16: bool = False,  # run the per-sample shade (palette blend + HSV
    # recolor + SH view-dep) in bf16: the palette sweep is VPU-bound in the
    # shade chain (~110 us/slice over the C=4 sweep, round-5 probe), and bf16
    # doubles VPU throughput + halves the matmul-output writes. Compositing
    # (alpha/transmittance/accumulators) stays f32. Colors live in [0,1] so the
    # 8-bit mantissa costs ~0.4% rel — measured >=45 dB vs the f32 sweep.
):
    """Front-to-back sweep over slices; returns intermediate maps
    [U, U, 5] = (rgb, depth_abs, weights_sum), rows = grid-y, cols = grid-x.

    Internally everything runs in [Ucol, Urow] orientation (and [Ucol, P, Urow]
    for per-basis math) because the channel-middle volume layout makes the second
    matmul emit [Ucol, C, Urow]; one fused transpose at the end restores
    [row, col] for the warp."""
    Z, X, C, Y = vol.shape
    U = u_res
    P = num_basis
    fdt = jnp.bfloat16 if shade_bf16 else jnp.float32
    o_p = uni[0:3]
    gx0, gdx, gy0, gdy, z_ref = (uni[3 + i] for i in range(5))
    offsets_weight, density_scale = uni[9], uni[10]
    min_near, bound = uni[11], uni[12]

    gx = gx0 + gdx * jnp.arange(U, dtype=jnp.float32)             # [U] cols
    gy = gy0 + gdy * jnp.arange(U, dtype=jnp.float32)             # [U] rows
    qx = jnp.broadcast_to(gx[:, None], (U, U))                    # [Ucol, Urow]
    qy = jnp.broadcast_to(gy[None, :], (U, U))
    # ray length from camera to the reference-plane pixel: t along the ray is
    # t_k = lam_k * L (p = o + lam*(q - o)), segment length per slice is const/pixel
    L = jnp.sqrt((qx - o_p[1]) ** 2 + (qy - o_p[2]) ** 2 + (z_ref - o_p[0]) ** 2)
    inv_denom = 1.0 / (z_ref - o_p[0])
    dz_world = 2.0 * bound / (Z - 1)
    delta = jnp.abs(dz_world * inv_denom) * L                     # [Ucol, Urow]

    z_vals = -bound + dz_world * jnp.arange(Z, dtype=jnp.float32)
    flip = uni[8] < 0

    B = vd_bands * vd_bands
    vd0 = C - 3 * B  # view-SH channels occupy the tail of the layout
    if vd_bands:
        from ..ops.sh import sh_encode
        # per-intermediate-pixel ray direction: one pixel == one camera ray
        # through its reference-plane point; rotate permuted->world for SH
        dp = jnp.stack([jnp.broadcast_to(z_ref - o_p[0], (U, U)),
                        qx - o_p[1], qy - o_p[2]], -1)
        dp = dp / jnp.linalg.norm(dp, axis=-1, keepdims=True)
        w_from_p = uni[19:28].reshape(3, 3)
        dw = jnp.einsum("ij,uvj->uvi", w_from_p, dp)
        Ysh = jnp.moveaxis(sh_encode(dw, vd_bands), -1, 1).astype(fdt)  # [Ucol,B,Urow]
        vdw = uni[18].astype(fdt)

    def shade(feat, lam, zk, mask_uv):
        """feat [Ucol, C, Urow] (dtype fdt) -> sigma f32, r/g/b fdt [Ucol, Urow]."""
        sigma = feat[:, 0, :].astype(jnp.float32) * density_scale
        ow = offsets_weight.astype(fdt)

        def add_vd(r, g, b):
            if not vd_bands:
                return r, g, b
            cr = (feat[:, vd0:vd0 + B, :] * Ysh).sum(1)
            cg = (feat[:, vd0 + B:vd0 + 2 * B, :] * Ysh).sum(1)
            cb = (feat[:, vd0 + 2 * B:vd0 + 3 * B, :] * Ysh).sum(1)
            return r + vdw * cr, g + vdw * cg, b + vdw * cb

        if P == 0:
            r, g, b = add_vd(feat[:, 1, :], feat[:, 2, :], feat[:, 3, :])
            return sigma, r, g, b
        om = feat[:, 1:1 + P, :]                                  # [Ucol, P, Urow]
        off_r = feat[:, 1 + P:1 + 2 * P, :]
        off_g = feat[:, 1 + 2 * P:1 + 3 * P, :]
        off_b = feat[:, 1 + 3 * P:1 + 4 * P, :]
        srad = jax.nn.softplus(feat[:, 1 + 4 * P, :].astype(jnp.float32)
                               )[:, None, :].astype(fdt)            # [Ucol, 1, Urow]
        bc = jnp.clip(basis_color, 0.0, 1.0).astype(fdt)
        if has_style:
            # Stylizer (palette/renderer.py:166-183): intensity offsets, palette
            # offsets, and a 3x3 per-basis transform of the offsets, with the
            # product clipped to [0,1] as in the reference
            srad = jnp.clip(srad + sty_dI.astype(fdt)[None, :, None], 0.0, None)
            bc = bc + sty_dP.astype(fdt)
            sty_dd_ = sty_dd.astype(fdt)
            o_r = ow * off_r
            o_g = ow * off_g
            o_b = ow * off_b
            t_r = (o_r * sty_dd_[None, :, 0, 0, None] + o_g * sty_dd_[None, :, 1, 0, None]
                   + o_b * sty_dd_[None, :, 2, 0, None])
            t_g = (o_r * sty_dd_[None, :, 0, 1, None] + o_g * sty_dd_[None, :, 1, 1, None]
                   + o_b * sty_dd_[None, :, 2, 1, None])
            t_b = (o_r * sty_dd_[None, :, 0, 2, None] + o_g * sty_dd_[None, :, 1, 2, None]
                   + o_b * sty_dd_[None, :, 2, 2, None])
            fr = jnp.clip(srad * (bc[None, :, 0, None] + t_r), 0.0, 1.0)
            fg = jnp.clip(srad * (bc[None, :, 1, None] + t_g), 0.0, 1.0)
            fb = jnp.clip(srad * (bc[None, :, 2, None] + t_b), 0.0, 1.0)
        else:
            fr = srad * (bc[None, :, 0, None] + ow * off_r)
            fg = srad * (bc[None, :, 1, None] + ow * off_g)
            fb = srad * (bc[None, :, 2, None] + ow * off_b)
        if has_edit:
            # RegionEdit per sample. xyz is in the PERMUTED frame; render_sweep
            # permutes edit.mean_xyz to match (isotropic gaussian -> same distance).
            pxs = o_p[1] + (qx - o_p[1]) * lam
            pys = o_p[2] + (qy - o_p[2]) * lam
            d2 = ((zk - uni[13]) ** 2 + (pxs - uni[14]) ** 2
                  + (pys - uni[15]) ** 2)
            wgt = jnp.where(uni[16] > 0,
                            jnp.exp(-d2 / uni[17]), 1.0)[:, None, :].astype(fdt)
            if has_mask:
                # baked semantic (clip) weight, interpolated like the features
                wgt = wgt * mask_uv[:, None, :]
            if weight_mode:
                # visualize the mask instead of recoloring (renderer.py:144-147)
                w_rgb = (om * wgt).sum(1)
                return sigma, w_rgb, w_rgb, w_rgb

            slice_d2 = (zk - uni[13]) ** 2
            near_edit = (uni[16] <= 0) | (slice_d2 <= 6.9 * uni[17])

            if edit_bases is not None:
                # restricted edit in DELTA form: contract the UNEDITED palette
                # (the work the plain sweep does anyway) and add the edited
                # bases' weighted correction om_e * (edited - plain). Avoids
                # re-materializing the full [Ucol, P, Urow] fr/fg/fb triple via
                # .at[...].set scatters (3 copies x 2 passes per slice — the
                # round-4 finding that a single-basis recolor still halved the
                # frame rate) and keeps the edit_cull cond operands at the
                # contracted [Ucol, Urow] size.
                eb = list(edit_bases)
                dhsv = delta_hsv.astype(fdt)
                dh = dhsv[None, eb, 0, None]
                ds = dhsv[None, eb, 1, None]
                dv = dhsv[None, eb, 2, None]
                fre, fge, fbe = fr[:, eb, :], fg[:, eb, :], fb[:, eb, :]
                ome = om[:, eb, :]

                def edit_delta(_):
                    re, ge, be = _hsv_edit_planar(fre, fge, fbe, dh, ds, dv, wgt)
                    return ((ome * (re - fre)).sum(1),
                            (ome * (ge - fge)).sum(1),
                            (ome * (be - fbe)).sum(1))

                if edit_cull:
                    def no_delta(_):
                        z = jnp.zeros(fr.shape[:1] + fr.shape[2:], fr.dtype)
                        return z, z, z

                    d_r, d_g, d_b = jax.lax.cond(
                        near_edit, edit_delta, no_delta, None)
                else:
                    d_r, d_g, d_b = edit_delta(None)
                r, g, b = add_vd((om * fr).sum(1) + d_r,
                                 (om * fg).sum(1) + d_g,
                                 (om * fb).sum(1) + d_b)
                return sigma, r, g, b

            dhsv = delta_hsv.astype(fdt)
            dh = dhsv[None, :, 0, None]
            ds = dhsv[None, :, 1, None]
            dv = dhsv[None, :, 2, None]

            def recolor(ops):
                r0, g0, b0 = ops
                return _hsv_edit_planar(r0, g0, b0, dh, ds, dv, wgt)

            if edit_cull:
                # per-slice edit culling (STATIC mode, enabled by render_sweep
                # only for tight spatial edits where many slices actually skip):
                # slices whose gaussian mask is everywhere < 1e-3 skip the
                # ~35-op HSV chain (worst-case color error 1e-3 ~ 60 dB). The
                # cond materializes its operands — a fusion break that costs
                # ~18 ms/frame — so global edits bypass it entirely.
                def plain(ops):
                    return ops

                fr, fg, fb = jax.lax.cond(near_edit, recolor, plain, (fr, fg, fb))
            else:
                fr, fg, fb = recolor((fr, fg, fb))
        r, g, b = add_vd((om * fr).sum(1), (om * fg).sum(1), (om * fb).sum(1))
        return sigma, r, g, b

    def do_slice(k_eff, carry):
        T, r_acc, g_acc, b_acc, depth_acc = carry
        slc = jax.lax.dynamic_index_in_dim(vol, k_eff, 0, keepdims=False)  # [X,C,Y]
        zk = z_vals[k_eff]
        lam = (zk - o_p[0]) * inv_denom
        sx = (o_p[1] + (gx - o_p[1]) * lam + bound) / (2.0 * bound) * (X - 1)
        sy = (o_p[2] + (gy - o_p[2]) * lam + bound) / (2.0 * bound) * (Y - 1)
        A = _interp_matrix(sx, X)                                  # [Ucol, X]
        B = _interp_matrix(sy, Y)                                  # [Urow, Y]
        t1 = jax.lax.dot_general(
            A, slc.reshape(X, C * Y), (((1,), (0,)), ((), ())),
            preferred_element_type=fdt,
        ).reshape(U, C, Y)
        feat = jax.lax.dot_general(
            t1, B, (((2,), (1,)), ((), ())),
            preferred_element_type=fdt,
        )                                                          # [Ucol, C, Urow]

        if has_mask:
            mslc = jax.lax.dynamic_index_in_dim(mask_vol, k_eff, 0, keepdims=False)
            m1 = jax.lax.dot_general(
                A, mslc, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt)                        # [Ucol, Y]
            mask_uv = jax.lax.dot_general(
                m1, B, (((1,), (1,)), ((), ())),
                preferred_element_type=fdt)                        # [Ucol, Urow]
        else:
            mask_uv = None
        sigma, r, g, b = shade(feat, lam, zk, mask_uv)
        t_k = lam * L
        valid = (t_k > min_near) & (T > t_thresh)
        alpha = jnp.where(valid, 1.0 - jnp.exp(-sigma * delta), 0.0)
        w = T * alpha
        return (T * (1.0 - alpha), r_acc + w * r, g_acc + w * g,
                b_acc + w * b, depth_acc + w * t_k)

    # skip granularity: lax.cond once per slice or per BLOCK of slices; the
    # per-pixel `valid` mask still gives exact per-sample early termination.
    BLK = 8

    def step(carry, k):
        k_eff = jnp.where(flip, Z - 1 - k, k)

        def run(_):
            return do_slice(k_eff, carry)

        def skp(_):
            return carry

        if skip == "slice":
            pred = occ[k_eff] & (jnp.max(carry[0]) > t_thresh)
            return jax.lax.cond(pred, run, skp, None), None
        return run(None), None

    def block_step(carry, kb):
        def run(c):
            return jax.lax.scan(step, c, kb * BLK + jnp.arange(BLK), unroll=unroll)[0]

        def skp(c):
            return c

        # occupancy of the block under either sweep direction
        k_eff = jnp.where(flip, Z - 1 - (kb * BLK + jnp.arange(BLK)),
                          kb * BLK + jnp.arange(BLK))
        pred = occ[k_eff].any() & (jnp.max(carry[0]) > t_thresh)
        return jax.lax.cond(pred, run, skp, carry), None

    zero = jnp.zeros((U, U), jnp.float32)
    carry0 = (jnp.ones((U, U), jnp.float32), zero, zero, zero, zero)
    if skip == "block" and Z % BLK == 0:
        (T, r_acc, g_acc, b_acc, depth_acc), _ = jax.lax.scan(
            block_step, carry0, jnp.arange(Z // BLK))
    else:
        (T, r_acc, g_acc, b_acc, depth_acc), _ = jax.lax.scan(
            step, carry0, jnp.arange(Z), unroll=(unroll if skip == "none" else 1))
    ws = 1.0 - T
    # single fused transpose back to [row, col, 5] for the warp; bf16 output —
    # the warp gathers in bf16 anyway, so keep the staging buffer half-size
    return jnp.stack(
        [r_acc.T, g_acc.T, b_acc.T, depth_acc.T, ws.T], -1)      # [U, U, 5]


# warp uniform vector layout (one transfer per frame, same rationale as _UNI_LEN):
#   0:3 o_p | 3:12 rot_p row-major | 12:16 fx fy cx cy | 16:20 gx0 gdx gy0 gdy
#   20 z_ref | 21 bound | 22 min_near | 23:26 bg_color
_UNIW_LEN = 26


@partial(jax.jit, static_argnames=("h", "w", "u_res"))
def _warp_to_screen(inter, uniw, *, h: int, w: int, u_res: int):
    """Homography warp: output pixel -> camera ray -> reference-plane intersection ->
    bilinear sample of the intermediate maps. The frame's only gather (h*w*4 rows);
    the table is read in bf16 — row gathers are BYTES-bound on v5e (measured 29 ms
    f32 vs 7.4 ms bf16 for the 4x640k rows), and bf16 keeps ~48 dB on [0,1] rgb,
    well past the display / metric floor."""
    from ..ops.rays import near_far_from_aabb

    U = u_res
    o_p = uniw[0:3]
    rot_p = uniw[3:12].reshape(3, 3)
    fx, fy, cx, cy = (uniw[12 + i] for i in range(4))
    gx0, gdx, gy0, gdy, z_ref = (uniw[16 + i] for i in range(5))
    bound, min_near = uniw[21], uniw[22]
    bg_color = uniw[23:26]

    col = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    row = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    dx = (col - cx) / fx
    dy = (row - cy) / fy
    dcam = jnp.stack([jnp.broadcast_to(dx, (h, w)),
                      jnp.broadcast_to(dy, (h, w)),
                      jnp.ones((h, w))], -1)
    dcam = dcam / jnp.linalg.norm(dcam, axis=-1, keepdims=True)
    d_p = jnp.einsum("ij,hwj->hwi", rot_p, dcam)                  # permuted frame

    t_ref = (z_ref - o_p[0]) / d_p[..., 0]
    qx = o_p[1] + t_ref * d_p[..., 1]
    qy = o_p[2] + t_ref * d_p[..., 2]
    u = (qx - gx0) / gdx                                          # col coord
    v = (qy - gy0) / gdy                                          # row coord
    inb = (t_ref > 0) & (u >= 0) & (u <= U - 1) & (v >= 0) & (v <= U - 1)
    u = jnp.clip(u, 0.0, U - 1.0)
    v = jnp.clip(v, 0.0, U - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, U - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, U - 2)
    fu = (u - u0).reshape(-1, 1)
    fv = (v - v0).reshape(-1, 1)

    flat = inter.astype(jnp.bfloat16).reshape(U * U, -1)
    base = (v0 * U + u0).reshape(-1)
    s00 = flat[base].astype(jnp.float32)
    s01 = flat[base + 1].astype(jnp.float32)
    s10 = flat[base + U].astype(jnp.float32)
    s11 = flat[base + U + 1].astype(jnp.float32)
    out = ((s00 * (1 - fu) + s01 * fu) * (1 - fv)
           + (s10 * (1 - fu) + s11 * fu) * fv).reshape(h, w, -1)
    out = jnp.where(inb[..., None], out, 0.0)

    rgb, depth_abs, ws = out[..., 0:3], out[..., 3], out[..., 4]
    image = rgb + (1.0 - ws)[..., None] * bg_color

    # normalized depth, matching render_palette_eval / render_baked semantics.
    # near/far in the permuted frame == world frame (cube aabb is symmetric).
    aabb = jnp.stack([-bound, -bound, -bound, bound, bound, bound])
    nears, fars = near_far_from_aabb(
        jnp.broadcast_to(o_p, (h * w, 3)), d_p.reshape(-1, 3), aabb, min_near)
    nears = nears.reshape(h, w)
    fars = fars.reshape(h, w)
    depth = jnp.clip(depth_abs - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)

    return {"image": image, "depth": depth, "depth_origin": depth_abs,
            "weights_sum": ws}


# --------------------------------------------------------------------------- API

def render_sweep(
    sv: SweepVolume,
    pose,
    intrinsics,
    H: int,
    W: int,
    u_res: int = 512,
    basis_color=None,
    edit: Optional[RegionEdit] = None,
    offsets_weight: float = 1.0,
    view_dep_weight: float = 1.0,
    bg_color=1.0,
    min_near: float = 0.05,
    t_thresh: float = 1e-2,
    density_scale: float = 1.0,
    skip: str = "block",
    unroll: Optional[int] = None,
    stylizer=None,
    clip_masks=None,
    shade_bf16: Optional[bool] = None,
):
    """Render one frame from a SweepVolume. Palette mode iff ``sv.num_basis > 0``
    (then ``basis_color`` [P,3] is required — pass *edited* colors for recoloring).

    Matches ``render_baked``'s output surface (image, depth, depth_origin,
    weights_sum); palette edits (RegionEdit / offsets_weight / view_dep_weight /
    basis colors), Stylizer params, and semantic clip-mask edits apply per-sample
    inside the sweep, with ``render_palette_eval`` semantics. For a clip-weighted
    edit pass ``clip_masks = build_clip_masks(baked.clip_feat, mean, std)``
    (rebuild on mean/std change).
    """
    plan = plan_sweep(np.asarray(pose), intrinsics, H, W, sv.bound, u_res)
    P = sv.num_basis
    C = sv.vols[0].shape[2]
    if unroll is None:
        # round-5 on-chip matrix (scripts/probe_sweep_skip.py, trained bake):
        # narrow volumes (nerf C=4) are pipeline-latency-bound — unroll 8 lets
        # XLA overlap slices (28 -> 63 fps); wide palette volumes are VMEM-bound
        # and regress past unroll 4 (26.4 -> 20.8 fps at unroll 8).
        unroll = 8 if C <= 8 else 4
    if shade_bf16 is None:
        # palette shade is VPU-bound; bf16 doubles it (PSNR-checked >= 45 dB vs
        # the f32 sweep on the trained bake). The nerf sweep keeps f32 shade —
        # it is latency-bound, not VPU-bound, so bf16 buys nothing there.
        shade_bf16 = P > 0
    if P:
        assert basis_color is not None, "palette sweep needs basis_color [P,3]"
        bc = jnp.asarray(basis_color, jnp.float32)
    else:
        bc = jnp.zeros((1, 3), jnp.float32)
    has_edit = edit is not None
    has_mask = False
    edit_bases = None
    if has_edit and not edit.weight_mode:
        # static subset of recolored bases (neutral delta = (0, 1, 1) is an HSV
        # identity); empty set -> drop the edit branch, full set -> None (=all)
        d = np.asarray(edit.delta_hsv, np.float32)
        touched = tuple(
            int(p) for p in range(d.shape[0])
            if abs((d[p, 0] + 180.0) % 360.0 - 180.0) > 1e-4
            or abs(d[p, 1] - 1.0) > 1e-4 or abs(d[p, 2] - 1.0) > 1e-4)
        if not touched:
            has_edit = False
        elif len(touched) < d.shape[0]:
            edit_bases = touched
    if edit is None:
        edit = make_region_edit(max(P, 1), clip_dim=1)
    elif bool(np.asarray(edit.use_clip)):
        if clip_masks is None:
            raise ValueError(
                "clip-weighted sweep edit needs clip_masks="
                "build_clip_masks(baked.clip_feat, edit.mean_clip, edit.std_clip)")
        has_mask = True

    # pack every per-frame scalar into ONE host-built vector per kernel (a
    # single H2D transfer; separate scalar args cost ~0.8 ms each through the
    # remote-TPU tunnel). The edit center is permuted into the sweep frame here
    # (the gaussian is isotropic, so permuting coordinates preserves distances).
    mean_p = np.asarray(edit.mean_xyz, np.float32)[list(plan.perm)]
    uni = np.empty(_UNI_LEN, np.float32)
    uni[0:3] = plan.o_p
    uni[3:9] = (plan.gx0, plan.gdx, plan.gy0, plan.gdy, plan.z_ref, plan.dsign)
    uni[9:13] = (offsets_weight, density_scale, min_near, sv.bound)
    uni[13:16] = mean_p
    uni[16] = float(np.asarray(edit.use_xyz))
    uni[17] = float(np.asarray(edit.std_xyz))
    uni[18] = view_dep_weight
    w_from_p = np.zeros((3, 3), np.float32)
    for i, pi in enumerate(plan.perm):
        w_from_p[pi, i] = 1.0
    uni[19:28] = w_from_p.reshape(-1)

    bg = np.broadcast_to(np.asarray(bg_color, np.float32), (3,))
    uniw = np.empty(_UNIW_LEN, np.float32)
    uniw[0:3] = plan.o_p
    uniw[3:12] = plan.rot_p.reshape(-1)
    uniw[12:16] = [float(v) for v in intrinsics]
    uniw[16:21] = (plan.gx0, plan.gdx, plan.gy0, plan.gdy, plan.z_ref)
    uniw[21:23] = (sv.bound, min_near)
    uniw[23:26] = bg

    # two dispatches (composite, warp) measure FASTER than one fused program
    # here — dispatch latency is hidden by async execution, and the split
    # programs schedule better on this XLA version
    # static per-slice HSV culling only when the edit is tight enough that a
    # meaningful share of slices will actually skip (the cond is a fusion break)
    edit_cull = bool(has_edit and np.asarray(edit.use_xyz) and not has_mask
                     and 6.9 * float(np.asarray(edit.std_xyz)) < sv.bound ** 2)
    has_style = stylizer is not None
    if has_style:
        sty_dI = jnp.asarray(stylizer.dI, jnp.float32)
        sty_dP = jnp.asarray(stylizer.dP, jnp.float32).reshape(-1, 3)
        sty_dd = jnp.asarray(stylizer.ddelta, jnp.float32)
    else:
        n_b = max(P, 1)
        sty_dI = jnp.zeros((n_b,), jnp.float32)
        sty_dP = jnp.zeros((n_b, 3), jnp.float32)
        sty_dd = jnp.zeros((n_b, 3, 3), jnp.float32)
    mask_vol = (clip_masks[plan.axis] if has_mask
                else jnp.zeros((1, 1, 1), jnp.bfloat16))
    inter = _sweep_composite(
        sv.vols[plan.axis], sv.occ[plan.axis], bc,
        jnp.asarray(edit.delta_hsv, jnp.float32), jnp.asarray(uni),
        mask_vol, sty_dI, sty_dP, sty_dd,
        num_basis=P, u_res=u_res, t_thresh=float(t_thresh),
        weight_mode=bool(edit.weight_mode), has_edit=has_edit,
        edit_cull=edit_cull, skip=skip, unroll=unroll,
        vd_bands=sv.vd_bands, has_style=has_style, has_mask=has_mask,
        edit_bases=edit_bases, shade_bf16=bool(shade_bf16),
    )
    return _warp_to_screen(inter, jnp.asarray(uniw), h=H, w=W, u_res=u_res)
