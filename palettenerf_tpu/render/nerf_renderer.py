"""NeRF volume renderer (stage 1): train and eval paths.

TPU-native re-design of the reference render paths (``nerf/renderer.py:258-393``
run_cuda). Both the training branch (adaptive marcher + single composite) and the
inference branch (host-driven alive-ray loop, ``:336-386``) collapse into ONE fixed-width
pipeline here:

    near/far -> closed-form candidate march (ops.march) -> MLP over [N*S] samples
             -> masked composite (ops.composite)

The eval path simply uses a larger sample budget S and no perturbation — there is no
host loop and no D2H sync anywhere (the reference syncs ``n_alive`` every iteration,
``nerf/renderer.py:357``; that was its main FPS limiter).

Outputs match the reference result dict: ``image``, ``depth`` (normalized exactly as
``nerf/renderer.py:318,329``), ``weights_sum``, ``rgb_norm`` (per-ray GT error spread,
``:301-307``), plus ``depth_origin`` for the palette stage's xyz reconstruction.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.nerf import NeRFSpec, encode_rand_for, nerf_background, nerf_forward
from ..ops.composite import composite_rays
from ..ops.march import build_super_bitfield, march_rays
from ..ops.rays import near_far_from_aabb, sph_from_ray


@dataclass(frozen=True)
class RenderSettings:
    """Static render configuration (hashable; closed over by jit)."""

    bound: float = 1.0
    cascade: int = 1
    grid_size: int = 128
    dt_gamma: float = 0.0
    max_steps: int = 1024       # candidate budget K (reference max_steps)
    num_samples: int = 128      # retained sample slots S
    density_scale: float = 1.0
    t_thresh: float = 1e-4
    min_near: float = 0.2
    bg_radius: float = -1.0
    # eval compaction schedule: ((ray_divisor, samples), ...). Round 0 must have
    # divisor 1. Empty tuple = single fixed-width pass. This is the static-shape
    # analog of the reference's alive-ray loop (nerf/renderer.py:349-380): most rays
    # saturate early, so later rounds march only the top 1/divisor surviving rays.
    compaction_rounds: tuple = ()
    # hierarchical 2-phase occupancy march: group slots for the coarse pass
    # (0 = flat per-candidate tests; see ops/march.py build_super_bitfield)
    march_groups: int = 0
    # cross-ray valid-sample compaction for eval field evals: only march-valid
    # sample slots reach the network, in a compact buffer of
    # ceil(frac * N * S) slots (0 = off). Exact — invalid slots contribute
    # sigma 0 either way; valid samples past the budget are dropped, the same
    # overflow posture as the reference's sample buffer (raymarching.cu:419).
    compact_frac: float = 0.0
    # eval-only finer culling grid (ops.occupancy.bake_fine_bitfield): when > 0
    # the render fns expect bitfield=(train_bits, fine_bits) and the marcher
    # tests the fine grid wherever dt <= fine cell edge (dt-aware fallback to
    # the train grid everywhere else — sound for any max_steps). grid_size
    # stays the TRAIN grid so dt_min/dt_max/mip semantics are unchanged.
    fine_grid_size: int = 0


def _sup(bitfield, settings: RenderSettings):
    """Dilated global supercell mip for the hierarchical march (None when
    disabled or statically unsound — see ops.march.super_bitfield_ok). Derived
    from the bitfield inside jit — loop-invariant, so XLA hoists it out of
    scanned train steps."""
    from ..ops.march import super_bitfield_ok

    if settings.march_groups <= 0 or not super_bitfield_ok(
            settings.bound, settings.grid_size, settings.cascade):
        return None
    if isinstance(bitfield, (tuple, list)):  # (train, fine): supermip from the
        bitfield = bitfield[0]               # train grid — a superset of fine
    return build_super_bitfield(bitfield, settings.grid_size, settings.cascade)


def forward_compact(forward_fn, valid, budget: int, *sample_args):
    """Evaluate ``forward_fn`` only on the ``valid`` flat samples.

    The occupancy march leaves most [N, S] sample slots masked on real scenes;
    the fixed-shape field eval still pays their hash gathers (the dominant
    frame cost: 128 gathered rows/sample at ~175M rows/s). This compacts the
    valid slots to the front of a static ``budget``-slot buffer (cumsum +
    one 1-D scatter of slot ids), runs the field there, and expands results
    back with one gather. Exact: invalid slots come back 0, and compositing
    already treats masked slots as sigma 0.

    sample_args: per-sample arrays [M, ...] passed through compaction.
    forward_fn(*compacted_args) -> tuple of [B, ...] arrays.
    Returns the tuple expanded to [M, ...] (zeros at invalid/dropped slots).
    """
    M = valid.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    in_budget = valid & (pos < budget)
    src = jnp.zeros((budget,), jnp.int32).at[
        jnp.where(in_budget, pos, budget)
    ].set(jnp.arange(M, dtype=jnp.int32), mode="drop")
    outs = forward_fn(*(a[src] for a in sample_args))
    posc = jnp.clip(pos, 0, budget - 1)
    expanded = []
    for o in outs:
        e = o[posc]
        shape = in_budget.shape + (1,) * (e.ndim - 1)
        expanded.append(jnp.where(in_budget.reshape(shape), e, 0))
    return tuple(expanded)


def _compact_budget(settings: RenderSettings, n_slots: int) -> int:
    b = int(n_slots * settings.compact_frac + 0.5)
    return max(128, min(n_slots, (b + 127) // 128 * 128))


def compact_overflow(valid, budget: int):
    """March-valid samples dropped by an undersized compact budget, shape [1].

    The reference sizes its sample buffer to the ray budget and drops overflow
    rays silently (raymarching.cu:419); here the drop is per-sample and this
    count makes an undersized ``--eval/train_compact_frac`` detectable instead
    of silently darkening renders (advisor round-3 finding)."""
    return jnp.maximum(valid.sum(dtype=jnp.int32) - budget, 0)[None]


def _resolve_bg(params, spec: NeRFSpec, rays_o, rays_d, bg_color, settings: RenderSettings):
    """Background color per ray: bg model > explicit color > white (renderer.py:274-279)."""
    if settings.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, settings.bg_radius)
        return nerf_background(params, spec, sph, rays_d)
    if bg_color is None:
        return jnp.ones((3,), jnp.float32)
    return bg_color


def render_nerf_train(
    params,
    spec: NeRFSpec,
    bitfield,
    rays_o,
    rays_d,
    key,
    settings: RenderSettings,
    bg_color=None,
    rays_gt: Optional[jnp.ndarray] = None,
    perturb: bool = True,
):
    """Differentiable train-path render of a flat ray batch [N, 3].

    Returns dict(image [N,3], depth [N], weights_sum [N], rgb_norm [N]).
    """
    n = rays_o.shape[0]
    aabb = jnp.asarray(
        [-settings.bound, -settings.bound, -settings.bound,
         settings.bound, settings.bound, settings.bound], jnp.float32
    )
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    bg = _resolve_bg(params, spec, rays_o, rays_d, bg_color, settings)

    k_noise, k_enc = jax.random.split(key)
    noise = jax.random.uniform(k_noise, (n,)) if perturb else None
    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield,
        settings.bound, settings.cascade, settings.grid_size,
        settings.dt_gamma, settings.max_steps, settings.num_samples, noise,
        sup_bitfield=_sup(bitfield, settings), max_groups=settings.march_groups,
        fine_grid_size=settings.fine_grid_size,
    )

    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape)
    n_slots = n * settings.num_samples
    overflow = None
    if settings.compact_frac > 0:
        budget = _compact_budget(settings, n_slots)
        overflow = compact_overflow(m.mask.reshape(-1), budget)
        rand = encode_rand_for(k_enc, spec, budget)
        sigmas, rgbs = forward_compact(
            lambda x, d: nerf_forward(params, spec, x, d, training=True,
                                      rand=rand),
            m.mask.reshape(-1), budget,
            m.xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    else:
        rand = encode_rand_for(k_enc, spec, n_slots)
        sigmas, rgbs = nerf_forward(params, spec, m.xyzs.reshape(-1, 3),
                                    dirs.reshape(-1, 3), training=True, rand=rand)
    sigmas = sigmas.reshape(n, -1) * settings.density_scale
    rgbs = rgbs.reshape(n, -1, 3)

    ws, depth, image = composite_rays(sigmas, rgbs, m.dts, m.t_cum, m.mask, settings.t_thresh)

    # per-sample GT error composited back to rays (sparsity supervision, renderer.py:301-307)
    if rays_gt is not None:
        err = ((rays_gt[:, None, :] - rgbs) ** 2).sum(-1)  # [N, S]
        from ..ops.composite import composite_weights

        w, _, _ = composite_weights(sigmas, m.dts, m.mask, settings.t_thresh)
        rgb_norm = (w * err).sum(-1)
    else:
        rgb_norm = jnp.zeros((n,), jnp.float32)

    image = image + (1.0 - ws)[:, None] * bg
    depth_out = jnp.clip(depth - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)
    out = {
        "image": image,
        "depth": depth_out,
        "weights_sum": ws,
        "rgb_norm": rgb_norm,
    }
    if overflow is not None:
        out["compact_overflow"] = overflow
    return out


def render_nerf_uniform(
    params,
    spec: NeRFSpec,
    rays_o,
    rays_d,
    key,
    settings: RenderSettings,
    num_steps: int = 128,
    upsample_steps: int = 128,
    bg_color=None,
    perturb: bool = False,
):
    """Grid-free uniform + hierarchical-importance render path.

    Port of the reference's pure-PyTorch ``run()`` (nerf/renderer.py:127-255): uniform
    z-samples in [near, far], optional stratified perturbation, a no-grad density pass
    driving ``sample_pdf`` importance upsampling, merge+sort, then cumprod compositing
    (alphas_shifted formulation, :209-211). Depth here is normalized z (:227-228).
    """
    from ..models.nerf import nerf_density
    from ..ops.sampling import sample_pdf

    n = rays_o.shape[0]
    b = settings.bound
    aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    nears_, fars_ = nears[:, None], fars[:, None]

    z = jnp.linspace(0.0, 1.0, num_steps)[None, :]
    z_vals = nears_ + (fars_ - nears_) * z
    sample_dist = (fars_ - nears_) / num_steps
    if perturb:
        k1, key = jax.random.split(key)
        z_vals = z_vals + (jax.random.uniform(k1, z_vals.shape) - 0.5) * sample_dist

    def clip_pts(zv):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(pts, -b, b)

    xyzs = clip_pts(z_vals)
    sigmas = nerf_density(params, spec, xyzs.reshape(-1, 3))["sigma"].reshape(n, num_steps)

    if upsample_steps > 0:
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)
        alphas = 1.0 - jnp.exp(-deltas * settings.density_scale * jax.lax.stop_gradient(sigmas))
        shifted = jnp.concatenate([jnp.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], -1)
        weights = alphas * jnp.cumprod(shifted, -1)[..., :-1]
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        k2, key = jax.random.split(key)
        new_z = jax.lax.stop_gradient(
            sample_pdf(k2, z_mid, weights[:, 1:-1], upsample_steps, det=not perturb))
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], -1), -1)
        xyzs = clip_pts(z_vals)
        total = num_steps + upsample_steps
        sigmas = nerf_density(params, spec, xyzs.reshape(-1, 3))["sigma"].reshape(n, total)
    else:
        total = num_steps

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)
    alphas = 1.0 - jnp.exp(-deltas * settings.density_scale * sigmas)
    shifted = jnp.concatenate([jnp.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], -1)
    weights = alphas * jnp.cumprod(shifted, -1)[..., :-1]

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    _, rgbs = nerf_forward(params, spec, xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    rgbs = rgbs.reshape(n, total, 3)

    ws = weights.sum(-1)
    ori_z = jnp.clip((z_vals - nears_) / (fars_ - nears_), 0, 1)
    depth = (weights * ori_z).sum(-1)
    image = jnp.einsum("ns,nsc->nc", weights, rgbs)

    bg = _resolve_bg(params, spec, rays_o, rays_d, bg_color, settings)
    image = image + (1.0 - ws)[:, None] * bg
    return {"image": image, "depth": depth, "weights_sum": ws}


def render_nerf_eval_compact(
    params,
    spec: NeRFSpec,
    bitfield,
    rays_o,
    rays_d,
    settings: RenderSettings,
    bg_color=None,
):
    """Eval render with static alive-ray compaction rounds.

    Replaces the reference's host-driven while-loop over alive rays
    (nerf/renderer.py:336-386) with a FIXED schedule: round 0 marches every ray for a
    few samples; each later round gathers the top 1/divisor rays by remaining
    transmittance and continues marching only those, accumulating color via
    scatter-add. All shapes static; total MLP work drops ~4x vs a single wide pass.
    """
    rounds = settings.compaction_rounds
    assert rounds and rounds[0][0] == 1, "round 0 must cover all rays"
    n = rays_o.shape[0]
    aabb = jnp.asarray(
        [-settings.bound, -settings.bound, -settings.bound,
         settings.bound, settings.bound, settings.bound], jnp.float32
    )
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    bg = _resolve_bg(params, spec, rays_o, rays_d, bg_color, settings)

    s_total = sum(s for _, s in rounds)
    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield,
        settings.bound, settings.cascade, settings.grid_size,
        settings.dt_gamma, settings.max_steps, s_total, None,
        sup_bitfield=_sup(bitfield, settings), max_groups=settings.march_groups,
        fine_grid_size=settings.fine_grid_size,
    )

    image = jnp.zeros((n, 3), jnp.float32)
    depth = jnp.zeros((n,), jnp.float32)
    ws = jnp.zeros((n,), jnp.float32)
    trans = jnp.ones((n,), jnp.float32)  # remaining transmittance per ray
    overflow = jnp.zeros((1,), jnp.int32)

    offset = 0
    for divisor, s_r in rounds:
        n_r = n // divisor
        if divisor == 1:
            sel = None
            xyz = m.xyzs[:, offset:offset + s_r]
            dts = m.dts[:, offset:offset + s_r]
            t_cum = m.t_cum[:, offset:offset + s_r]
            mask = m.mask[:, offset:offset + s_r]
            rd_r = rays_d
            t_in = trans
        else:
            # rays still alive (transmittance above cutoff AND samples remaining)
            alive_score = jnp.where(m.mask[:, offset], trans, 0.0)
            _, sel = jax.lax.top_k(alive_score, n_r)
            xyz = m.xyzs[sel, offset:offset + s_r]
            dts = m.dts[sel, offset:offset + s_r]
            t_cum = m.t_cum[sel, offset:offset + s_r]
            mask = m.mask[sel, offset:offset + s_r]
            rd_r = rays_d[sel]
            t_in = trans[sel]

        dirs = jnp.broadcast_to(rd_r[:, None, :], xyz.shape)
        if settings.compact_frac > 0:
            budget = _compact_budget(settings, n_r * s_r)
            overflow = overflow + compact_overflow(mask.reshape(-1), budget)
            sig, rgb = forward_compact(
                lambda x, d: nerf_forward(params, spec, x, d),
                mask.reshape(-1), budget,
                xyz.reshape(-1, 3), dirs.reshape(-1, 3))
        else:
            sig, rgb = nerf_forward(params, spec, xyz.reshape(-1, 3),
                                    dirs.reshape(-1, 3))
        sig = sig.reshape(n_r, s_r).astype(jnp.float32) * settings.density_scale
        rgb = rgb.reshape(n_r, s_r, 3).astype(jnp.float32)

        sig = jnp.where(mask, sig, 0.0)
        alpha = 1.0 - jnp.exp(-sig * dts)
        t_rel = jnp.cumprod(1.0 - alpha, axis=-1)
        t_enter = t_in[:, None] * jnp.concatenate(
            [jnp.ones_like(t_rel[:, :1]), t_rel[:, :-1]], axis=-1)
        include = t_enter >= settings.t_thresh
        w = alpha * t_enter * include * mask

        d_img = jnp.einsum("ns,nsc->nc", w, rgb)
        d_ws = w.sum(-1)
        d_depth = (w * t_cum).sum(-1)
        t_out = t_in * t_rel[:, -1]

        if sel is None:
            image, ws, depth = image + d_img, ws + d_ws, depth + d_depth
            trans = t_out
        else:
            image = image.at[sel].add(d_img)
            ws = ws.at[sel].add(d_ws)
            depth = depth.at[sel].add(d_depth)
            trans = trans.at[sel].set(t_out)
        offset += s_r

    image = image + (1.0 - ws)[:, None] * bg
    depth_abs = depth + ws * nears
    depth_out = jnp.clip(depth_abs - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)
    out = {
        "image": image,
        "depth": depth_out,
        "depth_origin": depth_abs,
        "weights_sum": ws,
    }
    if settings.compact_frac > 0:
        out["compact_overflow"] = overflow
    return out


def render_nerf_eval(
    params,
    spec: NeRFSpec,
    bitfield,
    rays_o,
    rays_d,
    settings: RenderSettings,
    bg_color=None,
):
    """Non-differentiable eval render (bigger S, no perturb). Same output dict +
    ``depth_origin`` (raw composited distance, palette/renderer.py:526)."""
    if settings.compaction_rounds and rays_o.shape[0] >= 64:
        # tiny batches (GUI probes, unit tests) skip compaction — top_k over
        # n//16 rays needs a meaningful population
        return render_nerf_eval_compact(
            params, spec, bitfield, rays_o, rays_d, settings, bg_color)
    n = rays_o.shape[0]
    aabb = jnp.asarray(
        [-settings.bound, -settings.bound, -settings.bound,
         settings.bound, settings.bound, settings.bound], jnp.float32
    )
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    bg = _resolve_bg(params, spec, rays_o, rays_d, bg_color, settings)

    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield,
        settings.bound, settings.cascade, settings.grid_size,
        settings.dt_gamma, settings.max_steps, settings.num_samples, None,
        sup_bitfield=_sup(bitfield, settings), max_groups=settings.march_groups,
        fine_grid_size=settings.fine_grid_size,
    )
    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape)
    overflow = None
    if settings.compact_frac > 0:
        n_slots = n * m.xyzs.shape[1]
        budget = _compact_budget(settings, n_slots)
        overflow = compact_overflow(m.mask.reshape(-1), budget)
        sigmas, rgbs = forward_compact(
            lambda x, d: nerf_forward(params, spec, x, d),
            m.mask.reshape(-1), budget,
            m.xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    else:
        sigmas, rgbs = nerf_forward(params, spec, m.xyzs.reshape(-1, 3),
                                    dirs.reshape(-1, 3))
    sigmas = sigmas.reshape(n, -1) * settings.density_scale
    rgbs = rgbs.reshape(n, -1, 3)

    ws, depth, image = composite_rays(sigmas, rgbs, m.dts, m.t_cum, m.mask, settings.t_thresh)
    image = image + (1.0 - ws)[:, None] * bg
    # inference depth is ABSOLUTE in the reference (rays_t starts at nears,
    # raymarching.cu:1078-1079); t_cum is relative to t0 ~= nears
    depth_abs = depth + ws * nears
    depth_out = jnp.clip(depth_abs - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)
    out = {
        "image": image,
        "depth": depth_out,
        "depth_origin": depth_abs,
        "weights_sum": ws,
    }
    if overflow is not None:
        out["compact_overflow"] = overflow
    return out
