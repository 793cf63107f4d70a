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

from ..models.nerf import NeRFSpec, nerf_background, nerf_forward
from ..ops.composite import composite_rays
from ..ops.march import march_rays
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

    noise = jax.random.uniform(key, (n,)) if perturb else None
    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield,
        settings.bound, settings.cascade, settings.grid_size,
        settings.dt_gamma, settings.max_steps, settings.num_samples, noise,
    )

    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape)
    sigmas, rgbs = nerf_forward(params, spec, m.xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
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
    depth_out = jnp.clip(depth - nears, 0.0, None) / (fars - nears)
    return {
        "image": image,
        "depth": depth_out,
        "weights_sum": ws,
        "rgb_norm": rgb_norm,
    }


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
    )
    dirs = jnp.broadcast_to(rays_d[:, None, :], m.xyzs.shape)
    sigmas, rgbs = nerf_forward(params, spec, m.xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    sigmas = sigmas.reshape(n, -1) * settings.density_scale
    rgbs = rgbs.reshape(n, -1, 3)

    ws, depth, image = composite_rays(sigmas, rgbs, m.dts, m.t_cum, m.mask, settings.t_thresh)
    image = image + (1.0 - ws)[:, None] * bg
    depth_out = jnp.clip(depth - nears, 0.0, None) / (fars - nears)
    return {
        "image": image,
        "depth": depth_out,
        "depth_origin": depth,
        "weights_sum": ws,
    }
