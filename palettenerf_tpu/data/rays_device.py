"""Device-side (jnp) ray generation — same math as data/rays.py gen_rays but traceable,
for the scanned fast training path where pixel sampling happens inside jit."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gen_rays_jnp(pose, intrinsics, H: int, W: int, inds):
    """pose [4,4], intrinsics (fx,fy,cx,cy) floats, inds [N] flat pixel idx ->
    (rays_o [N,3], rays_d [N,3])."""
    fx, fy, cx, cy = intrinsics
    col = (inds % W).astype(jnp.float32) + 0.5
    row = (inds // W).astype(jnp.float32) + 0.5
    xs = (col - cx) / fx
    ys = (row - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d
