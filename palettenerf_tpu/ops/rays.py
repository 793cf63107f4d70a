"""Per-ray geometry ops: AABB intersection and background-sphere coordinates.

Vectorized ``jnp`` ports of the reference CUDA kernels:
- ``near_far_from_aabb``: slab test (``raymarching/src/raymarching.cu:95-159``).
  Rays missing the box get near == far == BIG (reference uses float max; we use 1e10 to
  stay finite under bf16/f32 arithmetic downstream).
- ``sph_from_ray``: intersection with the background sphere, returning normalized
  (theta, phi) coords in [-1, 1] (``raymarching.cu:166-212``, y-up convention).

These are trivially fused by XLA into the surrounding render graph; no Pallas needed.
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = 1e10


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """rays_o/d: [N,3]; aabb: [6] (xmin,ymin,zmin,xmax,ymax,zmax) -> (near [N], far [N])."""
    inv_d = 1.0 / rays_d  # IEEE inf for axis-parallel rays is handled by min/max below
    t0 = (aabb[:3] - rays_o) * inv_d  # [N,3]
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, BIG, near)
    far = jnp.where(miss, BIG, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Background sphere coords: [N,3],[N,3] -> [N,2] (theta,phi) in [-1,1]. y-up."""
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)  # b/2 in quadratic terms
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - a * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / a  # larger (positive) root
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)
