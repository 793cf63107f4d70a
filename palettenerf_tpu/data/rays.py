"""Camera-ray generation and pixel-index sampling.

Port of the reference ``get_rays`` (``nerf/utils.py:53-151``) split into two pieces:

- ``sample_ray_indices`` (host, NumPy): picks which pixels to train on this step —
  uniform / patch / error-map multinomial / ``random_size`` paired mode. Host-side on
  purpose: it is a few thousand integers per step and the error-map multinomial needs
  host state anyway.
- ``gen_rays`` (NumPy or jnp): flat pixel indices + pose + intrinsics -> (rays_o, rays_d)
  with the reference's pixel-center convention (+0.5) and OpenCV-style camera axes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def sample_ray_indices(
    rng: np.random.Generator,
    H: int,
    W: int,
    num_rays: int,
    error_map: Optional[np.ndarray] = None,
    patch_size: int = 1,
    random_size: int = 0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Returns (inds [N] flat pixel indices, inds_coarse or None)."""
    n = min(num_rays, H * W)

    if patch_size > 1:
        # patch sampling for LPIPS loss (nerf/utils.py:79-96)
        num_patch = n // (patch_size ** 2)
        ix = rng.integers(0, H - patch_size, num_patch)
        iy = rng.integers(0, W - patch_size, num_patch)
        pi, pj = np.meshgrid(np.arange(patch_size), np.arange(patch_size), indexing="ij")
        offs = np.stack([pi.reshape(-1), pj.reshape(-1)], -1)  # [p^2, 2]
        inds2 = (np.stack([ix, iy], -1)[:, None, :] + offs[None]).reshape(-1, 2)
        return (inds2[:, 0] * W + inds2[:, 1]).astype(np.int64), None

    if random_size > 0:
        # paired-pixel mode for patch smoothness (nerf/utils.py:97-111)
        assert n % 2 == 0
        half = n // 2
        ix = rng.integers(0, H, half)
        iy = rng.integers(0, W, half)
        dx = np.clip(ix + rng.integers(-random_size, random_size, half), 0, H - 1)
        dy = np.clip(iy + rng.integers(-random_size, random_size, half), 0, W - 1)
        inds2 = np.concatenate([np.stack([ix, iy], -1), np.stack([dx, dy], -1)], 0)
        return (inds2[:, 0] * W + inds2[:, 1]).astype(np.int64), None

    if error_map is None:
        return rng.integers(0, H * W, n).astype(np.int64), None

    # error-map-weighted coarse sampling on 128x128 grid (nerf/utils.py:115-127)
    p = error_map / error_map.sum()
    inds_coarse = rng.choice(128 * 128, size=n, replace=False, p=p)
    cx_, cy_ = inds_coarse // 128, inds_coarse % 128
    sx, sy = H / 128, W / 128
    ix = np.minimum((cx_ * sx + rng.random(n) * sx).astype(np.int64), H - 1)
    iy = np.minimum((cy_ * sy + rng.random(n) * sy).astype(np.int64), W - 1)
    return ix * W + iy, inds_coarse


def gen_rays(pose: np.ndarray, intrinsics, H: int, W: int, inds: Optional[np.ndarray] = None):
    """pose [4,4] c2w, intrinsics (fx,fy,cx,cy); inds flat pixel idx or None for all.

    Returns (rays_o [N,3], rays_d [N,3]) float32 (nerf/utils.py:129-149 math).
    """
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    if inds is None:
        inds = np.arange(H * W, dtype=np.int64)
    col = (inds % W).astype(np.float32) + 0.5
    row = (inds // W).astype(np.float32) + 0.5

    xs = (col - cx) / fx
    ys = (row - cy) / fy
    zs = np.ones_like(xs)
    dirs = np.stack([xs, ys, zs], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)
