"""Color-space conversions (sRGB <-> linear, RGB <-> HSV).

sRGB conversions mirror the reference (``nerf/utils.py:42-49``). The HSV conversions
replace the reference CUDA kernels (``palette/src/palette.cu:46-133``) with pure-``jnp``
formulations; conventions match: H in degrees [0, 360), S and V in **percent** [0, 100].
All are jit/vmap/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-8), 0.41666) - 0.055)


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x < 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def rgb_to_hsv(rgb):
    """rgb [..., 3] in [0,1] -> hsv [..., 3], H in deg [0,360), S,V in [0,100]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    diff = cmax - cmin
    safe = jnp.where(diff == 0, 1.0, diff)

    h_r = jnp.mod(60.0 * ((g - b) / safe) + 360.0, 360.0)
    h_g = jnp.mod(60.0 * ((b - r) / safe) + 120.0 + 360.0, 360.0)
    h_b = jnp.mod(60.0 * ((r - g) / safe) + 240.0 + 360.0, 360.0)

    h = jnp.where(diff == 0, 0.0, jnp.where(cmax == r, h_r, jnp.where(cmax == g, h_g, h_b)))
    s = jnp.where(cmax == 0, 0.0, diff / jnp.where(cmax == 0, 1.0, cmax) * 100.0)
    v = cmax * 100.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """hsv [..., 3] (H deg, S,V percent) -> rgb [..., 3] in [0,1]."""
    r, g, b = hsv_to_rgb_planar(hsv[..., 0], hsv[..., 1], hsv[..., 2])
    return jnp.stack([r, g, b], axis=-1)


# ---- planar (structure-of-arrays) variants -----------------------------------
# TPU tiling pads the minor dimension to 128 lanes, so elementwise math on
# [..., 3]-shaped stacks can run up to ~40x below VPU speed when materialized.
# The hot render paths (render/sweep.py) therefore convert color per-CHANNEL on
# well-tiled 2D planes. Same math and conventions as the stacked versions.

def rgb_to_hsv_planar(r, g, b):
    cmax = jnp.maximum(jnp.maximum(r, g), b)
    cmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = cmax - cmin
    safe = jnp.where(diff == 0, 1.0, diff)

    h_r = jnp.mod(60.0 * ((g - b) / safe) + 360.0, 360.0)
    h_g = jnp.mod(60.0 * ((b - r) / safe) + 120.0 + 360.0, 360.0)
    h_b = jnp.mod(60.0 * ((r - g) / safe) + 240.0 + 360.0, 360.0)
    h = jnp.where(diff == 0, 0.0, jnp.where(cmax == r, h_r, jnp.where(cmax == g, h_g, h_b)))
    s = jnp.where(cmax == 0, 0.0, diff / jnp.where(cmax == 0, 1.0, cmax) * 100.0)
    v = cmax * 100.0
    return h, s, v


def hsv_to_rgb_planar(h, s, v):
    s = s / 100.0
    v = v / 100.0
    h = jnp.mod(h, 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return r, g, b
