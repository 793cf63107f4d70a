"""Morton (Z-order) 3D encode/decode in pure ``jnp`` bit ops.

Parity port of ``raymarching/src/raymarching.cu:59-84`` (__expand_bits/__morton3D/
__morton3D_invert). The TPU occupancy grid uses *linear* cell layout (Morton order only
helps CUDA memory coalescing), but these utilities are kept as part of the public op
surface (``raymarching.morton3D`` / ``morton3D_invert`` in the reference API).
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords: [..., 3] int in [0, 1024); returns [...] uint32 Z-order index."""
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << 1) | (z << 2)


def _compact_bits(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices):
    """indices: [...] uint32; returns [..., 3] int32 coords."""
    i = indices.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(i >> 0), _compact_bits(i >> 1), _compact_bits(i >> 2)],
        axis=-1,
    ).astype(jnp.int32)
