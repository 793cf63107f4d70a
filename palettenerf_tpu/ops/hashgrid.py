"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Re-implements the reference CUDA gridencoder (``gridencoder/src/gridencoder.cu``,
``gridencoder/grid.py``) as a pure-functional JAX op. Construction rules are parity-exact
with ``grid.py:92-133``:

- ``per_level_scale = exp2(log2(desired_resolution / base) / (num_levels - 1))``
- level scale ``s_l = base * pls**l - 1``; resolution ``r_l = ceil(s_l) + 1``
- params/level = ``min(2**log2_hashmap_size, (r_l + 1 if not align_corners else r_l)**D)``
  rounded up to a multiple of 8; one flat ``[total, C]`` table with per-level offsets.

Indexing matches ``gridencoder.cu:36-72``: dense stride indexing while the stride fits in
the level's hashmap, otherwise the xor/prime ``fast_hash`` with uint32 wraparound, then
``% hashmap_size``. Interpolation is D-linear on ``pos = x*s_l + 0.5`` (align_corners
False). Out-of-[0,1] inputs produce zeros (``gridencoder.cu:97-122``).

The forward/backward here is plain XLA gather / scatter-add (exact autodiff). A fused
Pallas kernel for the hot path lives in ``ops/pallas/`` once profiled; this module is the
golden reference for it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)  # gridencoder.cu:42


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a hash-grid encoder (hashable; safe to close over jit)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    gridtype: str = "hash"  # "hash" | "tiled" | "hash_xadd"
    align_corners: bool = False
    # derived (filled by build())
    offsets: Tuple[int, ...] = ()
    resolutions: Tuple[int, ...] = ()

    @classmethod
    def build(
        cls,
        input_dim: int = 3,
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        log2_hashmap_size: int = 19,
        desired_resolution: float | None = 2048,
        per_level_scale: float = 2.0,
        gridtype: str = "hash",
        align_corners: bool = False,
    ) -> "HashGridSpec":
        if desired_resolution is not None:
            per_level_scale = float(
                2.0 ** (math.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        max_params = 2 ** log2_hashmap_size
        offsets = [0]
        resolutions = []
        off = 0
        for lvl in range(num_levels):
            res = int(math.ceil(base_resolution * per_level_scale ** lvl))
            resolutions.append(res)
            side = res if align_corners else res + 1
            params_in_level = min(max_params, side ** input_dim)
            params_in_level = int(math.ceil(params_in_level / 8) * 8)
            off += params_in_level
            offsets.append(off)
        return cls(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            per_level_scale=per_level_scale,
            gridtype=gridtype,
            align_corners=align_corners,
            offsets=tuple(offsets),
            resolutions=tuple(resolutions),
        )

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    def level_scale(self, lvl: int) -> float:
        # gridencoder.cu:125 — scale = exp2(level * log2(pls)) * H - 1
        return self.base_resolution * self.per_level_scale ** lvl - 1.0


def init_hashgrid(key, spec: HashGridSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) table init (grid.py:131-133)."""
    return jax.random.uniform(
        key, (spec.total_params, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_index(spec: HashGridSpec, lvl: int, pg):
    """Flat table index for integer grid coords pg [..., D] at level ``lvl``.

    Follows get_grid_index (gridencoder.cu:55-72): accumulate stride-indexed sum while the
    running stride fits in hashmap_size; hash levels replace it with fast_hash.
    """
    D = spec.input_dim
    hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
    res = spec.resolutions[lvl]
    side = res if spec.align_corners else res + 1

    pg = pg.astype(jnp.uint32)
    stride = 1
    index = jnp.zeros(pg.shape[:-1], jnp.uint32)
    overflow = False
    for d in range(D):
        if stride <= hashmap_size:
            index = index + pg[..., d] * jnp.uint32(stride)
            stride *= side
        if stride > hashmap_size:
            overflow = True
    if overflow and spec.gridtype == "hash":
        index = jnp.zeros(pg.shape[:-1], jnp.uint32)
        for d in range(D):
            index = index ^ (pg[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
    elif overflow and spec.gridtype == "hash_xadd":
        # TPU-local hash: x enters ADDITIVELY so corner (x+1, y, z) always lives at
        # index+1 (mod size). This x-adjacency lets the fast path fetch both x-corners
        # of an interpolation cell as ONE wide row from an overlapped pair table
        # (ops/hashgrid_fast.py), halving gather rows. y/z still mix through the
        # reference primes (gridencoder.cu:42), so collisions stay pseudo-random
        # except along x, where they are deliberately chained.
        mix = jnp.zeros(pg.shape[:-1], jnp.uint32)
        for d in range(1, D):
            mix = mix ^ (pg[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        index = pg[..., 0] + mix
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


def hashgrid_encode(table, x01, spec: HashGridSpec):
    """Encode positions.

    Args:
      table: [total_params, C] parameter table.
      x01:   [..., D] positions pre-normalized to [0, 1] (the caller maps from
             [-bound, bound]; grid.py:142).
    Returns: [..., L*C] features (level-major per point, matching grid.py:52).
    """
    D = spec.input_dim
    C = spec.level_dim
    lead = x01.shape[:-1]
    x = x01.reshape(-1, D).astype(jnp.float32)
    M = x.shape[0]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # gridencoder.cu:97-105

    outs = []
    for lvl in range(spec.num_levels):
        scale = spec.level_scale(lvl)
        pos = x * scale + (0.0 if spec.align_corners else 0.5)
        pg0 = jnp.floor(pos)
        frac = pos - pg0
        pg0 = pg0.astype(jnp.int32)

        level_table = jax.lax.dynamic_slice_in_dim(
            table, spec.offsets[lvl], spec.offsets[lvl + 1] - spec.offsets[lvl], axis=0
        )

        acc = jnp.zeros((M, C), table.dtype)
        for corner in range(2 ** D):
            bits = [(corner >> d) & 1 for d in range(D)]
            pg = pg0 + jnp.array(bits, jnp.int32)
            w = jnp.ones((M,), jnp.float32)
            for d in range(D):
                w = w * (frac[:, d] if bits[d] else 1.0 - frac[:, d])
            idx = _corner_index(spec, lvl, pg)
            acc = acc + level_table[idx] * w[:, None].astype(table.dtype)
        outs.append(acc)

    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob[:, None], 0.0, out)
    return out.reshape(*lead, spec.output_dim)


def hashgrid_encode_bounded(table, x, spec: HashGridSpec, bound: float):
    """Encode world positions in [-bound, bound] (grid.py:138-150)."""
    return hashgrid_encode(table, (x + bound) / (2.0 * bound), spec)
