"""Instant-NGP NeRF network (stage 1), functional JAX.

Capability-parity rebuild of the reference ``nerf/network.py`` (NeRFNetwork):
- hash encoder (16 levels x 2 feats, desired resolution 2048*bound) -> 2-layer bias-free
  sigma MLP (64 hidden) -> [sigma(trunc_exp), 15-dim geo feature]   (network.py:27-47)
- SH degree-4 direction encoder -> 3-layer bias-free color MLP -> sigmoid rgb (:49-68)
- optional background net on a 2D hash encoding of sphere coords when bg_radius > 0
  (:70-92)

Parameters are a dict pytree with reference-compatible names (``encoder``, ``sigma_net``,
``color_net``, ``encoder_bg``, ``bg_net``) so the palette stage warm-start maps 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashgrid import HashGridSpec, init_hashgrid
from ..ops.hashgrid_fast import (
    EncodeRand,
    hashgrid_encode_fast,
    hashgrid_encode_fast_bounded as hashgrid_encode_bounded,
    make_encode_rand,
)
from ..ops.sh import sh_encode
from .mlp import apply_mlp, init_mlp


@dataclass(frozen=True)
class NeRFSpec:
    """Static model hyperparameters (hashable; closed over by jit)."""

    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    fp16: bool = False  # bf16 hash-table compute (AMP analog; halves the scatter matmul)
    fast_grad: bool = False  # nearest-corner hash backward (8x fewer scatter updates)
    stochastic_trilerp: bool = False  # train-only 1-corner MC trilerp (8x fewer gathers)
    grad_levels: int = 0  # backward-only level subsampling (0 = all levels)
    grid: HashGridSpec = None  # type: ignore[assignment]
    grid_bg: Optional[HashGridSpec] = None

    @classmethod
    def build(cls, bound: float = 1.0, bg_radius: float = -1.0,
              log2_hashmap_size: int = 19, grid_levels: int = 16,
              grid_level_dim: int = 2, gridtype: str = "hash", **kw) -> "NeRFSpec":
        grid = HashGridSpec.build(
            desired_resolution=2048 * bound, num_levels=grid_levels,
            level_dim=grid_level_dim, log2_hashmap_size=log2_hashmap_size,
            gridtype=gridtype,
        )
        grid_bg = (
            HashGridSpec.build(input_dim=2, num_levels=4, desired_resolution=2048)
            if bg_radius > 0
            else None
        )
        return cls(bound=bound, bg_radius=bg_radius, grid=grid, grid_bg=grid_bg, **kw)

    @property
    def sh_dim(self) -> int:
        return self.sh_degree ** 2

    @property
    def scatter_dtype(self):
        # bf16 gradient accumulation under --fp16 (reference fp16 atomicAdd analog);
        # forward gathers stay f32 (bf16 [rows,2] outputs tile-pad 64x in HBM)
        return jnp.bfloat16 if self.fp16 else None


def _mlp_dims(in_dim, hidden, out_dim, num_layers):
    return [in_dim] + [hidden] * (num_layers - 1) + [out_dim]


def init_nerf(key, spec: NeRFSpec, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    params = {
        "encoder": init_hashgrid(ks[0], spec.grid, dtype),
        "sigma_net": init_mlp(
            ks[1],
            _mlp_dims(spec.grid.output_dim, spec.hidden_dim, 1 + spec.geo_feat_dim, spec.num_layers),
            bias=False,
            dtype=dtype,
        ),
        "color_net": init_mlp(
            ks[2],
            _mlp_dims(spec.sh_dim + spec.geo_feat_dim, spec.hidden_dim_color, 3, spec.num_layers_color),
            bias=False,
            dtype=dtype,
        ),
    }
    if spec.bg_radius > 0:
        kb = jax.random.split(ks[3], 2)
        params["encoder_bg"] = init_hashgrid(kb[0], spec.grid_bg, dtype)
        params["bg_net"] = init_mlp(
            kb[1],
            _mlp_dims(spec.grid_bg.output_dim + spec.sh_dim, spec.hidden_dim_bg, 3, spec.num_layers_bg),
            bias=False,
            dtype=dtype,
        )
    return params


def encode_rand_for(key, spec: NeRFSpec, n_samples: int) -> Optional[EncodeRand]:
    """Per-step encode randomness (corner lottery + backward level subset), or None
    when the spec's training profile doesn't use any."""
    if key is None or not (spec.stochastic_trilerp or spec.grad_levels):
        return None
    return make_encode_rand(key, n_samples, spec.grid, spec.grad_levels)


def nerf_density(params, spec: NeRFSpec, x, training: bool = False, rand=None):
    """x [..., 3] in [-bound, bound] -> dict(sigma [...], geo_feat [..., 15]).
    ``training`` enables the train-only stochastic trilerp (if configured) —
    eval always interpolates exactly."""
    h = hashgrid_encode_bounded(params["encoder"], x, spec.grid, spec.bound,
                                scatter_dtype=spec.scatter_dtype,
                                nearest_corner_grad=spec.fast_grad,
                                stochastic=training and spec.stochastic_trilerp,
                                rand=rand if training else None,
                                grad_levels=spec.grad_levels if training else 0)
    h = apply_mlp(params["sigma_net"], h)
    sigma = trunc_exp(h[..., 0])
    return {"sigma": sigma, "geo_feat": h[..., 1:]}


def nerf_color(params, spec: NeRFSpec, d, geo_feat):
    """d [..., 3] unit dirs; geo_feat [..., 15] -> rgb [..., 3] (sigmoid)."""
    de = sh_encode(d, spec.sh_degree)
    h = jnp.concatenate([de, geo_feat], axis=-1)
    return apply_mlp(params["color_net"], h, final_activation=jax.nn.sigmoid)


def nerf_forward(params, spec: NeRFSpec, x, d, training: bool = False, rand=None):
    dens = nerf_density(params, spec, x, training=training, rand=rand)
    rgb = nerf_color(params, spec, d, dens["geo_feat"])
    return dens["sigma"], rgb


def nerf_background(params, spec: NeRFSpec, sph, d):
    """sph [..., 2] in [-1,1]; d dirs -> rgb [..., 3] (network.py:145-160)."""
    h = hashgrid_encode_fast(params["encoder_bg"], (sph + 1.0) * 0.5, None, spec.grid_bg)
    de = sh_encode(d, spec.sh_degree)
    h = jnp.concatenate([de, h], axis=-1)
    return apply_mlp(params["bg_net"], h, final_activation=jax.nn.sigmoid)
