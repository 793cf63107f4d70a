"""PaletteNeRF network (stage 3), functional JAX.

Capability-parity rebuild of the reference ``palette/network.py`` (PaletteNetwork):
- THREE hash encoders: ``encoder`` (sigma), ``encoder_palette``, ``encoder_clip``
  (network.py:31-33), all at desired resolution 2048*bound.
- ``sigma_net`` identical to the NeRF's (so stage-1 weights transfer, :37-52) and
  ``color_net`` named/shaped to inherit the NeRF color net as the view-dependent head
  (:58-74).
- ``diff_net``: diffuse rgb from *detached* geo features (:76-91).
- ``basis_net``: palette-geo features from encoder_palette ⊕ detached diffuse, ELU
  activations (:93-108).
- heads: ``offsets_radiance_net`` Linear(15 -> 3P+1, with bias) and ``omega_net``
  Linear(15 -> P, no bias) + Softplus, +0.05, normalized to sum 1 (:110-112, :265-267).
- optional ``clip_net`` from encoder_clip when pred_clip (:114-129).
- background net identical to NeRF's (:131-153).

Gradient-stopping matches the reference exactly: geo_feat is detached before all palette
heads (network.py:168), diffuse is detached before basis_net (:258), and sigma is
detached in the palette renderer.

Palette state (``basis_color`` [P,3] trainable, frozen ``basis_color_origin``, frozen
``hist_weights`` [32,32,32,P]) lives in the params tree, initialized by
``initialize_palette`` (palette/renderer.py:248-268).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashgrid import HashGridSpec, init_hashgrid
from ..ops.hashgrid_fast import (
    hashgrid_encode_fast,
    hashgrid_encode_fast_bounded as hashgrid_encode_bounded,
)
from ..ops.sh import sh_encode
from ..utils.color import srgb_to_linear
from .mlp import apply_mlp, init_mlp
from .nerf import NeRFSpec


@dataclass(frozen=True)
class PaletteSpec:
    bound: float = 1.0
    num_basis: int = 4
    clip_dim: int = 16
    pred_clip: bool = False
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    color_space: str = "srgb"
    smooth_sigma_xyz: float = 0.005
    smooth_sigma_color: float = 0.2
    smooth_sigma_clip: float = 0.0
    grid: HashGridSpec = None  # type: ignore[assignment]
    grid_bg: Optional[HashGridSpec] = None

    fp16: bool = False
    fast_grad: bool = False
    stochastic_trilerp: bool = False  # train-only 1-corner MC trilerp
    grad_levels: int = 0  # backward-only level subsampling (0 = all levels)

    @classmethod
    def build(cls, bound: float = 1.0, bg_radius: float = -1.0, num_basis: int = 4,
              pred_clip: bool = False, clip_dim: int = 16, color_space: str = "srgb",
              log2_hashmap_size: int = 19, grid_levels: int = 16,
              grid_level_dim: int = 2, gridtype: str = "hash", **kw) -> "PaletteSpec":
        grid = HashGridSpec.build(
            desired_resolution=2048 * bound, num_levels=grid_levels,
            level_dim=grid_level_dim, log2_hashmap_size=log2_hashmap_size,
            gridtype=gridtype,
        )
        grid_bg = (
            HashGridSpec.build(input_dim=2, num_levels=4, desired_resolution=2048)
            if bg_radius > 0 else None
        )
        return cls(bound=bound, bg_radius=bg_radius, num_basis=num_basis,
                   pred_clip=pred_clip, clip_dim=clip_dim, color_space=color_space,
                   grid=grid, grid_bg=grid_bg, **kw)

    @property
    def scatter_dtype(self):
        return jnp.bfloat16 if self.fp16 else None

    @property
    def sh_dim(self) -> int:
        return self.sh_degree ** 2

    def nerf_spec(self) -> NeRFSpec:
        """The matching stage-1 spec (for warm-start shape checks)."""
        return NeRFSpec(
            bound=self.bound, num_layers=self.num_layers, hidden_dim=self.hidden_dim,
            geo_feat_dim=self.geo_feat_dim, num_layers_color=self.num_layers_color,
            hidden_dim_color=self.hidden_dim_color, num_layers_bg=self.num_layers_bg,
            hidden_dim_bg=self.hidden_dim_bg, sh_degree=self.sh_degree,
            bg_radius=self.bg_radius, grid=self.grid, grid_bg=self.grid_bg,
        )


def _dims(in_dim, hidden, out_dim, n):
    return [in_dim] + [hidden] * (n - 1) + [out_dim]


def init_palette(key, spec: PaletteSpec, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    P = spec.num_basis
    params = {
        "encoder": init_hashgrid(ks[0], spec.grid, dtype),
        "encoder_palette": init_hashgrid(ks[1], spec.grid, dtype),
        "encoder_clip": init_hashgrid(ks[2], spec.grid, dtype),
        "sigma_net": init_mlp(
            ks[3], _dims(spec.grid.output_dim, spec.hidden_dim, 1 + spec.geo_feat_dim, spec.num_layers),
            bias=False, dtype=dtype),
        "color_net": init_mlp(
            ks[4], _dims(spec.sh_dim + spec.geo_feat_dim, spec.hidden_dim_color, 3, spec.num_layers_color),
            bias=False, dtype=dtype),
        "diff_net": init_mlp(
            ks[5], _dims(spec.geo_feat_dim, spec.hidden_dim_color, 3, spec.num_layers_color),
            bias=False, dtype=dtype),
        "basis_net": init_mlp(
            ks[6], _dims(spec.grid.output_dim + 3, spec.hidden_dim, spec.geo_feat_dim, spec.num_layers),
            bias=False, dtype=dtype),
        "offsets_radiance_net": init_mlp(
            ks[7], [spec.geo_feat_dim, P * 3 + 1], bias=True, dtype=dtype),
        "omega_net": init_mlp(ks[8], [spec.geo_feat_dim, P], bias=False, dtype=dtype),
        # palette state; re-initialized by initialize_palette (renderer.py:248-268)
        "basis_color": jnp.full((P, 3), 0.5, dtype),
        "basis_color_origin": jnp.full((P, 3), 0.5, dtype),
    }
    if spec.pred_clip:
        params["clip_net"] = init_mlp(
            ks[9], _dims(spec.grid.output_dim, spec.hidden_dim, spec.clip_dim, spec.num_layers),
            bias=False, dtype=dtype)
    if spec.bg_radius > 0:
        kb = jax.random.split(ks[9], 3)
        params["encoder_bg"] = init_hashgrid(kb[0], spec.grid_bg, dtype)
        params["bg_net"] = init_mlp(
            kb[1], _dims(spec.grid_bg.output_dim + spec.sh_dim, spec.hidden_dim_bg, 3, spec.num_layers_bg),
            bias=False, dtype=dtype)
    return params


def initialize_palette(params, spec: PaletteSpec, color_list=None, hist_weights=None):
    """Set basis colors (+frozen origin) and optional hist-weight volume
    (palette/renderer.py:248-268). Returns updated params."""
    import numpy as np

    params = dict(params)
    if color_list is not None:
        bc = jnp.asarray(np.asarray(color_list, np.float32))
        if spec.color_space == "linear":
            bc = srgb_to_linear(bc)
        params["basis_color"] = bc
        params["basis_color_origin"] = jnp.array(bc)
    if hist_weights is not None:
        params["hist_weights"] = jnp.asarray(np.asarray(hist_weights, np.float32))
    return params


def palette_density(params, spec: PaletteSpec, x, training: bool = False, rand=None):
    h = hashgrid_encode_bounded(params["encoder"], x, spec.grid, spec.bound,
                                scatter_dtype=spec.scatter_dtype,
                                nearest_corner_grad=spec.fast_grad,
                                stochastic=training and spec.stochastic_trilerp,
                                rand=rand if training else None,
                                grad_levels=spec.grad_levels if training else 0)
    h = apply_mlp(params["sigma_net"], h)
    sigma = trunc_exp(h[..., 0])
    return {"sigma": sigma, "geo_feat": h[..., 1:]}


def palette_color(params, spec: PaletteSpec, x, d, geo_feat, training: bool = False,
                  rand=None):
    """Palette heads (palette/network.py:223-280).

    Returns (omega [...,P], offsets_radiance [...,3P+1], view_dep [...,3], diffuse [...,3]).
    """
    geo = jax.lax.stop_gradient(geo_feat)

    diffuse = apply_mlp(params["diff_net"], geo, final_activation=jax.nn.sigmoid)

    de = sh_encode(d, spec.sh_degree)
    view_dep = apply_mlp(
        params["color_net"], jnp.concatenate([de, geo], -1), final_activation=jax.nn.sigmoid
    )

    hp = hashgrid_encode_bounded(params["encoder_palette"], x, spec.grid, spec.bound,
                                 scatter_dtype=spec.scatter_dtype,
                                 nearest_corner_grad=spec.fast_grad,
                                 stochastic=training and spec.stochastic_trilerp,
                                 rand=rand if training else None,
                                 grad_levels=spec.grad_levels if training else 0)
    hp = jnp.concatenate([hp, jax.lax.stop_gradient(diffuse)], -1)
    palette_feat = apply_mlp(params["basis_net"], hp, activation=jax.nn.elu)

    offsets_radiance = apply_mlp(params["offsets_radiance_net"], palette_feat)
    omega = jax.nn.softplus(apply_mlp(params["omega_net"], palette_feat)) + 0.05
    omega = omega / omega.sum(-1, keepdims=True)
    return omega, offsets_radiance, view_dep, diffuse


def palette_view_dep(params, spec: PaletteSpec, d, geo_feat):
    """View-dependent color only (color_net on SH(d) + frozen geo feature) — the
    focused query the baker uses to fit per-voxel SH coefficients without
    re-running the density/palette heads per direction (palette/network.py:58-74)."""
    de = sh_encode(d, spec.sh_degree)
    return apply_mlp(
        params["color_net"], jnp.concatenate([de, geo_feat], -1),
        final_activation=jax.nn.sigmoid)


def palette_forward(params, spec: PaletteSpec, x, d, training: bool = False, rand=None):
    """Full per-sample forward (palette/network.py:156-185).

    Returns (sigma, clip_feat, omega, offsets_radiance, view_dep, diffuse); geo_feat is
    detached before the palette heads (:168).
    """
    dens = palette_density(params, spec, x, training=training, rand=rand)
    sigma = dens["sigma"]

    if spec.pred_clip:
        hc = hashgrid_encode_bounded(params["encoder_clip"], x, spec.grid, spec.bound,
                                     scatter_dtype=spec.scatter_dtype,
                                     nearest_corner_grad=spec.fast_grad,
                                     stochastic=training and spec.stochastic_trilerp,
                                     rand=rand if training else None,
                                     grad_levels=spec.grad_levels if training else 0)
        clip_feat = apply_mlp(params["clip_net"], hc)
    else:
        clip_feat = jnp.zeros(x.shape[:-1] + (spec.clip_dim,), sigma.dtype)

    omega, offsets_radiance, view_dep, diffuse = palette_color(
        params, spec, x, d, dens["geo_feat"], training=training, rand=rand
    )
    return sigma, clip_feat, omega, offsets_radiance, view_dep, diffuse


def palette_background(params, spec: PaletteSpec, sph, d):
    h = hashgrid_encode_fast(params["encoder_bg"], (sph + 1.0) * 0.5, None, spec.grid_bg)
    de = sh_encode(d, spec.sh_degree)
    return apply_mlp(params["bg_net"], jnp.concatenate([de, h], -1),
                     final_activation=jax.nn.sigmoid)


def get_palette_weight_with_hist(rgb, hist_weights):
    """Trilinear lookup of gt blending weights at gt colors.

    Replaces ``grid_sample`` (palette/utils.py:117-124): hist_weights [32,32,32,P]
    indexed by (r,g,b)*31 with align_corners=True semantics; rgb [...,3] in [0,1].
    Returns [..., P].
    """
    shape = rgb.shape[:-1]
    g = jnp.clip(rgb.reshape(-1, 3), 0.0, 1.0) * 31.0
    i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, 30)
    f = g - i0
    out = 0.0
    for corner in range(8):
        bits = [(corner >> k) & 1 for k in range(3)]
        idx = [jnp.clip(i0[:, k] + bits[k], 0, 31) for k in range(3)]
        w = 1.0
        for k in range(3):
            w = w * (f[:, k] if bits[k] else 1.0 - f[:, k])
        out = out + hist_weights[idx[0], idx[1], idx[2]] * w[:, None]
    return out.reshape(*shape, hist_weights.shape[-1])
