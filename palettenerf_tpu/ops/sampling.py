"""Hierarchical importance sampling (``sample_pdf``) + uniform z sampling.

Port of the classic NeRF inverse-CDF sampler used by the reference's pure-PyTorch render
path (``nerf/renderer.py:12-46``): weights -> pdf -> cdf -> inverse transform with
piecewise-linear interpolation. Fully vectorized jnp (searchsorted is vmapped)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """bins [B,T] (z-values), weights [B,T-1] -> new z samples [B,n_samples]."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B,T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, -1)
    cdf_hi = jnp.take_along_axis(cdf, above, -1)
    bin_lo = jnp.take_along_axis(bins, below, -1)
    bin_hi = jnp.take_along_axis(bins, above, -1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)
