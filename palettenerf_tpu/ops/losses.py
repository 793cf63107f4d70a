"""Loss functions: MAPE, Huber, and the O(N) efficient distortion loss.

Ports of the reference ``loss.py``:
- ``mape_loss`` (loss.py:7-16): |pred-target| / (|target| + 1e-2).
- ``huber_loss`` (loss.py:18-26): quadratic below delta, linear above.
- ``eff_dist_loss`` (loss.py:30-77, after torch_efficient_distloss): the mip-NeRF-360
  distortion regularizer in O(N) via prefix sums. Pure jnp — XLA's autodiff reproduces
  the hand-written backward of the reference exactly (it's just cumsum transposes).
"""

from __future__ import annotations

import jax.numpy as jnp


def mape_loss(pred, target, reduction: str = "mean"):
    loss = jnp.abs(pred - target) / (jnp.abs(target) + 1e-2)
    return loss.mean() if reduction == "mean" else loss


def huber_loss(pred, target, delta: float = 0.1, reduction: str = "mean"):
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    return loss.mean() if reduction == "mean" else loss


def eff_dist_loss(w, m, interval):
    """Distortion loss: w [B,N] rendering weights, m [B,N] sample midpoints,
    interval scalar or [B,N]. Returns scalar (normalized by ray count)."""
    n_rays = w.shape[0] if w.ndim > 1 else 1
    wm = w * m
    w_cs = jnp.cumsum(w, -1)
    wm_cs = jnp.cumsum(wm, -1)
    w_prefix = jnp.concatenate([jnp.zeros_like(w_cs[..., :1]), w_cs[..., :-1]], -1)
    wm_prefix = jnp.concatenate([jnp.zeros_like(wm_cs[..., :1]), wm_cs[..., :-1]], -1)
    loss_uni = (1.0 / 3.0) * interval * w ** 2
    loss_bi = 2.0 * w * (m * w_prefix - wm_prefix)
    return (loss_bi.sum() + loss_uni.sum()) / n_rays
