"""Volume-rendering compositing over the fixed ``[N, S]`` sample axis.

Replaces the reference CUDA compositing kernels
(``raymarching/src/raymarching.cu:504-580`` forward, ``:681-761`` analytic backward, and
the N-channel "flex" variants ``:583-668``/``:764-844``) with a masked associative
formulation: ``alpha = 1 - exp(-sigma*dt)``, transmittance = exclusive cumprod of
``(1 - alpha)``, weights = ``alpha * T``. Early termination (``T < T_thresh`` break,
raymarching.cu:560) becomes a mask ``T_enter >= T_thresh`` — bitwise-identical inclusion
semantics to the sequential break-after-accumulate loop.

Gradients come from XLA autodiff through cumprod, which reproduces the reference's
analytic sigma/rgb gradients (raymarching.cu:736-746) exactly. A fused Pallas kernel can
later combine weight computation + all channel reductions in one VMEM pass; this module
is its golden reference.

A single ``composite_weights`` pass is shared by *all* channel stacks — unlike the
reference, which recomputes transmittance in every composite_rays_flex call
(palette/renderer.py:508-515).
"""

from __future__ import annotations

import jax.numpy as jnp


def composite_weights(sigmas, dts, mask, t_thresh: float):
    """Per-sample compositing weights.

    sigmas/dts/mask: [N, S] (mask False => empty slot). Returns (weights [N,S],
    weights_sum [N], trans_enter [N,S]).
    """
    sig = jnp.where(mask, sigmas, 0.0)
    alpha = 1.0 - jnp.exp(-sig * dts)
    one_m = 1.0 - alpha
    t_inclusive = jnp.cumprod(one_m, axis=-1)
    t_enter = jnp.concatenate(
        [jnp.ones_like(t_inclusive[..., :1]), t_inclusive[..., :-1]], axis=-1
    )
    include = t_enter >= t_thresh  # break-after-accumulate semantics
    w = alpha * t_enter * include * mask
    return w, w.sum(axis=-1), t_enter


def composite_channels(weights, values):
    """weights [N,S] x values [N,S,C] -> [N,C]."""
    return jnp.einsum("ns,nsc->nc", weights, values)


def composite_rays(sigmas, rgbs, dts, t_cum, mask, t_thresh: float):
    """Full train-path composite: returns (weights_sum [N], depth [N], image [N,3]).

    depth = sum_j w_j * (cumulative real delta)_j, matching
    kernel_composite_rays_train_forward (raymarching.cu:552-554).
    """
    w, ws, _ = composite_weights(sigmas, dts, mask, t_thresh)
    depth = (w * t_cum).sum(axis=-1)
    image = composite_channels(w, rgbs)
    return ws, depth, image


def spread_ray_to_sample(per_ray, mask):
    """Broadcast per-ray values onto that ray's sample slots (zero on empty slots).

    Parity op for kernel_spread_ray_to_sample (raymarching.cu:848-894), used by the
    reference to push GT pixel colors to samples for the rgb_norm sparsity term. In the
    fixed [N, S] layout this is a masked broadcast.

    per_ray: [N, C]; mask: [N, S] -> [N, S, C].
    """
    return jnp.where(mask[..., None], per_ray[:, None, :], 0.0)
