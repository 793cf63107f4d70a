"""Pallas TPU kernel: fused volume-rendering compositing.

Fuses what the XLA path (ops/composite.py) expresses as alpha -> exclusive-cumprod ->
weight -> three reductions into ONE VMEM pass per ray block: the transmittance scan runs
as a log-step inclusive product over the sample (lane) axis via ``pltpu.roll``, and the
weighted reductions for (weights_sum, depth, rgb) happen in-register. This removes the
HBM round-trips between the cumprod and each einsum of the XLA formulation.

Numerically identical to ops.composite.composite_rays (same break-after-accumulate
T_thresh semantics); the XLA path remains the golden reference and the autodiff path
(training uses the XLA compositor — this kernel is forward-only for eval).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_N = 256  # rays per program


def _composite_kernel(sig_ref, dt_ref, mask_ref, r_ref, g_ref, b_ref, tcum_ref,
                      ws_ref, depth_ref, img_ref, *, s: int, t_thresh: float):
    sig = jnp.where(mask_ref[:], sig_ref[:], 0.0)
    alpha = 1.0 - jnp.exp(-sig * dt_ref[:])
    one_m = 1.0 - alpha

    # inclusive cumprod along the lane (sample) axis, log-step scan
    lane = jax.lax.broadcasted_iota(jnp.int32, one_m.shape, 1)
    prod = one_m
    shift = 1
    while shift < s:
        rolled = pltpu.roll(prod, shift, 1)
        prod = prod * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2

    # exclusive (entering) transmittance = inclusive shifted right by one
    t_enter = jnp.where(lane >= 1, pltpu.roll(prod, 1, 1), 1.0)
    include = (t_enter >= t_thresh).astype(jnp.float32)
    w = alpha * t_enter * include * mask_ref[:].astype(jnp.float32)

    ws_ref[:] = jnp.sum(w, axis=1, keepdims=True)
    depth_ref[:] = jnp.sum(w * tcum_ref[:], axis=1, keepdims=True)
    img_ref[:, 0:1] = jnp.sum(w * r_ref[:], axis=1, keepdims=True)
    img_ref[:, 1:2] = jnp.sum(w * g_ref[:], axis=1, keepdims=True)
    img_ref[:, 2:3] = jnp.sum(w * b_ref[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("t_thresh", "interpret"))
def composite_rays_pallas(sigmas, rgbs, dts, t_cum, mask, t_thresh: float = 1e-4,
                          interpret: bool = False):
    """Drop-in forward replacement for ops.composite.composite_rays.

    sigmas/dts/t_cum/mask: [N, S]; rgbs: [N, S, 3]. Returns (ws [N], depth [N],
    image [N, 3]). N is padded to a block multiple internally. ``interpret=True``
    runs the kernel in the Pallas interpreter (for CPU tests).
    """
    n, s = sigmas.shape
    pad = (-n) % _BLOCK_N
    if pad:
        zf = lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        sigmas, dts, t_cum = zf(sigmas), zf(dts), zf(t_cum)
        mask = jnp.concatenate([mask, jnp.zeros((pad, s), mask.dtype)], 0)
        rgbs = zf(rgbs)
    np_ = sigmas.shape[0]

    grid = (np_ // _BLOCK_N,)
    row_spec = pl.BlockSpec((_BLOCK_N, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_col = pl.BlockSpec((_BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_rgb = pl.BlockSpec((_BLOCK_N, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)

    ws, depth, img = pl.pallas_call(
        functools.partial(_composite_kernel, s=s, t_thresh=t_thresh),
        grid=grid,
        interpret=interpret,
        in_specs=[row_spec] * 7,
        out_specs=(out_col, out_col, out_rgb),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 3), jnp.float32),
        ),
    )(sigmas.astype(jnp.float32), dts.astype(jnp.float32), mask,
      rgbs[..., 0].astype(jnp.float32), rgbs[..., 1].astype(jnp.float32),
      rgbs[..., 2].astype(jnp.float32), t_cum.astype(jnp.float32))
    return ws[:n, 0], depth[:n, 0], img[:n]
