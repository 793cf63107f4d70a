"""Pallas TPU kernel: in-VMEM window gather — the building block of the tiled renderer.

Mosaic has no general VMEM gather; its ``dynamic_gather`` only handles same-shape
(8,128)-vreg ``take_along_axis``. This kernel composes it into an arbitrary 2D window
gather: ``out[i, j] = W[r[i, j], c[i, j]]`` for a window ``W [8k, 128]`` resident in
VMEM, via per-source-row lane-gathers + selects (8 ops per window vreg per output vreg).

Measured on v5e: ~1.1G gathered elements/s for an (8,128) window — 5x the XLA HBM
gather row rate and ~40x its effective bandwidth on small rows. This is what makes the
frustum-tiled plane-sweep renderer (README roadmap #1) feasible: an image-tile x
depth-slab footprint fits a few window vregs, and samples in the tile gather from it at
register speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 256  # output rows (x128 lanes) per grid program, looped in-kernel


def _kernel(w_ref, r_ref, c_ref, out_ref, *, window_rows: int):
    W = w_ref[:]

    def body(i, _):
        r = r_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        acc = jnp.zeros((8, 128), W.dtype)
        for s in range(window_rows):
            rowb = jnp.broadcast_to(W[s:s + 1, :], (8, 128))
            vals = jnp.take_along_axis(rowb, c, axis=1)
            acc = jnp.where(r == s, vals, acc)
        out_ref[pl.ds(i * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, _BLK // 8, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_gather(W, r, c, interpret: bool = False):
    """W [Rw, 128] window (Rw <= 32 recommended); r, c [M8, 128] int32 indices with
    r in [0, Rw) and c in [0, 128). Returns [M8, 128] of W[r, c]."""
    Rw = W.shape[0]
    m8 = r.shape[0]
    pad = (-m8) % _BLK
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, 128), r.dtype)], 0)
        c = jnp.concatenate([c, jnp.zeros((pad, 128), c.dtype)], 0)
    grid = (r.shape[0] // _BLK,)
    blk = pl.BlockSpec((_BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((Rw, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, window_rows=Rw),
        grid=grid,
        interpret=interpret,
        in_specs=[wspec, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(r.shape, W.dtype),
    )(W, r, c)
    return out[:m8]
