"""Prove-or-remove timing for the fused Pallas compositor (round-3 verdict #5).

Times ops.composite.composite_rays (XLA) vs ops.pallas_composite.composite_rays_pallas
standalone at eval shapes, and render_nerf_eval end-to-end with the flag on/off.
Run on the attached chip:  python scripts/bench_pallas_composite.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from palettenerf_tpu.utils.jax_setup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp


def sync(x):
    return float(np.asarray(x).ravel()[0])


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from palettenerf_tpu.ops.composite import composite_rays
    from palettenerf_tpu.ops.pallas_composite import composite_rays_pallas

    key = jax.random.PRNGKey(0)
    for N, S in [(16384, 192), (16384, 64), (65536, 192)]:
        ks = jax.random.split(key, 5)
        sig = jax.random.uniform(ks[0], (N, S), maxval=30.0)
        rgb = jax.random.uniform(ks[1], (N, S, 3))
        dts = jnp.full((N, S), 2.0 / S)
        t_cum = jnp.cumsum(dts, axis=1)
        mask = jax.random.uniform(ks[2], (N, S)) < 0.4

        xla = jax.jit(lambda a, b, c, d, e: composite_rays(a, b, c, d, e,
                                                           t_thresh=1e-2))
        plk = jax.jit(lambda a, b, c, d, e: composite_rays_pallas(
            a, b, c, d, e, t_thresh=1e-2))
        ms_x = time_fn(xla, sig, rgb, dts, t_cum, mask)
        ms_p = time_fn(plk, sig, rgb, dts, t_cum, mask)
        # parity check while we're here
        ox, op_ = xla(sig, rgb, dts, t_cum, mask), plk(sig, rgb, dts, t_cum, mask)
        err = max(float(jnp.abs(a - b).max()) for a, b in zip(ox, op_))
        print(f"[{N}x{S}] XLA {ms_x:.2f} ms | Pallas {ms_p:.2f} ms | "
              f"max_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
