"""Hierarchical-march speedup on an LLFF/mip360-style profile (verdict #3 'Done').

The round-4 generalized 2-phase march lifts the dt_gamma==0 && cascade==1 gate.
This measures march_rays flat vs hierarchical at the adaptive-stepping shapes
the LLFF configs use (dt_gamma=1/128, cascade=3, bound=4, K=1024), plus the
bounded Blender profile for reference. Run on the attached chip.
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

from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
from palettenerf_tpu.ops.occupancy import packbits
from palettenerf_tpu.ops.rays import near_far_from_aabb


def sync(x):
    return float(np.asarray(x).ravel()[0])


def run(bound, cascade, dt_gamma, K=1024, S=64, N=4096, G=128, groups=64):
    rng = np.random.default_rng(0)
    # occupied shell + scattered far-field blobs across cascades
    r = (2 * (np.arange(G) + 0.5) / G - 1)
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    occ0 = ((X ** 2 + Y ** 2 + Z ** 2) < 0.5) & ((X ** 2 + Y ** 2 + Z ** 2) > 0.2)
    occs = [occ0]
    for c in range(1, cascade):
        oc = np.zeros((G, G, G), bool)
        idx = rng.integers(0, G, (2000, 3))
        oc[idx[:, 0], idx[:, 1], idx[:, 2]] = True
        occs.append(oc)
    occ = np.stack(occs).reshape(-1)
    bitfield = packbits(jnp.asarray(occ.astype(np.uint8)))
    sup = build_super_bitfield(bitfield, G, cascade)

    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.asarray([[0.0, 0.0, -0.9 * bound]]), (N, 1))
    rays_o, rays_d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)

    def march(use_sup: bool):
        return jax.jit(lambda ro, rd, nr, fr: march_rays(
            ro, rd, nr, fr, bitfield, bound, cascade, G, dt_gamma, K, S,
            sup_bitfield=sup if use_sup else None,
            max_groups=groups if use_sup else 0))

    out = {}
    for name, fn in [("flat", march(False)), ("hier", march(True))]:
        m = fn(rays_o, rays_d, nears, fars)
        sync(m.ts)
        t0 = time.perf_counter()
        for _ in range(20):
            m = fn(rays_o, rays_d, nears, fars)
        sync(m.ts)
        out[name] = (time.perf_counter() - t0) / 20 * 1000
    mf = march(False)(rays_o, rays_d, nears, fars)
    mh = march(True)(rays_o, rays_d, nears, fars)
    agree = float(jnp.mean((jnp.abs(mf.ts - mh.ts) < 1e-5)
                           & (mf.mask == mh.mask)))
    print(f"bound={bound} cascade={cascade} dt_gamma={dt_gamma:.5f} K={K}: "
          f"flat {out['flat']:.1f} ms | hier {out['hier']:.1f} ms "
          f"({out['flat']/out['hier']:.2f}x) | slot agreement {agree:.4f}",
          flush=True)


if __name__ == "__main__":
    run(bound=1.0, cascade=1, dt_gamma=0.0, K=512)            # Blender profile
    run(bound=4.0, cascade=3, dt_gamma=1 / 128, K=1024)       # LLFF profile
    run(bound=8.0, cascade=4, dt_gamma=1 / 64, K=1024)        # mip360 profile
