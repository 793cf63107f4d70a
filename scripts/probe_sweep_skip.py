"""Skip-mode / unroll matrix for the sweep on the trained bake.

Hypothesis (round-5): per-slice cost is ~160 us even at C=4, far above the
matmul cost — the per-slice/per-block ``lax.cond`` makes every slice's volume
load + matmuls control-dependent on the previous slice's composited
transmittance, serializing the pipeline. On a real scene 78-91% of blocks are
occupied anyway, so the cond buys little skipping and costs the overlap.

Times the plain nerf sweep (C=4) and the vd2 palette-edit sweep across
skip in {block, slice, none} x unroll {1, 4, 8}.

Run on the attached chip:  python scripts/probe_sweep_skip.py
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

T0 = time.perf_counter()


def log(m):
    print(f"[probe3 +{time.perf_counter() - T0:.0f}s] {m}", flush=True)


def main():
    import bench
    from palettenerf_tpu.render.baking import BakedVolume
    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import build_sweep_volume, render_sweep

    loaded = bench.make_sweep_volume_ckpt()
    assert loaded is not None
    sv3, bc = loaded
    log("ckpt baked (vd3)")

    # vd2 channel subset (SH bases nest); free the vd3 buffers
    B3, Bn = 9, 4
    Cbase = sv3.vols[0].shape[2] - 3 * B3
    keep = list(range(Cbase))
    for c in range(3):
        keep += list(range(Cbase + c * B3, Cbase + c * B3 + Bn))
    sv = sv3._replace(vols=tuple(jnp.asarray(v[:, :, keep, :]) for v in sv3.vols),
                      vd_bands=2)
    R = sv.resolution
    dens = jnp.asarray(sv3.vols[0][:, :, 0, :], jnp.float32)
    for v in sv3.vols:
        v.delete()
    del sv3
    svn = build_sweep_volume(
        BakedVolume(R, 1.0, dens, jnp.zeros((R, R, R, 3)) + 0.5, None, None, None))
    dens.delete()
    log("volumes ready (vd2 palette + C=4 nerf)")

    H = W = 800
    P = sv.num_basis
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def fps_of(vol, use_edit, skip, unroll, n=12):
        def frame(i):
            pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4,
                                  -2.0 * np.cos(0.4 * i)))
            return render_sweep(vol, pose, intr, H, W, u_res=448,
                                basis_color=bc if vol.num_basis else None,
                                edit=edit if use_edit else None,
                                skip=skip, unroll=unroll)

        out = frame(0)
        _ = float(out["image"].sum())
        out = frame(7)
        _ = float(out["image"].sum())
        t0 = time.perf_counter()
        for i in range(n):
            out = frame(i + 1)
        _ = float(out["image"][0, 0, 0])
        return n / (time.perf_counter() - t0)

    for name, vol, use_edit in (("nerf C=4", svn, False),
                                ("palette+edit vd2", sv, True)):
        for skip, unroll in (("block", 4), ("block", 8), ("slice", 1),
                             ("none", 4), ("none", 8)):
            f = fps_of(vol, use_edit, skip, unroll)
            log(f"{name:18s} skip={skip:5s} unroll={unroll}: {f:6.2f} fps")


if __name__ == "__main__":
    main()
