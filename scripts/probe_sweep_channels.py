"""Clean-HBM timing of the vd_bands=2 sweep variant (follow-up to
probe_trained_sweep.py, whose variant timings were contaminated by keeping
three multi-GB volumes alive at once — the round-4 bench lesson).

Bakes the deploy checkpoint at vd3, derives the vd2 volume by channel-slicing
(SH bases nest), explicitly deletes the vd3 device buffers, then times the
headline palette-edit frame on vd2 alone.

Run on the attached chip:  python scripts/probe_sweep_channels.py
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
    print(f"[probe2 +{time.perf_counter() - T0:.0f}s] {m}", flush=True)


def main():
    import bench
    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    bands = int(os.environ.get("BANDS", "2"))
    loaded = bench.make_sweep_volume_ckpt()
    assert loaded is not None
    sv3, bc = loaded
    log("ckpt baked (vd3)")

    B3, Bn = 9, bands * bands
    Cbase = sv3.vols[0].shape[2] - 3 * B3
    keep = list(range(Cbase))
    for c in range(3):
        keep += list(range(Cbase + c * B3, Cbase + c * B3 + Bn))
    vols = tuple(jnp.asarray(v[:, :, keep, :]) for v in sv3.vols)
    sv = sv3._replace(vols=vols, vd_bands=bands)
    # free the vd3 device buffers before timing (round-4 lesson: leftover HBM
    # state contaminates timings)
    for v in sv3.vols:
        v.delete()
    del sv3
    log(f"vd{bands} volume derived, vd3 buffers deleted")

    H = W = 800
    P = sv.num_basis
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def frame(i, use_edit=True):
        pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(sv, pose, intr, H, W, u_res=448, basis_color=bc,
                            edit=edit if use_edit else None)

    out = frame(0)
    _ = float(out["image"].sum())
    out = frame(7)
    _ = float(out["image"].sum())
    best = np.inf
    for r in range(4):
        t0 = time.perf_counter()
        for i in range(15):
            out = frame(i + r * 15)
        _ = float(out["image"][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 15)
    log(f"palette+edit vd{bands} u448 (clean): {1.0 / best:.2f} fps")

    # no-edit and single-basis variants on the same volume
    out = frame(0, use_edit=False)
    _ = float(out["image"].sum())
    out = frame(7, use_edit=False)
    _ = float(out["image"].sum())
    t0 = time.perf_counter()
    for i in range(12):
        out = frame(i + 1, use_edit=False)
    _ = float(out["image"][0, 0, 0])
    log(f"palette no-edit vd{bands} u448: {12 / (time.perf_counter() - t0):.2f} fps")


if __name__ == "__main__":
    main()
