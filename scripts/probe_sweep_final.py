"""Validate the round-5 headline configuration on the trained bake:
vd_bands=2 volume (46.6 dB vs vd3 — view-dep is negligible on this scene) +
bf16 shade (VPU-bound chain) + channel-aware unroll.

Reports fps for: palette+edit (bf16 and f32 shade, with PSNR between them),
single-basis edit, palette no-edit, and the plain nerf sweep (unroll auto=8).

Run on the attached chip:  python -u scripts/probe_sweep_final.py
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
    print(f"[final +{time.perf_counter() - T0:.0f}s] {m}", flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import bench
    from palettenerf_tpu.render.baking import BakedVolume
    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import build_sweep_volume, render_sweep

    loaded = bench.make_sweep_volume_ckpt(vd_bands=2)
    assert loaded is not None
    sv, bc = loaded
    log(f"ckpt baked vd2 (C={sv.vols[0].shape[2]})")

    H = W = 800
    P = sv.num_basis
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    eb1 = edit._replace(delta_hsv=jnp.asarray(
        [[120.0, 1.0, 1.0]] + [[0.0, 1.0, 1.0]] * (P - 1)))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def run(label, use_edit=True, n=15, reps=3, **kw):
        def frame(i):
            pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4,
                                  -2.0 * np.cos(0.4 * i)))
            return render_sweep(sv, pose, intr, H, W, u_res=448, basis_color=bc,
                                edit=use_edit if use_edit is not True else edit,
                                **kw)

        out = frame(0)
        _ = float(out["image"].sum())
        img0 = np.asarray(out["image"])
        out = frame(7)
        _ = float(out["image"].sum())
        best = np.inf
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(n):
                out = frame(i + 1)
            _ = float(out["image"][0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / n)
        log(f"{label}: {1.0 / best:.2f} fps")
        return img0

    img_bf = run("palette+edit vd2 bf16-shade (headline)")
    img_f32 = run("palette+edit vd2 f32-shade", shade_bf16=False)
    log(f"PSNR bf16 vs f32 shade: {psnr(img_bf, img_f32):.2f} dB")
    run("single-basis edit bf16", use_edit=eb1)
    run("palette no-edit bf16", use_edit=None)

    dens = jnp.asarray(sv.vols[0][:, :, 0, :], jnp.float32)
    R = sv.resolution
    svn = build_sweep_volume(
        BakedVolume(R, 1.0, dens, jnp.zeros((R, R, R, 3)) + 0.5, None, None, None))
    dens.delete()

    def nframe(i):
        pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
        return render_sweep(svn, pose, intr, H, W, u_res=448)

    out = nframe(0)
    _ = float(out["image"].sum())
    out = nframe(7)
    _ = float(out["image"].sum())
    t0 = time.perf_counter()
    for i in range(12):
        out = nframe(i + 1)
    _ = float(out["image"][0, 0, 0])
    log(f"nerf sweep (auto unroll=8): {12 / (time.perf_counter() - t0):.2f} fps")


if __name__ == "__main__":
    main()
