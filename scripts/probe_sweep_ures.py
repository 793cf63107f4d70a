"""Headline micro-matrix: u_res x (skip, unroll) on the trained vd2 bake with
bf16 shade. The sweep-vs-exact gap is 29.4 dB (bake-limited, README serve
fidelity row), so a u_res change that stays >= 40 dB vs the u448 render is
quality-invisible; fps is the decider.

Run on the attached chip:  python -u scripts/probe_sweep_ures.py
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
    print(f"[ures +{time.perf_counter() - T0:.0f}s] {m}", flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import bench
    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    loaded = bench.make_sweep_volume_ckpt(vd_bands=2)
    assert loaded is not None
    sv, bc = loaded
    log(f"ckpt baked vd2 (C={sv.vols[0].shape[2]})")

    H = W = 800
    P = sv.num_basis
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def run(label, u_res, n=15, reps=3, **kw):
        def frame(i):
            pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4,
                                  -2.0 * np.cos(0.4 * i)))
            return render_sweep(sv, pose, intr, H, W, u_res=u_res,
                                basis_color=bc, edit=edit, **kw)

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

    ref = run("u448 block/4", 448)
    for u in (432, 416, 400, 384):
        img = run(f"u{u} block/4", u)
        log(f"  PSNR u{u} vs u448: {psnr(img, ref):.2f} dB")
    for skip, unr in (("block", 2), ("block", 6), ("none", 2), ("slice", 1)):
        run(f"u448 {skip}/{unr}", 448, skip=skip, unroll=unr)
    for skip, unr in (("block", 2), ("none", 2)):
        run(f"u416 {skip}/{unr}", 416, skip=skip, unroll=unr)


if __name__ == "__main__":
    main()
