"""Why does the trained-checkpoint bake sweep at 18 fps when the synthetic
volume did 30? (round-5 finding: BENCH headline on the real product path.)

One bake of the committed deploy checkpoint, then:
  1. occupancy statistics per sweep axis (slice / 8-block fill, occupied span)
     at several sigma thresholds — how much the slab skip CAN save;
  2. headline palette-edit fps at vd_bands 3 (current) / 2 / 0 (channel-sliced
     from the one bake — SH bases nest) and the plain nerf sweep;
  3. u_res 384 variant;
plus PSNR of each variant vs the vd3/u448 render so quality costs are visible.

Run on the attached chip:  python scripts/probe_trained_sweep.py
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
    print(f"[probe +{time.perf_counter() - T0:.0f}s] {m}", flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import bench
    from palettenerf_tpu.render.baking import BakedVolume
    from palettenerf_tpu.render.sweep import build_sweep_volume

    loaded = bench.make_sweep_volume_ckpt()
    assert loaded is not None, "no trained checkpoint to probe"
    sv3, bc = loaded
    log("ckpt baked (vd3)")

    # ---- occupancy statistics straight from the packed volume (channel 0) ----
    R = sv3.resolution
    for a in range(3):
        occ = np.asarray(sv3.occ[a])
        dens = np.asarray(sv3.vols[a][:, :, 0, :], np.float32)  # [Z, X, Y]
        nz = np.where(occ)[0]
        span = (int(nz[0]), int(nz[-1])) if nz.size else (0, -1)
        blocks = occ.reshape(-1, 8).any(1)
        log(f"axis {a}: occ slices {occ.mean():.3f}  blocks8 {blocks.mean():.3f}  "
            f"span [{span[0]},{span[1]}] ({(span[1]-span[0]+1)/R:.2f} of Z)")
        for th in (1e-3, 1e-2, 1e-1, 1.0):
            s = (dens > th).any(axis=(1, 2))
            b8 = s.reshape(-1, 8).any(1)
            log(f"  sigma>{th:g}: slices {s.mean():.3f} blocks8 {b8.mean():.3f} "
                f"voxels {(dens > th).mean():.4f}")

    # ---- fps variants (each its own jit cache entry; bake shared) ----
    # derive vd0 / vd2 sweep volumes by channel-slicing the packed vols:
    # layout [sigma, omega(P), off_r/g/b(P each), rad, r_sh(B), g_sh(B), b_sh(B)]
    def subset_vd(sv, bands):
        B3, Bn = 9, bands * bands
        Cbase = sv.vols[0].shape[2] - 3 * B3
        keep = list(range(Cbase))
        for c in range(3):
            keep += list(range(Cbase + c * B3, Cbase + c * B3 + Bn))
        vols = tuple(v[:, :, keep, :] for v in sv.vols)
        return sv._replace(vols=vols, vd_bands=bands)

    sv2 = subset_vd(sv3, 2)
    sv0 = subset_vd(sv3, 0)

    from palettenerf_tpu.render.palette_renderer import make_region_edit
    from palettenerf_tpu.render.sweep import render_sweep

    H = W = 800
    P = sv3.num_basis
    edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    dh = ([[120.0, 1.0, 1.0], [0.0, 0.6, 1.2]] * ((P + 1) // 2))[:P]
    edit = edit._replace(delta_hsv=jnp.asarray(dh))
    intr = (H * 0.9, H * 0.9, W / 2, H / 2)

    def fps_of(sv, u_res, use_edit=True, n=12, label=""):
        def frame(i):
            pose = bench.look_at((2.0 * np.sin(0.4 * i), 0.4, -2.0 * np.cos(0.4 * i)))
            return render_sweep(sv, pose, intr, H, W, u_res=u_res, basis_color=bc,
                                edit=edit if use_edit else None)

        out = frame(0)
        _ = float(out["image"].sum())
        out = frame(7)  # second sweep-flip variant
        img0 = np.asarray(out["image"])
        t0 = time.perf_counter()
        for i in range(n):
            out = frame(i + 1)
        _ = float(out["image"][0, 0, 0])
        f = n / (time.perf_counter() - t0)
        log(f"{label}: {f:.2f} fps")
        return f, img0

    f3, img3 = fps_of(sv3, 448, label="palette+edit vd3 u448 (headline)")
    f2, img2 = fps_of(sv2, 448, label="palette+edit vd2 u448")
    f0, img0_ = fps_of(sv0, 448, label="palette+edit vd0 u448")
    log(f"PSNR vd2 vs vd3: {psnr(img2, img3):.2f} dB | vd0 vs vd3: "
        f"{psnr(img0_, img3):.2f} dB")
    f384, img384 = fps_of(sv3, 384, label="palette+edit vd3 u384")
    log(f"PSNR u384 vs u448 (vd3): {psnr(img384, img3):.2f} dB")
    fpl, _ = fps_of(sv3, 448, use_edit=False, label="palette no-edit vd3 u448")

    # plain nerf sweep (density + grey diffuse), C=4
    dens = sv3.vols[0][:, :, 0, :].astype(jnp.float32)
    baked_n = BakedVolume(R, 1.0, dens, jnp.zeros((R, R, R, 3)) + 0.5,
                          None, None, None)
    svn = build_sweep_volume(baked_n)
    fn_, _ = fps_of(svn, 448, use_edit=False, label="nerf sweep u448")


if __name__ == "__main__":
    main()
