"""Real-time serving CLI: trained PaletteNeRF checkpoint -> baked volume ->
shear-warp sweep renderer (the ~30 fps palette-editing path on one chip).

This is the deployment story the CUDA reference lacks an equivalent for: its
interactive path re-queries the MLPs every frame (nerf/renderer.py:336-386);
here the field is baked once (seconds) and every subsequent frame — including
live palette recolors, RegionEdit masks and offsets dials — runs from the
baked volume at interactive rates (render/sweep.py).

Examples:
  # orbit video with a hue edit applied to basis 0
  python main_serve.py results_palette/<ws>/version_N --out orbit.mp4 \
      --n_frames 120 --edit_basis 0 --edit_rgb 0.2 0.9 0.2

  # benchmark only
  python main_serve.py results_palette/<ws>/version_N --bench
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

from palettenerf_tpu.utils.jax_setup import setup_jax


def find_checkpoint(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(glob.glob(os.path.join(path, "checkpoints", "*.ckpt")))
    if not cands:
        # committed deploy artifact (ema-only bf16 export of the training
        # state — scripts/export_deploy_ckpt.py --deploy_dir); results*/ are
        # gitignored, so a fresh clone serves from deploy/
        cands = sorted(glob.glob(os.path.join(path, "palette_*.ckpt")))
    assert cands, f"no checkpoints under {path}"
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace", help="palette workspace (version dir) or .ckpt path")
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--data", default=None,
                    help="scene root: orbit through its test poses (correct up-axis "
                         "in the NGP-transformed frame) instead of a y-up orbit")
    ap.add_argument("--scale", type=float, default=0.8)
    ap.add_argument("--offset", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    ap.add_argument("--num_basis", type=int, default=0, help="0 = infer from ckpt")
    ap.add_argument("--resolution", type=int, default=256, help="bake grid resolution")
    ap.add_argument("--W", type=int, default=800)
    ap.add_argument("--H", type=int, default=800)
    ap.add_argument("--u_res", type=int, default=400,
                    help="intermediate sweep grid (round-5 measured: 47 dB vs "
                         "u448 on the trained bake; the R=256 bake is the "
                         "detail limit)")
    ap.add_argument("--radius", type=float, default=2.35)
    ap.add_argument("--fovy", type=float, default=50.0)
    ap.add_argument("--n_frames", type=int, default=60)
    ap.add_argument("--out", default=None, help="mp4/png output path")
    ap.add_argument("--bench", action="store_true", help="print fps and exit")
    ap.add_argument("--edit_basis", type=int, default=-1,
                    help="recolor this basis (with --edit_rgb)")
    ap.add_argument("--edit_rgb", type=float, nargs=3, default=(0.2, 0.9, 0.2))
    ap.add_argument("--edit_xyz", type=float, nargs=3, default=None,
                    help="optional spatial edit center")
    ap.add_argument("--edit_std", type=float, default=0.3)
    ap.add_argument("--density_thresh", type=float, default=1.0,
                    help="bake-time sigma floor for slice occupancy")
    ap.add_argument("--vd_bands", type=int, default=2,
                    help="SH bands for baked view-dependent color (0 = diffuse only)")
    ap.add_argument("--view_dep_weight", type=float, default=1.0,
                    help="scale of the baked view-dependent channel (eval dial)")
    ap.add_argument("--pred_clip", action="store_true",
                    help="checkpoint predicts clip features (bakes the clip volume)")
    ap.add_argument("--clip_dim", type=int, default=16)
    ap.add_argument("--edit_clip_xyz", type=float, nargs=3, default=None,
                    help="pick a point; its baked clip feature becomes the "
                         "semantic edit center (requires --pred_clip)")
    ap.add_argument("--edit_clip_std", type=float, default=0.5)
    ap.add_argument("--grid_levels", type=int, default=16)
    ap.add_argument("--grid_level_dim", type=int, default=2)
    ap.add_argument("--log2_hashmap_size", type=int, default=19)
    args = ap.parse_args()
    setup_jax()

    import jax.numpy as jnp

    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.render.baking import bake_palette
    from palettenerf_tpu.render.palette_renderer import (
        make_region_edit, region_edit_delta_hsv)
    from palettenerf_tpu.render.sweep import (
        build_clip_masks, build_sweep_volume, render_sweep)
    from palettenerf_tpu.train import checkpoint as ckpt_lib

    ckpt = find_checkpoint(args.workspace)
    payload = ckpt_lib.load_checkpoint(ckpt)
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    P = args.num_basis or params["basis_color"].shape[0]
    spec = PaletteSpec.build(bound=args.bound, num_basis=P,
                             grid_levels=args.grid_levels,
                             grid_level_dim=args.grid_level_dim,
                             log2_hashmap_size=args.log2_hashmap_size,
                             pred_clip=args.pred_clip, clip_dim=args.clip_dim)
    print(f"[serve] ckpt {ckpt} (P={P}); baking {args.resolution}^3 "
          f"(vd_bands={args.vd_bands}) ...", flush=True)
    t0 = time.perf_counter()
    baked = bake_palette(params, spec, resolution=args.resolution,
                         vd_bands=args.vd_bands)

    # occupancy-mask the bake with the training BITFIELD (the exact cell set the
    # marcher sampled): the field is unconstrained fog in never-sampled cells,
    # and unmasked fog both speckles the background and defeats slice skipping
    gs = payload.get("grid_state")
    if gs is not None and gs.get("bitfield") is not None:
        from palettenerf_tpu.render.baking import mask_with_bitfield

        baked = mask_with_bitfield(baked, gs)
        print("[serve] bitfield-masked bake", flush=True)

    sv = build_sweep_volume(baked, sigma_thresh=1e-3)
    print(f"[serve] baked in {time.perf_counter() - t0:.1f}s", flush=True)

    palette = np.clip(np.asarray(params["basis_color"]), 0, 1)
    bc = jnp.asarray(palette, jnp.float32)
    edit = None
    if args.edit_basis >= 0:
        new_pal = palette.copy()
        new_pal[args.edit_basis] = args.edit_rgb
        dh = region_edit_delta_hsv(jnp.asarray(palette), jnp.asarray(new_pal))
        mean_clip = None
        clip_masks = None
        if args.edit_clip_xyz is not None:
            assert baked.clip_feat is not None, "--edit_clip_xyz needs --pred_clip"
            Rr = args.resolution
            ijk = np.clip(((np.asarray(args.edit_clip_xyz) + args.bound)
                           / (2 * args.bound) * (Rr - 1)).round().astype(int),
                          0, Rr - 1)
            mean_clip = np.asarray(baked.clip_feat)[ijk[0], ijk[1], ijk[2]]
            clip_masks = build_clip_masks(baked.clip_feat, mean_clip,
                                          args.edit_clip_std)
            print(f"[serve] semantic edit mask from clip@{args.edit_clip_xyz}",
                  flush=True)
        edit = make_region_edit(
            P, clip_dim=(args.clip_dim if mean_clip is not None else 1),
            mean_xyz=args.edit_xyz, std_xyz=args.edit_std,
            mean_clip=mean_clip, std_clip=args.edit_clip_std)._replace(delta_hsv=dh)
        print(f"[serve] recoloring basis {args.edit_basis} "
              f"{palette[args.edit_basis].round(3)} -> {args.edit_rgb}", flush=True)

    if args.data:
        # orbit through the dataset's (NGP-transformed) test poses via slerp —
        # the model's world frame comes from nerf_matrix_to_ngp, so a naive
        # y-up orbit would be tilted (reference slerp test path, provider.py)
        from scipy.spatial.transform import Rotation, Slerp

        from palettenerf_tpu.config import Config
        from palettenerf_tpu.data.provider import NeRFDataset

        dcfg = Config(path=args.data, bound=args.bound, scale=args.scale,
                      offset=tuple(args.offset))
        ds = NeRFDataset(dcfg, type="test")
        poses = np.asarray(ds.poses)
        sc = args.H / ds.H
        intr_override = tuple(float(v) * sc for v in ds.intrinsics)
        n_key = len(poses)
        rots = Rotation.from_matrix(poses[:, :3, :3])
        key_t = np.arange(n_key)

        def pose_at(i):
            t = (i / args.n_frames) * (n_key - 1)
            k0 = min(int(t), n_key - 2)
            slerp = Slerp([0, 1], Rotation.concatenate([rots[k0], rots[k0 + 1]]))
            f = t - k0
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = slerp(f).as_matrix()
            pose[:3, 3] = (1 - f) * poses[k0, :3, 3] + f * poses[k0 + 1, :3, 3]
            return pose
    else:
        def pose_at(i):
            ang = 2 * np.pi * i / args.n_frames
            eye = args.radius * np.array(
                [np.sin(ang) * 0.92, 0.40, np.cos(ang) * 0.92])
            target = np.array([0.0, -0.1, 0.0])
            fwd = target - eye
            fwd /= np.linalg.norm(fwd)
            right = np.cross(fwd, [0.0, 1.0, 0.0]); right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, down, fwd, eye
            return pose

    if args.data:
        intr = intr_override
    else:
        f = 0.5 * args.H / np.tan(np.radians(args.fovy) / 2)
        intr = (f, f, args.W / 2, args.H / 2)

    if args.edit_basis < 0:
        clip_masks = None

    def frame(i):
        return render_sweep(sv, pose_at(i), intr, args.H, args.W, u_res=args.u_res,
                            basis_color=bc, edit=edit,
                            view_dep_weight=args.view_dep_weight,
                            clip_masks=clip_masks)

    out = frame(0)
    _ = float(out["image"].sum())
    out = frame(args.n_frames // 3)
    _ = float(out["image"].sum())  # second sweep-flip compile

    t0 = time.perf_counter()
    frames = []
    for i in range(args.n_frames):
        o = frame(i)
        if args.out:
            frames.append(o["image"])
    _ = float(o["image"][0, 0, 0])  # one trailing sync times the whole orbit
    dt = time.perf_counter() - t0
    fps = args.n_frames / dt
    print(f"[serve] {args.n_frames} frames @ {args.W}x{args.H}: "
          f"{dt:.2f}s = {fps:.1f} fps", flush=True)

    if args.out:
        arrs = [np.clip(np.asarray(x), 0, 1) for x in frames]
        if args.out.endswith(".png"):
            import cv2
            cv2.imwrite(args.out, cv2.cvtColor(
                (arrs[0] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        else:
            import cv2
            vw = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                                 (args.W, args.H))
            for a in arrs:
                vw.write(cv2.cvtColor((a * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
            vw.release()
        print(f"[serve] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
