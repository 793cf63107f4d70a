"""Record a scripted interactive edit session as the GUI interactivity artifact.

The image ships no DearPyGui, so the interactive front-end (gui/dpg_gui.py) cannot
open a real window here. This script drives the SAME control surface the GUI
wires — EditingSession (gui/headless.py), the programmatic twin of the reference
PaletteGUI (palette/gui.py:216-223 point picking, :475-558 palette color edits,
:483-502 region sliders, :516-526 weight dials, :560-659 stylizer) — through a
representative interaction sequence, capturing every frame exactly as the GUI
render loop would display it (trainer.test_gui path), and writes an annotated
mp4 + per-step pngs.

Usage:
  python scripts/record_edit_session.py results_palette/proc_toys/version_1 \
      --W 400 --H 400 --out docs/assets/edit_session.mp4

Runs on the chip in ~1-2 min at 400x400; pass --W 64 --H 64 --samples 32 for a
CPU smoke run.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def annotate(img, text):
    import cv2

    im = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8).copy()
    cv2.putText(im, text, (6, im.shape[0] - 8), cv2.FONT_HERSHEY_SIMPLEX,
                max(im.shape[1] / 800.0 * 0.9, 0.35), (255, 255, 255), 1,
                cv2.LINE_AA)
    return im


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace", help="palette workspace (version dir)")
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--H", type=int, default=400)
    ap.add_argument("--radius", type=float, default=2.35)
    ap.add_argument("--samples", type=int, default=128,
                    help="infer samples/ray (lower for CPU smoke runs)")
    ap.add_argument("--num_basis", type=int, default=0, help="0 = infer from ckpt")
    ap.add_argument("--out", default="docs/assets/edit_session.mp4")
    ap.add_argument("--hold", type=int, default=8, help="video frames per step")
    args = ap.parse_args()

    from palettenerf_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.gui.headless import EditingSession
    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.train.palette_trainer import PaletteTrainer

    # infer palette size from the checkpoint before building specs
    import glob

    import jax.numpy as jnp

    from palettenerf_tpu.train import checkpoint as ckpt_lib

    cands = sorted(glob.glob(os.path.join(args.workspace, "checkpoints", "*.ckpt")))
    assert cands, f"no checkpoints under {args.workspace}"
    payload = ckpt_lib.load_checkpoint(cands[-1])
    P = args.num_basis or payload["params"]["basis_color"].shape[0]

    cfg = Config(path=".", workspace=args.workspace, bound=1.0, num_basis=P,
                 infer_samples_per_ray=args.samples, max_steps=512,
                 dt_gamma=0.0, min_near=0.05)
    spec = PaletteSpec.build(bound=1.0, num_basis=P)
    trainer = PaletteTrainer("palette", cfg, spec, workspace=args.workspace,
                             use_checkpoint=cands[-1], nerf_path=None, mute=True)

    sess = EditingSession(trainer, W=args.W, H=args.H, radius=args.radius)
    steps = []  # (label, image)

    def snap(label):
        f = sess.render()
        steps.append((label, np.asarray(f["image"])))
        print(f"[capture] {label}", flush=True)
        return f

    # 1. plain render + orbit
    snap("1. load checkpoint, render")
    sess.cam.orbit(40, 8)
    frame = snap("2. orbit camera")

    # 2. point pick (center-ish foreground pixel) -> spatial region
    ws = np.asarray(frame["weights_sum"])
    ys, xs = np.nonzero(ws > 0.5)
    if len(xs):
        i = len(xs) // 2
        pick = sess.pick(int(xs[i]), int(ys[i]))
        sess.set_region(mean_xyz=pick["xyz"], std_xyz=0.35)
        snap("3. right-click pick -> spatial region")
        sess.set_region(mean_xyz=pick["xyz"], std_xyz=0.35, weight_mode=True)
        snap("4. region weight mask view")
        sess.set_region(mean_xyz=pick["xyz"], std_xyz=0.35)

    # 3. palette recolors (global after region reset)
    sess.recolor(0, [0.15, 0.85, 0.25])
    snap("5. recolor basis 0 -> green")
    sess.recolor(min(1, P - 1), [0.2, 0.3, 0.95])
    snap("6. recolor basis 1 -> blue")
    sess.reset_colors()
    sess.set_region()  # clear region

    # 4. dials
    sess.set_weights(offsets_weight=0.0, view_dep_weight=1.0)
    snap("7. offsets dial -> 0 (flat palette colors)")
    sess.set_weights(offsets_weight=1.0, view_dep_weight=0.0)
    snap("8. view-dep dial -> 0 (diffuse only)")
    sess.set_weights(1.0, 1.0)

    # 5. stylizer: fit to one correspondence and toggle
    f = snap("9. reset")
    ws = np.asarray(f["weights_sum"])
    ys, xs = np.nonzero(ws > 0.5)
    if len(xs):
        x, y = int(xs[len(xs) // 3]), int(ys[len(xs) // 3])
        sess.add_correspondence(x, y, [0.9, 0.6, 0.1])
        sess.optimize_style(iters=150)
        snap("10. stylizer fit (point -> orange)")
        sess.use_style(False)
        snap("11. stylizer off")

    # write artifacts
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    import cv2

    h, w = steps[0][1].shape[:2]
    vw = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
    png_dir = os.path.splitext(args.out)[0] + "_frames"
    os.makedirs(png_dir, exist_ok=True)
    for i, (label, img) in enumerate(steps):
        im = annotate(img, label)
        cv2.imwrite(os.path.join(png_dir, f"{i:02d}_{label.split('.')[0]}.png"),
                    cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
        for _ in range(args.hold):
            vw.write(cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
    vw.release()
    print(f"[capture] wrote {args.out} + {len(steps)} pngs under {png_dir}")


if __name__ == "__main__":
    main()
