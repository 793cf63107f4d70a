"""Deterministic tiny synthetic scene for integration tests.

Renders a diffuse sphere (radius R at origin, position-dependent color) analytically and
writes a blender-style ``transforms_*.json`` dataset to a temp dir — the "few-image
synthetic cube" strategy from SURVEY.md §4.
"""

from __future__ import annotations

import json
import os

import numpy as np


def look_at_pose(eye, target=(0, 0, 0), up=(0, 1, 0)):
    """OpenGL-style c2w (camera looks along -z), the blender convention the loader's
    nerf_matrix_to_ngp expects."""
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    pose = np.eye(4)
    pose[:3, 0] = r
    pose[:3, 1] = u
    pose[:3, 2] = -f
    pose[:3, 3] = eye
    return pose


def sphere_color(p):
    """Simple position-dependent albedo in [0.1, 0.9]."""
    return 0.5 + 0.4 * np.stack([np.sin(3 * p[..., 0]), np.cos(3 * p[..., 1]), np.sin(3 * p[..., 2])], -1)


def render_sphere_image(pose, H, W, fov_deg=60.0, radius=0.5):
    """Analytic render (RGBA): ray-sphere intersection + flat albedo."""
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    # blender/OpenGL camera: x right, y up, looking down -z
    dirs = np.stack([(i - W / 2) / f, -(j - H / 2) / f, -np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rd = dirs @ pose[:3, :3].T
    ro = pose[:3, 3]

    b = (rd * ro).sum(-1)
    c = (ro * ro).sum() - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = ro + t[..., None] * rd

    img = np.zeros((H, W, 4), np.float32)
    img[hit, :3] = sphere_color(p[hit])
    img[hit, 3] = 1.0
    return img, f


def make_sphere_dataset(root, n_train=12, n_val=2, n_test=2, H=64, W=64, cam_radius=2.0):
    """Write a blender-format scene; returns root."""
    os.makedirs(root, exist_ok=True)
    try:
        import cv2
    except ImportError:
        cv2 = None
    rng = np.random.default_rng(42)

    def write_split(split, n, offset):
        frames = []
        fov = np.radians(60.0)
        for k in range(n):
            phi = 2 * np.pi * (k + offset) / max(n, 1) + 0.3
            theta = np.pi / 2 + 0.5 * np.sin(1.7 * (k + offset))
            eye = cam_radius * np.array(
                [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)]
            )
            pose = look_at_pose(eye)
            img, _ = render_sphere_image(pose, H, W)
            name = f"{split}_{k:03d}"
            os.makedirs(os.path.join(root, split), exist_ok=True)
            path = os.path.join(root, split, name + ".png")
            arr = (img * 255).astype(np.uint8)
            if cv2 is not None:
                cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGBA2BGRA))
            else:
                from PIL import Image

                Image.fromarray(arr).save(path)
            frames.append({
                "file_path": f"{split}/{name}",
                "transform_matrix": pose.tolist(),
            })
        transform = {"camera_angle_x": fov, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fp:
            json.dump(transform, fp)

    write_split("train", n_train, 0.0)
    write_split("val", n_val, 0.37)
    write_split("test", n_test, 0.81)
    return root
