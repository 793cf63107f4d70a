"""LLFF -> instant-ngp dataset conversion.

Capability port of the reference ``scripts/llff2nerf.py`` (+ ``scripts/data_utils/*``):
reads ``poses_bounds.npy``, converts LLFF camera conventions to the ngp convention,
recenters the scene via the up-vector rotation + pairwise closest-ray point, normalizes
the average camera radius to 4.0, holds out every ``--hold``-th frame for test, and
generates a video trajectory (LLFF spiral for forward-facing scenes, PCA-aligned ellipse
for mip360-style inward-facing scenes). Writes ``transforms_{train,val,test,video}.json``.

Pure NumPy (the reference pulls in trimesh only for debug visualization).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _normalize(v):
    return v / (np.linalg.norm(v) + 1e-10)


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to rays oa+t*da / ob+t*db + a parallelism weight."""
    da, db = _normalize(da), _normalize(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = min(ta, 0), min(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def rotmat_between(a, b):
    """Rotation matrix taking unit vector a to b (Rodrigues)."""
    a, b = _normalize(np.asarray(a, float)), _normalize(np.asarray(b, float))
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-10:
        return rotmat_between(a + np.random.uniform(-1e-2, 1e-2, 3), b)
    s = np.linalg.norm(v)
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + k + k @ k * ((1 - c) / (s ** 2 + 1e-10))


def _viewmatrix(z, up, pos):
    z = _normalize(z)
    x = _normalize(np.cross(up, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, pos], 1)  # [3,4]


def _poses_avg(poses):
    center = poses[:, :3, 3].mean(0)
    z = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return _viewmatrix(z, up, center)


def spiral_path(poses, bounds, n_views: int = 120, n_rots: int = 2):
    """LLFF forward-facing spiral render path. poses [N,3,4] (OpenGL-ish, y-up),
    bounds [N,2]. Returns [n_views,3,4]."""
    c2w = _poses_avg(poses)
    up = _normalize(poses[:, :3, 1].sum(0))

    close, far = bounds.min() * 0.9, bounds.max() * 5.0
    dt = 0.75
    focal = 1.0 / ((1 - dt) / close + dt / far)
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    rads = np.append(rads, 1.0)

    out = []
    for theta in np.linspace(0, 2 * np.pi * n_rots, n_views + 1)[:-1]:
        c = c2w[:3, :4] @ (np.array([np.cos(theta), -np.sin(theta),
                                     -np.sin(theta * 0.5), 1.0]) * rads)
        z = _normalize(c - c2w[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        out.append(_viewmatrix(z, up, c))
    return np.stack(out)


def ellipse_path(poses, n_frames: int = 120):
    """Inward-facing elliptical path in PCA-aligned space (mip-nerf-360 style).

    poses [N,3,4]. Returns [n_frames,3,4] in the original coordinate frame."""
    pts = poses[:, :3, 3]
    center = pts.mean(0)
    centered = pts - center
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    rot = vt  # rows = principal axes; row 2 ~ up/normal of the camera ring
    if np.linalg.det(rot) < 0:
        rot = np.diag([1, 1, -1]) @ rot
    aligned = centered @ rot.T

    # ellipse through the 90th-percentile extents of the aligned ring
    rx, ry = np.percentile(np.abs(aligned[:, 0]), 90), np.percentile(np.abs(aligned[:, 1]), 90)
    z_h = aligned[:, 2].mean()
    look = np.array([0.0, 0.0, aligned[:, 2].min()])
    up_a = np.array([0.0, 0.0, 1.0])

    out = []
    for t in np.linspace(0, 2 * np.pi, n_frames, endpoint=False):
        pos_a = np.array([rx * np.cos(t), ry * np.sin(t), z_h])
        z = _normalize(pos_a - look)  # camera looks at the ring center
        m_a = _viewmatrix(z, up_a, pos_a)
        # back to world frame
        m = np.empty((3, 4))
        m[:, :3] = rot.T @ m_a[:, :3]
        m[:, 3] = rot.T @ m_a[:, 3] + center
        out.append(m)
    return np.stack(out)


def convert(path: str, images: str = "images_8", downscale: float = 8,
            hold: int = 8, datatype: str = "llff", n_video: int = 120):
    if not path.endswith("/"):
        path += "/"
    image_files = [
        f[len(path):]
        for f in sorted(glob.glob(os.path.join(path, images, "*")))
        if f.lower().endswith(("png", "jpg", "jpeg"))
    ]
    poses_bounds = np.load(os.path.join(path, "poses_bounds.npy"))
    n = poses_bounds.shape[0]
    assert n == len(image_files), f"{n} poses vs {len(image_files)} images"

    poses35 = poses_bounds[:, :15].reshape(-1, 3, 5)
    bounds = poses_bounds[:, -2:]
    H, W, fl = poses35[0, :, -1]
    H, W, fl = H // downscale, W // downscale, fl / downscale

    # video path, generated in LLFF's [down right back] -> [right up back] frame
    conv = np.concatenate([poses35[..., 1:2], -poses35[..., 0:1], poses35[..., 2:]], -1)
    if datatype == "mip360":
        render = ellipse_path(conv[:, :, :4], n_video)
    else:
        render = spiral_path(conv[:, :, :4], bounds, n_video)
    render = render.copy()
    render[:, :3, 1] *= -1
    render[:, :3, 2] *= -1

    # LLFF [down right back] -> ngp-ish [right down back] c2w (llff2nerf.py:111)
    poses = np.concatenate(
        [poses35[..., 1:2], poses35[..., 0:1], -poses35[..., 2:3], poses35[..., 3:4]], -1)
    poses = np.concatenate([poses, render], 0)
    bottom = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses = np.concatenate([poses, bottom], 1)  # [N+V, 4, 4]

    # colmap2nerf-style reorientation (llff2nerf.py:121-124)
    poses[:, 0:3, 1] *= -1
    poses[:, 0:3, 2] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2, :] *= -1

    up = _normalize(poses[:n, 0:3, 1].sum(0))
    R = np.pad(rotmat_between(up, [0, 0, 1]), [(0, 1), (0, 1)])
    R[-1, -1] = 1
    poses = R @ poses

    # recenter at the pairwise closest-ray point (llff2nerf.py:134-147)
    totw, totp = 0.0, np.zeros(3)
    for i in range(n):
        for j in range(i + 1, n):
            p, w = closest_point_2_lines(poses[i, :3, 3], poses[i, :3, 2],
                                         poses[j, :3, 3], poses[j, :3, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    if totw > 0:
        poses[:, :3, 3] -= totp / totw
    avglen = np.linalg.norm(poses[:n, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 4.0 / avglen

    test_ids = np.arange(n)[::hold]
    train_ids = np.array([i for i in range(n) if i not in test_ids])

    def frames_for(ids, use_images=True):
        return [
            {"file_path": image_files[i] if use_images else "---",
             "transform_matrix": poses[i].tolist()}
            for i in ids
        ]

    def write(filename, frames):
        out = {"w": W, "h": H, "fl_x": fl, "fl_y": fl,
               "cx": W // 2, "cy": H // 2, "aabb_scale": 2, "frames": frames}
        with open(os.path.join(path, filename), "w") as f:
            json.dump(out, f, indent=2)
        print(f"[INFO] wrote {len(frames)} frames to {filename}")

    frames_test = frames_for(test_ids)
    write("transforms_train.json", frames_for(train_ids))
    write("transforms_val.json", frames_test[::10])
    write("transforms_test.json", frames_test)
    write("transforms_video.json", frames_for(np.arange(n, len(poses)), use_images=False))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str)
    p.add_argument("--images", type=str, default="images_8")
    p.add_argument("--downscale", type=float, default=8)
    p.add_argument("--hold", type=int, default=8)
    p.add_argument("--datatype", type=str, required=True, choices=["llff", "mip360", "blender"])
    args = p.parse_args()
    convert(args.path, args.images, args.downscale, args.hold, args.datatype)
