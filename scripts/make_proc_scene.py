"""Procedural high-fidelity Blender-style scene generator ("proc-toys").

No NeRF-synthetic dataset ships in this environment (zero egress), so the
real-scene acceptance run (VERDICT r1 item 5) uses this analytic scene: a toy
arrangement of spheres, boxes and a ground slab with
- distinct saturated albedos (the property palette extraction needs),
- two directional lights + ambient, Lambertian shading with cast shadows,
- a Blinn-Phong specular lobe (view-DEPENDENT radiance, exercising the
  palette model's view_dep head),
- procedural checker/stripe textures on the ground and one sphere,
- RGBA alpha like the Blender synthetic scenes.

Rendered analytically (exact ray intersections, vectorized NumPy) at any
resolution; writes transforms_{train,val,test}.json in the Blender format the
data provider consumes. Deterministic.

Usage: python scripts/make_proc_scene.py <out_root> [--res 800] [--n_train 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from synthetic import look_at_pose  # noqa: E402

# ----------------------------------------------------------------- scene model
# objects inside the unit-ish cube (scene fits |p| < 0.85)

SPHERES = [
    # (center, radius, albedo, specular, checker)
    ((-0.38, -0.12, 0.30), 0.26, (0.85, 0.15, 0.12), 0.6, False),   # red
    ((0.40, -0.20, -0.25), 0.20, (0.12, 0.35, 0.85), 0.8, False),   # blue
    ((0.05, 0.34, 0.05), 0.22, (0.90, 0.80, 0.15), 0.4, True),      # yellow (striped)
    ((0.42, 0.10, 0.42), 0.14, (0.15, 0.75, 0.25), 0.9, False),     # green
]
BOXES = [
    # (lo, hi, albedo, specular)
    ((-0.15, -0.42, -0.45), (0.18, -0.10, -0.12), (0.80, 0.45, 0.10), 0.3),  # orange
    ((-0.55, -0.42, -0.20), (-0.30, 0.05, 0.05), (0.55, 0.20, 0.65), 0.5),   # purple
]
GROUND = (-0.85, -0.46, -0.85, 0.85, -0.42, 0.85)  # slab: x0 y0 z0 x1 y1 z1
GROUND_ALBEDO_A = (0.75, 0.75, 0.78)
GROUND_ALBEDO_B = (0.35, 0.35, 0.40)

LIGHTS = [  # (direction TO light, intensity)
    ((0.5, 0.8, 0.3), 0.85),
    ((-0.6, 0.6, -0.5), 0.45),
]
AMBIENT = 0.18
SHININESS = 48.0


def _norm(v):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


def _sphere_hit(ro, rd, c, r):
    oc = ro - np.asarray(c)
    b = (rd * oc).sum(-1)
    q = (oc * oc).sum(-1) - r * r
    disc = b * b - q
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-4), t, np.inf)


def _box_hit(ro, rd, lo, hi):
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    inv = 1.0 / np.where(np.abs(rd) < 1e-12, 1e-12, rd)
    t0 = (lo - ro) * inv
    t1 = (hi - ro) * inv
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax > np.maximum(tmin, 1e-4))
    return np.where(hit, np.where(tmin > 1e-4, tmin, tmax), np.inf)


def _box_normal(p, lo, hi):
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    c = (lo + hi) / 2
    h = (hi - lo) / 2
    d = (p - c) / h
    n = np.zeros_like(p)
    ax = np.argmax(np.abs(d), -1)
    n[np.arange(p.shape[0]), ax] = np.sign(d[np.arange(p.shape[0]), ax])
    return n


def _all_objects():
    objs = []
    for c, r, alb, spec, checker in SPHERES:
        objs.append(("sphere", (c, r), alb, spec, checker))
    for lo, hi, alb, spec in BOXES:
        objs.append(("box", (lo, hi), alb, spec, False))
    x0, y0, z0, x1, y1, z1 = GROUND
    objs.append(("box", ((x0, y0, z0), (x1, y1, z1)), GROUND_ALBEDO_A, 0.15, "ground"))
    return objs


def _trace_t(ro, rd):
    """Nearest hit over all objects. Returns (t [N], obj_index [N])."""
    objs = _all_objects()
    ts = []
    for kind, geo, *_ in objs:
        if kind == "sphere":
            ts.append(_sphere_hit(ro, rd, *geo))
        else:
            ts.append(_box_hit(ro, rd, *geo))
    ts = np.stack(ts, -1)
    idx = np.argmin(ts, -1)
    t = ts[np.arange(ts.shape[0]), idx]
    return t, idx


def _shade(p, n, view, obj_idx):
    objs = _all_objects()
    N = p.shape[0]
    albedo = np.zeros((N, 3))
    spec_k = np.zeros((N,))
    for i, (kind, geo, alb, spec, checker) in enumerate(objs):
        m = obj_idx == i
        if not m.any():
            continue
        a = np.broadcast_to(np.asarray(alb, np.float64), (int(m.sum()), 3)).copy()
        if checker == "ground":
            cx = np.floor(p[m, 0] * 5) + np.floor(p[m, 2] * 5)
            a = np.where((cx % 2 == 0)[:, None], a, np.asarray(GROUND_ALBEDO_B))
        elif checker:  # striped sphere
            s = np.sin(18.0 * p[m, 1]) > 0
            a = np.where(s[:, None], a, a * 0.35)
        albedo[m] = a
        spec_k[m] = spec

    col = AMBIENT * albedo
    for ldir, inten in LIGHTS:
        l = _norm(np.asarray(ldir, np.float64))
        # cast shadow: offset origin, trace toward the light
        t_sh, _ = _trace_t(p + n * 1e-3, np.broadcast_to(l, p.shape))
        lit = ~np.isfinite(t_sh)
        diff = np.maximum((n * l).sum(-1), 0.0)
        h = _norm(l + view)
        spec = np.maximum((n * h).sum(-1), 0.0) ** SHININESS
        col += inten * lit[:, None] * (
            albedo * diff[:, None] + (spec_k * spec)[:, None])
    return np.clip(col, 0.0, 1.0)


def render_image(pose, H, W, fov_deg=50.0):
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / f, -(j - H / 2) / f, -np.ones_like(i)], -1)
    dirs = _norm(dirs).reshape(-1, 3)
    rd = dirs @ pose[:3, :3].T
    ro = np.broadcast_to(pose[:3, 3], rd.shape)

    t, idx = _trace_t(ro, rd)
    hit = np.isfinite(t)
    img = np.zeros((H * W, 4), np.float32)
    if hit.any():
        p = ro[hit] + t[hit, None] * rd[hit]
        objs = _all_objects()
        n = np.zeros_like(p)
        for k, (kind, geo, *_r) in enumerate(objs):
            m = idx[hit] == k
            if not m.any():
                continue
            if kind == "sphere":
                n[m] = _norm(p[m] - np.asarray(geo[0]))
            else:
                n[m] = _box_normal(p[m], *geo)
        col = _shade(p, n, -rd[hit], idx[hit])
        img[hit, :3] = col
        img[hit, 3] = 1.0
    return img.reshape(H, W, 4), f


def make_scene(root, n_train=100, n_val=8, n_test=8, H=800, W=800,
               cam_radius=2.35, fov_deg=50.0):
    os.makedirs(root, exist_ok=True)
    import cv2

    def write_split(split, n, seed):
        rng = np.random.default_rng(seed)
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for k in range(n):
            phi = 2 * np.pi * k / max(n, 1) + rng.uniform(0, 0.25)
            theta = np.radians(rng.uniform(35, 80))  # upper hemisphere
            eye = cam_radius * np.array([
                np.sin(theta) * np.cos(phi), np.cos(theta),
                np.sin(theta) * np.sin(phi)])
            pose = look_at_pose(eye, target=(0.0, -0.1, 0.0))
            img, _f = render_image(pose, H, W, fov_deg)
            rel = f"./{split}/r_{k}"
            bgra = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGBA2BGRA)
            cv2.imwrite(os.path.join(root, f"{rel}.png"), bgra)
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
            print(f"[proc-toys] {split} {k + 1}/{n}", flush=True)
        meta = {"camera_angle_x": float(np.radians(fov_deg)), "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fjs:
            json.dump(meta, fjs, indent=1)

    write_split("train", n_train, 0)
    write_split("val", n_val, 1)
    write_split("test", n_test, 2)
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_val", type=int, default=8)
    ap.add_argument("--n_test", type=int, default=8)
    args = ap.parse_args()
    make_scene(args.root, n_train=args.n_train, n_val=args.n_val,
               n_test=args.n_test, H=args.res, W=args.res)
