"""NeRF dataset provider: instant-ngp-style ``transforms*.json`` scenes.

Capability port of the reference ``nerf/provider.py`` (NeRFDataset):
- auto-detect colmap (``transforms.json``) vs blender (``transforms_train.json``) layout
  (provider.py:115-120), with ``all`` / ``trainval`` / ``traintest`` split merges
  (:123-152)
- ``nerf_matrix_to_ngp`` axis permutation + scale/offset (:19-27)
- colmap test split = slerp interpolation between two random poses (:169-185)
- uint16->uint8, BGR(A)->RGB(A), resize, alpha kept as mask (:213-231)
- intrinsics from fl_x/fl_y or camera_angle_x/y (:266-281)
- error-map state for importance sampling (:241-245)
- orbit-camera ``rand_poses`` for the CLIP mode (:57-91)

Host side is NumPy; ``collate`` returns numpy arrays ready to feed jitted device fns
(ray generation itself is in ``data/rays.py``). The ``type='video'`` mode and LSeg
feature ingestion live in the palette provider subclass.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from .rays import gen_rays, sample_ray_indices

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)) -> np.ndarray:
    """NeRF c2w -> instant-ngp convention: cycle axes (y,z,x), flip y/z columns,
    scale+offset translation (provider.py:19-27)."""
    perm = [1, 2, 0]
    new = np.eye(4, dtype=np.float32)
    new[:3, 0] = pose[perm, 0]
    new[:3, 1] = -pose[perm, 1]
    new[:3, 2] = -pose[perm, 2]
    new[:3, 3] = pose[perm, 3] * scale + np.asarray(offset, np.float32)
    return new


def rand_poses(rng: np.random.Generator, size: int, radius: float = 1.0,
               theta_range=(np.pi / 3, 2 * np.pi / 3), phi_range=(0, 2 * np.pi)) -> np.ndarray:
    """Random orbit-camera poses [size,4,4] (provider.py:57-91; y-up, look-at origin)."""
    thetas = rng.uniform(*theta_range, size)
    phis = rng.uniform(*phi_range, size)
    centers = np.stack(
        [radius * np.sin(thetas) * np.sin(phis),
         radius * np.cos(thetas),
         radius * np.sin(thetas) * np.cos(phis)], -1)

    def norm(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -norm(centers)
    up = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (size, 1))
    right = norm(np.cross(forward, up))
    up = norm(np.cross(right, forward))
    poses = np.tile(np.eye(4, dtype=np.float32), (size, 1, 1))
    poses[:, :3, :3] = np.stack([right, up, forward], -1)
    poses[:, :3, 3] = centers
    return poses


def _slerp(r0: np.ndarray, r1: np.ndarray, t: float) -> np.ndarray:
    from scipy.spatial.transform import Rotation, Slerp

    rots = Rotation.from_matrix(np.stack([r0, r1]))
    return Slerp([0, 1], rots)(t).as_matrix()


class NeRFDataset:
    """Scene dataset. ``type`` in train/val/test/all/trainval/traintest/video."""

    def __init__(self, opt, type: str = "train", downscale: int = 1, n_test: int = 10):
        self.opt = opt
        self.type = type
        self.downscale = downscale
        self.root_path = opt.path
        self.training = type in ("train", "all", "trainval")
        self.num_rays = opt.num_rays if self.training else -1
        self.rand_pose = opt.rand_pose
        self.rng = np.random.default_rng(opt.seed + hash(type) % 2 ** 16)

        if os.path.exists(os.path.join(self.root_path, "transforms.json")):
            self.mode = "colmap"
        elif os.path.exists(os.path.join(self.root_path, "transforms_train.json")):
            self.mode = "blender"
        else:
            raise FileNotFoundError(f"Cannot find transforms*.json under {self.root_path}")

        transform = self._load_transform(type)

        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // downscale
            self.W = int(transform["w"]) // downscale
        else:
            self.H = self.W = None

        frames = transform["frames"]
        self.poses, self.images = self._load_frames(frames, type, n_test)

        if self.H is None or self.W is None:
            # pose-only splits (e.g. video trajectories without h/w metadata) fall back
            # to the GUI/render dims, like the reference's opt.H/opt.W plumbing
            self.H, self.W = opt.H, opt.W

        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

        self.error_map = (
            np.ones((len(self.poses), 128 * 128), np.float32)
            if self.training and opt.error_map
            else None
        )

        self.intrinsics = self._load_intrinsics(transform)

    # ---------- loading ----------

    def _load_transform(self, type: str) -> dict:
        root = self.root_path
        if self.mode == "colmap":
            with open(os.path.join(root, "transforms.json")) as f:
                return json.load(f)
        if type == "all":
            transform = None
            for p in sorted(glob.glob(os.path.join(root, "*.json"))):
                with open(p) as f:
                    t = json.load(f)
                if transform is None:
                    transform = t
                else:
                    transform["frames"].extend(t["frames"])
            return transform
        if type == "trainval":
            with open(os.path.join(root, "transforms_train.json")) as f:
                transform = json.load(f)
            with open(os.path.join(root, "transforms_val.json")) as f:
                transform["frames"].extend(json.load(f)["frames"])
            return transform
        if type == "traintest":
            with open(os.path.join(root, "transforms_train.json")) as f:
                return json.load(f)
        with open(os.path.join(root, f"transforms_{type}.json")) as f:
            return json.load(f)

    def _load_frames(self, frames, type: str, n_test: int):
        opt = self.opt
        if self.mode == "colmap" and type == "test":
            # interpolate a smooth test path between two random poses (provider.py:169-185)
            f0, f1 = self.rng.choice(frames, 2, replace=False)
            p0 = nerf_matrix_to_ngp(np.asarray(f0["transform_matrix"], np.float32), opt.scale, opt.offset)
            p1 = nerf_matrix_to_ngp(np.asarray(f1["transform_matrix"], np.float32), opt.scale, opt.offset)
            poses = []
            for i in range(n_test + 1):
                ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], ratio)
                pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
                poses.append(pose)
            return np.stack(poses), None

        if self.mode == "colmap":
            if type == "train":
                frames = frames[1:]
            elif type == "val":
                frames = frames[:1]

        poses, images = [], []
        for f in frames:
            f_path = os.path.join(self.root_path, f["file_path"])
            if self.mode == "blender" and "." not in os.path.basename(f_path):
                f_path += ".png"
            if not os.path.exists(f_path) and type != "video":
                continue
            poses.append(
                nerf_matrix_to_ngp(np.asarray(f["transform_matrix"], np.float32), opt.scale, opt.offset)
            )
            if os.path.exists(f_path):
                images.append(self._read_image(f_path))
        poses = np.stack(poses)
        images = np.stack(images) if images else None
        return poses, images

    def _read_image(self, path: str) -> np.ndarray:
        if cv2 is None:
            raise RuntimeError("cv2 is required for image loading")
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img.dtype == np.uint16 and img.max() > 500:
            img = (img // 256).astype(np.uint8)
        if self.H is None or self.W is None:
            self.H = img.shape[0] // self.downscale
            self.W = img.shape[1] // self.downscale
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        if img.shape[-1] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
        if img.shape[0] != self.H or img.shape[1] != self.W:
            img = cv2.resize(img, (self.W, self.H), interpolation=cv2.INTER_AREA)
        return img.astype(np.float32) / 255.0

    def _load_intrinsics(self, transform) -> np.ndarray:
        d = self.downscale
        if "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / d
            fl_y = transform.get("fl_y", transform.get("fl_x")) / d
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = (
                self.W / (2 * np.tan(transform["camera_angle_x"] / 2))
                if "camera_angle_x" in transform else None
            )
            fl_y = (
                self.H / (2 * np.tan(transform["camera_angle_y"] / 2))
                if "camera_angle_y" in transform else None
            )
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("Failed to load focal length from transforms.json")
        cx = transform.get("cx", (self.W or 0) / 2) / (d if "cx" in transform else 1)
        cy = transform.get("cy", (self.H or 0) / 2) / (d if "cy" in transform else 1)
        if "cx" not in transform:
            cx, cy = self.W / 2, self.H / 2
        return np.array([fl_x, fl_y, cx, cy], np.float64)

    # ---------- batching ----------

    def __len__(self):
        size = len(self.poses)
        if self.training and self.rand_pose > 0:
            size += size // self.rand_pose
        return size

    @property
    def has_gt(self) -> bool:
        return self.images is not None

    def collate(self, index: int) -> dict:
        """One training/eval batch for image ``index`` (provider.py:284-330)."""
        if self.rand_pose == 0 or index >= len(self.poses):
            # random orbit pose, low-res full frame for CLIP mode
            pose = rand_poses(self.rng, 1, radius=self.radius)[0]
            s = np.sqrt(self.H * self.W / self.num_rays)
            rH, rW = int(self.H / s), int(self.W / s)
            ro, rd = gen_rays(pose, self.intrinsics / s, rH, rW, None)
            return {"H": rH, "W": rW, "rays_o": ro, "rays_d": rd}

        pose = self.poses[index]
        out = {"H": self.H, "W": self.W, "index": index}
        if self.training:
            emap = self.error_map[index] if self.error_map is not None else None
            inds, inds_coarse = sample_ray_indices(
                self.rng, self.H, self.W, self.num_rays, emap,
                self.opt.patch_size, getattr(self.opt, "random_size", 0),
            )
            ro, rd = gen_rays(pose, self.intrinsics, self.H, self.W, inds)
            out.update(rays_o=ro, rays_d=rd, inds=inds)
            if inds_coarse is not None:
                out["inds_coarse"] = inds_coarse
            if self.images is not None:
                out["images"] = self.images[index].reshape(-1, self.images.shape[-1])[inds]
        else:
            ro, rd = gen_rays(pose, self.intrinsics, self.H, self.W, None)
            out.update(rays_o=ro, rays_d=rd)
            if self.images is not None:
                out["images"] = self.images[index]
        return out

    def iter_epoch(self):
        """Yield one collated batch per image (shuffled when training)."""
        order = np.arange(len(self))
        if self.training:
            self.rng.shuffle(order)
        for idx in order:
            yield self.collate(int(idx))

    def update_error_map(self, index: int, inds_coarse: np.ndarray, error: np.ndarray):
        """EMA update of the per-image error map (nerf/utils.py:556-578)."""
        if self.error_map is None:
            return
        em = self.error_map[index]
        em[inds_coarse] = 0.1 * em[inds_coarse] + 0.9 * error
        self.error_map[index] = em
