"""Palette-stage dataset provider.

Extends NeRFDataset with the palette extras (reference ``palette/provider.py``):
- blender *test* split keeps GT images (:187-223) — already the base behavior here.
- ``type='video'`` loads ``transforms_video.json`` poses whose ``file_path`` doesn't
  exist -> poses only, no images (:152,198,246).
- LSeg feature maps from ``<root>/lseg_feature/<img>.npy`` when ``pred_clip``,
  bilinear-resized to the frame size and gathered per-ray in collate (:235-238,
  :272-283, :383-403). The reference gates this on an undefined ``opt.ablation_name``
  (latent bug); here the Config declares it (default "" = no ablation suffix).
"""

from __future__ import annotations

import os

import numpy as np

from .provider import NeRFDataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class PaletteDataset(NeRFDataset):
    def __init__(self, opt, type: str = "train", downscale: int = 1, n_test: int = 10):
        super().__init__(opt, type=type, downscale=downscale, n_test=n_test)
        self.feat_images = None
        if getattr(opt, "pred_clip", False) and type in ("train", "trainval", "traintest", "all"):
            self.feat_images = self._load_lseg_features()

    def _load_transform(self, type: str) -> dict:
        if type == "video":
            import json

            with open(os.path.join(self.root_path, "transforms_video.json")) as f:
                return json.load(f)
        return super()._load_transform(type)

    def _load_lseg_features(self):
        """Load per-frame LSeg features [B, H, W, clip_dim] (palette/provider.py:272-283).

        The LSeg dump itself is an offline third-party tool (reference
        third-party/lang-seg, run in its own env); we consume its .npy artifacts.
        """
        feat_dir = os.path.join(self.root_path, "lseg_feature")
        suffix = getattr(self.opt, "ablation_name", "")
        if suffix:
            feat_dir = feat_dir + "_" + suffix
        if not os.path.isdir(feat_dir):
            return None
        feats = []
        transform = super()._load_transform(self.type)
        for f in transform["frames"]:
            base = os.path.splitext(os.path.basename(f["file_path"]))[0]
            p = os.path.join(feat_dir, base + ".npy")
            if not os.path.exists(p):
                return None
            feat = np.load(p)  # [h, w, C]
            if cv2 is not None and (feat.shape[0] != self.H or feat.shape[1] != self.W):
                feat = cv2.resize(feat, (self.W, self.H), interpolation=cv2.INTER_LINEAR)
            feats.append(feat.astype(np.float32))
        return np.stack(feats)

    def collate(self, index: int) -> dict:
        out = super().collate(index)
        if self.feat_images is not None and "inds" in out:
            C = self.feat_images.shape[-1]
            out["feat_images"] = self.feat_images[index].reshape(-1, C)[out["inds"]]
        elif self.feat_images is not None and "images" in out:
            out["feat_images"] = self.feat_images[index]
        return out
