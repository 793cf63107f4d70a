"""CLIP text-image guidance loss (capability port of the reference's vestigial
``nerf/clip_utils.py`` CLIPLoss; wired when ``rand_pose >= 0``).

The reference's train path for this is commented out (nerf/utils.py:490-505) and the
openai-clip package + weights are unavailable in zero-egress TPU images, so this module
degrades gracefully: if a CLIP implementation (``clip`` or transformers' CLIPModel with
local weights) is importable, the loss is real; otherwise construction raises with a
clear message. The Trainer only builds it when ``rand_pose >= 0`` (same gate as
nerf/utils.py:463-466)."""

from __future__ import annotations

import numpy as np


class CLIPLoss:
    def __init__(self, model_name: str = "openai/clip-vit-base-patch32",
                 model=None, processor=None):
        """``model``/``processor`` injection bypasses from_pretrained — used by
        tests (stub model) and by callers with an already-loaded CLIP."""
        try:
            import torch

            self._torch = torch
            if model is not None and processor is not None:
                self.model, self.processor = model, processor
            else:
                from transformers import CLIPModel, CLIPProcessor

                self.model = CLIPModel.from_pretrained(model_name).eval()
                self.processor = CLIPProcessor.from_pretrained(model_name)
        except Exception as e:  # pragma: no cover - requires downloaded weights
            raise ImportError(
                "CLIP guidance needs a local CLIP model (transformers CLIPModel); "
                f"unavailable in this environment: {e}"
            )
        self.text_features = None

    def prepare_text(self, prompts):
        t = self._torch
        inputs = self.processor(text=list(prompts), return_tensors="pt", padding=True)
        with t.no_grad():
            feats = self.model.get_text_features(**inputs)
        self.text_features = feats / feats.norm(dim=-1, keepdim=True)

    def __call__(self, images_01: np.ndarray) -> float:
        """images [B, H, W, 3] in [0,1] -> negative mean cosine similarity."""
        t = self._torch
        assert self.text_features is not None, "call prepare_text first"
        inputs = self.processor(images=list((images_01 * 255).astype(np.uint8)),
                                return_tensors="pt")
        feats = self.model.get_image_features(**inputs)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        return float(-(feats @ self.text_features.T).mean())
