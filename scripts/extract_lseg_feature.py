"""Dense semantic-feature dump for palette_lseg training.

TPU-rebuild counterpart of the reference's offline LSeg extractor
(third-party/lang-seg/extract_lseg_feature.py:297-433): run a dense
vision-language feature model over every training frame, reduce the channel
dim to ``--clip_dim`` with a PCA fit across all frames, and save
``<datadir>/lseg_feature/<img>.npy`` maps ([h, w, clip_dim] float32) — the
exact artifact `palettenerf_tpu/data/palette_provider.py` consumes.

Backends (``--backend``):
  clipseg   CIDAS/clipseg-rd64-refined via transformers — dense CLIP-aligned
            features from the decoder trunk. Needs the pretrained weights
            locally (offline envs without them get a clear error, the same
            posture as the reference, which runs LSeg in its own env).
  stub      deterministic random-projection of local RGB statistics; no
            weights needed. For pipeline tests and smoke runs only.

Usage:
  python scripts/extract_lseg_feature.py <datadir> [--clip_dim 16]
      [--resolution 360] [--backend clipseg] [--split train]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _frames(datadir: str, split: str):
    for name in (f"transforms_{split}.json", "transforms.json"):
        p = os.path.join(datadir, name)
        if os.path.exists(p):
            with open(p) as f:
                t = json.load(f)
            out = []
            for fr in t["frames"]:
                fp = fr["file_path"]
                cand = [os.path.join(datadir, fp)] + [
                    os.path.join(datadir, fp + ext)
                    for ext in (".png", ".jpg", ".jpeg")]
                hit = next((c for c in cand if os.path.exists(c)), None)
                if hit:
                    out.append(hit)
            return out
    return sorted(glob.glob(os.path.join(datadir, "train", "*.png")))


def _load_rgb(path: str, res: int):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img.ndim == 3 and img.shape[-1] >= 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB if img.shape[-1] == 3
                           else cv2.COLOR_BGRA2RGB)
    else:
        img = np.repeat(img[..., None], 3, -1)
    h, w = img.shape[:2]
    scale = res / max(h, w)
    img = cv2.resize(img, (max(1, round(w * scale)), max(1, round(h * scale))),
                     interpolation=cv2.INTER_AREA)
    return img.astype(np.float32) / np.float32(255.0)


def _stub_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic dense features from multi-scale local RGB statistics.

    A fixed random projection of (rgb, 2 blur octaves, gradient magnitude) —
    spatially smooth and color-discriminative like real embeddings, so the
    PCA + ingestion pipeline is exercised realistically."""
    import cv2

    feats = [img]
    for k in (5, 17):
        feats.append(cv2.GaussianBlur(img, (k, k), 0))
    gx = cv2.Sobel(img, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(img, cv2.CV_32F, 0, 1)
    feats.append(np.sqrt(gx * gx + gy * gy))
    stack = np.concatenate(feats, -1)                       # [h, w, 12]
    rng = np.random.default_rng(1234)
    proj = rng.standard_normal((stack.shape[-1], dim)).astype(np.float32)
    return np.tanh(stack @ proj)


def _clipseg_model():
    try:
        import torch
        from transformers import CLIPSegForImageSegmentation, CLIPSegProcessor
    except ImportError as e:  # pragma: no cover - env without torch
        raise SystemExit(f"clipseg backend needs torch+transformers: {e}")
    name = os.environ.get("CLIPSEG_MODEL", "CIDAS/clipseg-rd64-refined")
    try:
        proc = CLIPSegProcessor.from_pretrained(name)
        model = CLIPSegForImageSegmentation.from_pretrained(name).eval()
    except Exception as e:
        raise SystemExit(
            f"clipseg weights unavailable ({e}); in offline environments run "
            "the dump where the model is cached, or use --backend stub. The "
            "reference runs its LSeg dump in a separate env the same way "
            "(readme.md:81-85).")
    import torch

    @torch.no_grad()
    def run(img: np.ndarray) -> np.ndarray:
        inputs = proc(images=[(img * 255).astype(np.uint8)], return_tensors="pt")
        out = model.clip.vision_model(inputs["pixel_values"],
                                      output_hidden_states=True)
        tokens = out.last_hidden_state[0, 1:]              # [n_patch, C]
        n = int(np.sqrt(tokens.shape[0]))
        fmap = tokens.reshape(n, n, -1).float().numpy()
        import cv2
        return cv2.resize(fmap, (img.shape[1], img.shape[0]),
                          interpolation=cv2.INTER_LINEAR)

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("datadir")
    ap.add_argument("--clip_dim", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=360,
                    help="long-side resolution of the saved maps (the provider "
                         "bilinearly resizes to the training res)")
    ap.add_argument("--backend", choices=["clipseg", "stub"], default="clipseg")
    ap.add_argument("--split", default="train")
    ap.add_argument("--suffix", default="",
                    help="output dir suffix: lseg_feature_<suffix>")
    args = ap.parse_args(argv)

    paths = _frames(args.datadir, args.split)
    if not paths:
        raise SystemExit(f"no frames found under {args.datadir}")
    extract = (_stub_features if args.backend == "stub" else _clipseg_model())

    maps = []
    for i, p in enumerate(paths):
        img = _load_rgb(p, args.resolution)
        maps.append(np.asarray(extract(img), np.float32))
        print(f"[{i + 1}/{len(paths)}] {os.path.basename(p)} -> {maps[-1].shape}",
              flush=True)

    # PCA fit over ALL frames' pixels to clip_dim, like the reference's joint
    # PCA (extract_lseg_feature.py: 512 -> 16 dims across the scene)
    flat = np.concatenate([m.reshape(-1, m.shape[-1]) for m in maps], 0)
    mean = flat.mean(0)
    sample = flat[:: max(1, flat.shape[0] // 200000)] - mean
    _, _, vt = np.linalg.svd(sample, full_matrices=False)
    basis = vt[: args.clip_dim].T                          # [C, clip_dim]

    out_dir = os.path.join(args.datadir,
                           "lseg_feature" + (f"_{args.suffix}" if args.suffix else ""))
    os.makedirs(out_dir, exist_ok=True)
    for p, m in zip(paths, maps):
        red = (m.reshape(-1, m.shape[-1]) - mean) @ basis
        red = red.reshape(*m.shape[:2], args.clip_dim).astype(np.float32)
        base = os.path.splitext(os.path.basename(p))[0]
        np.save(os.path.join(out_dir, base + ".npy"), red)
    print(f"wrote {len(maps)} maps to {out_dir} (dim {args.clip_dim})")


if __name__ == "__main__":
    main()
