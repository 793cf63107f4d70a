"""RGBXY palette extraction orchestrator.

Port of ``palette/utils.py:167-254`` (palette_extraction): coarse 2^3-bin histogram
thresholded at tau -> K, weighted KMeans on the fine 2^5-bin histogram, hull
simplification to the palette, then Tan18 star-tetra weights on the 32^3 bin-center
grid -> ``hist_weights.npz`` [32,32,32,P] + ``palette.npz``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .histogram import compute_rgb_histogram
from .hull import hull_simplification
from .tan18 import star_tetra_weights


def run_kmeans(n_clusters: int, points: np.ndarray, init: np.ndarray, sample_weight: np.ndarray):
    """Weighted kmeans, clusters sorted by total weight desc (palette/utils.py:148-165)."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, init=init, n_init=1).fit(points, sample_weight=sample_weight)
    centers, labels = km.cluster_centers_, km.labels_
    w = np.array([sample_weight[labels == i].sum() for i in range(n_clusters)])
    order = np.argsort(-w)
    return centers[order], w[order]


def save_palette_image(palette_rgb: np.ndarray, path: str, cell: int = 50):
    """Palette swatch strip (get_bigger_palette_to_show analog)."""
    img = np.ones((cell, len(palette_rgb) * cell, 3))
    for i, c in enumerate(palette_rgb):
        img[:, i * cell:(i + 1) * cell] = c
    try:
        from PIL import Image

        Image.fromarray((img * 255).round().clip(0, 255).astype(np.uint8)).save(path)
    except Exception:
        pass


def write_palette_txt(palette_rgb: np.ndarray, path: str):
    lines = [f"{c[0]} {c[1]} {c[2]}" for c in palette_rgb]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def palette_extraction(
    inputs: dict,
    output_dir: str,
    tau: float = 8e-3,
    palette_size: Optional[int] = None,
    normalize_input: bool = False,
    error_thres: float = 5.0 / 255.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """inputs = {'colors': [N,3] in [0,1]}; writes palette.npz + hist_weights.npz.

    Returns (palette_rgb [P,3], hist_weights [32,32,32,P]).
    """
    assert palette_size is None or palette_size >= 4
    os.makedirs(output_dir, exist_ok=True)
    prefix = os.path.join(output_dir, "extract")

    colors = np.asarray(inputs["colors"], np.float32).reshape(-1, 3)
    weights = np.ones(len(colors), np.float32)
    assert (weights >= 0).all()

    # coarse histogram -> K init centers
    bw_c, bc_c = compute_rgb_histogram(colors, weights, bits_per_channel=3)
    total = bw_c.sum()
    bw_c = bw_c / total
    keep = bw_c > tau
    bw_c, bc_c = bw_c[keep], bc_c[keep]

    # fine histogram -> weighted points
    bw_f, bc_f = compute_rgb_histogram(colors, weights, bits_per_channel=5)
    nz = bw_f > 0
    bw_f_nz = bw_f[nz] / total
    bc_f_nz = bc_f[nz]

    centers, center_weights = run_kmeans(len(bw_c), bc_f_nz, bc_c, bw_f_nz)

    palette_rgb = hull_simplification(
        centers.astype(np.float64),
        pixel_counts=center_weights,
        error_thres=error_thres,
        target_size=palette_size,
    )

    # per-bin mixing weights over the full 32^3 grid
    hist_rgb = bc_f.astype(np.float64)  # all bin centers, including empty
    if normalize_input:
        hist_rgb = hist_rgb + 0.05
        hist_rgb = hist_rgb / np.linalg.norm(hist_rgb, axis=-1, keepdims=True)
    hist_weights = star_tetra_weights(hist_rgb, palette_rgb, order=0)
    hist_weights = hist_weights.reshape(32, 32, 32, palette_rgb.shape[0])

    save_palette_image(palette_rgb, prefix + "-palette.png")
    write_palette_txt(palette_rgb, prefix + "-palette.txt")
    np.savez(os.path.join(output_dir, "palette.npz"), palette=palette_rgb)
    np.savez(os.path.join(output_dir, "hist_weights.npz"), hist_weights=hist_weights)
    return palette_rgb, hist_weights
