"""palettenerf_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of PaletteNeRF.

Three-stage workflow, matching the reference (zfkuang/PaletteNeRF readme.md:50-54):
  1. ``-m nerf``    : train an Instant-NGP NeRF            (main_nerf.py)
  2. ``-m extract`` : RGBXY convex-hull palette extraction (main_palette.py --extract_palette)
  3. ``-m palette`` : train PaletteNeRF + recolor/edit      (main_palette.py)

Layout:
  ops/        TPU compute kernels (hash grid, SH, marching, compositing, occupancy)
  models/     NeRF / PaletteNeRF networks as functional param pytrees
  render/     volume renderers (train + eval paths)
  data/       dataset providers + ray sampling
  train/      trainers, metrics, checkpointing
  extraction/ RGBXY palette extraction (host-side NumPy/SciPy)
  parallel/   device-mesh sharding helpers
  native/     C++ host-side helpers (histogram, point-triangle distance)
"""

__version__ = "0.1.0"

from .config import Config

__all__ = ["Config", "__version__"]
