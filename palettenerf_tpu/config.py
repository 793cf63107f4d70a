"""Flat configuration dataclass mirroring the reference argparse surface.

The reference threads a single ``argparse.Namespace`` (``opt``) through every layer
(``main_nerf.py:16-70``, ``main_palette.py:16-101`` in the reference repo). We keep the
same flat field names so configs and shell scripts translate 1:1, but as a typed,
hashable dataclass that can be closed over by ``jax.jit``.

Fixes two latent flag bugs of the reference (fields read but never declared there):
``ablation_name`` (palette/provider.py:273) and ``sigma_color`` (palette/utils.py:511).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class Config:
    """All options for every stage (nerf / extract / palette).

    Field names follow the reference CLI flags (main_nerf.py:16-70, main_palette.py:16-101).
    """

    # positional
    path: str = ""

    # macro flag: -O == --fp16 --cuda_ray --preload (main_nerf.py:72-75)
    O: bool = False
    # macro flag: -O2 == -O plus the TPU fast-training profile
    # (--fast_grad --stochastic_trilerp --grad_levels 8)
    O2: bool = False

    test: bool = False
    workspace: str = "workspace"
    seed: int = 0
    version_id: int = -1

    # training
    iters: int = 30000
    lr: float = 1e-2
    ckpt: str = "latest"
    num_rays: int = 4096
    cuda_ray: bool = True  # kept for CLI parity; TPU build always uses grid marching
    max_steps: int = 1024
    num_steps: int = 512
    upsample_steps: int = 0
    update_extra_interval: int = 16
    max_ray_batch: int = 4096
    patch_size: int = 1

    # precision
    fp16: bool = False  # maps to bf16 compute on TPU

    # dataset
    color_space: str = "srgb"
    preload: bool = False
    bound: float = 2.0
    scale: float = 0.33
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    dt_gamma: float = 1.0 / 128.0
    min_near: float = 0.2
    density_thresh: float = 10.0
    bg_radius: float = -1.0
    no_bg: bool = False

    # GUI
    gui: bool = False
    W: int = 960
    H: int = 540
    radius: float = 5.0
    fovy: float = 50.0
    max_spp: int = 64

    # experimental
    error_map: bool = False
    clip_text: str = ""
    rand_pose: int = -1

    lambda_sparse: float = 0.05
    lambda_lpips: float = 0.0          # perceptual patch loss weight (needs patch_size>1;
                                       #  random-feature LPIPS, reference nerf/utils.py:542-550)
    filter_close_point: bool = False

    # ---- palette-stage options (main_palette.py:16-101) ----
    nerf_path: str = ""
    config: str = ""
    extract_palette: bool = False
    eval_compaction: bool = True       # alive-ray compaction rounds in NeRF eval renders
                                       # (reference nerf/renderer.py:336-386 semantics;
                                       #  ~3-4x faster full-frame renders, 35+ dB vs plain)
    extract_downscale: int = 1         # render training views at 1/N res for extraction
    extract_via_sweep: bool = False    # render extraction views with the baked
                                       # shear-warp sweep (~60 fps) instead of the
                                       # exact per-ray path; the RGBXY stats only
                                       # read the foreground mask + depth xyz
                                       # (palette statistics are resolution-insensitive)
    video: bool = False
    continue_training: bool = False
    update_grid: bool = False
    datatype: str = ""  # llff | blender | mip360 (test-view generation)
    use_initialization_from_rgbxy: bool = False
    num_basis: int = 4
    error_thres: float = 5.0 / 255.0
    use_normalized_palette: bool = False

    pred_clip: bool = False
    clip_dim: int = 16
    # latent-bug fixes: declared here (reference reads these but never defines them)
    ablation_name: str = ""
    sigma_color: float = 0.2

    random_size: int = 0  # paired-pixel sampling window for patch smoothness

    # palette loss weights (main_palette.py defaults)
    lambda_sparsity: float = 2e-4
    lambda_palette: float = 1e-3
    lambda_offsets: float = 3e-2
    lambda_view_dep: float = 1e-1
    lambda_weight: float = 5e-2
    lambda_smooth: float = 4e-3
    lambda_patchsmooth: float = 0.0
    smooth_sigma_xyz: float = 0.005
    smooth_sigma_color: float = 0.2
    smooth_sigma_clip: float = 0.0

    lweight_decay_epoch: int = 100
    max_freeze_palette_epoch: int = 100
    smooth_loss_start_epoch: int = 30

    # ---- TPU-rebuild-specific knobs (no reference analog) ----
    grid_size: int = 128
    train_samples_per_ray: int = 64    # S: compacted sample slots per ray (train)
    infer_samples_per_ray: int = 256   # S: compacted sample slots per ray (eval)
    log2_hashmap_size: int = 19        # per-level hash table size (reference default 19)
    grid_levels: int = 16              # hash-grid levels (reference default 16)
    grid_level_dim: int = 2            # features per level (reference default 2)
    grid_update_warmup: int = 256      # full-grid refreshes until this step, partial after
    fast_grad: bool = False            # nearest-corner hash backward (8x fewer scatter updates)
    stochastic_trilerp: bool = False   # train-only 1-corner MC hash forward (8x fewer gathers)
    grad_levels: int = 0               # hash backward: random level subset per step (0 = all)
    march_groups: int = -1             # hierarchical-march group slots (-1 = flat
                                       # everywhere, same as 0; >0 opts in — lossy
                                       # when more groups pass than slots: a default-on
                                       # train run diverged on the acceptance scene)
    gridtype: str = "hash"             # hash | tiled | hash_xadd (TPU pair-local hash)
    t_thresh_train: float = 1e-4
    t_thresh_infer: float = 1e-2
    eval_fine_grid: int = 0            # eval-only: bake a finer occupancy bitfield
                                       # from the trained field at this resolution
                                       # (multiple of grid_size; 256 typical; 0 = off).
                                       # Strict refinement of the train bitfield —
                                       # same threshold rule, dilated, ANDed with the
                                       # train grid (ops/occupancy.bake_fine_bitfield)
    eval_compact_frac: float = 0.0     # cross-ray valid-sample compaction for eval
                                       # field evals (0 = off; 0.375 typical)
    train_compact_frac: float = 0.0    # same for the train step (opt-in: overflow
                                       # drops samples from the gradient)
    mesh_shape: Tuple[int, ...] = (1,)  # data-parallel device mesh ("dp",)
    n_devices: int = 1                  # DP: shard the ray batch over this many chips
    ema_decay: float = 0.95
    eval_interval: int = 50
    max_keep_ckpt: int = 2
    ckpt_interval: int = -1            # rolling-save cadence in epochs; -1 resolves
                                       # per backend at train time: 5 on the tunneled
                                       # axon platform (a save reads ~150 MB of
                                       # param/opt state back through the tunnel, ~7 s)
                                       # and 1 (per-epoch, the reference cadence,
                                       # nerf/utils.py:941) on local TPU/CPU hosts;
                                       # final epoch always saves

    # derived
    @property
    def cascade(self) -> int:
        return 1 + max(0, math.ceil(math.log2(self.bound)))

    @property
    def fp16_enabled(self) -> bool:
        return self.fp16 or self.O

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_args(cls, args) -> "Config":
        """Build from an argparse Namespace (only copies known fields)."""
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in vars(args).items():
            if k in names:
                if k == "offset" and isinstance(v, list):
                    v = tuple(v)
                if k == "mesh_shape" and isinstance(v, list):
                    v = tuple(v)
                kw[k] = v
        cfg = cls(**kw)
        if cfg.O2:
            cfg = cfg.replace(O=True, fast_grad=True, stochastic_trilerp=True,
                              grad_levels=8 if cfg.grad_levels == 0 else cfg.grad_levels)
        if cfg.O or cfg.O2:
            cfg = cfg.replace(fp16=True, cuda_ray=True, preload=True)
        return cfg
