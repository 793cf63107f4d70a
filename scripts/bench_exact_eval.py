"""Exact-path frame timing on the trained proc_toys checkpoint (one test view)."""
import sys, time, dataclasses
import numpy as np
sys.path.insert(0, ".")
from palettenerf_tpu.utils.jax_setup import setup_jax
setup_jax()

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.models.nerf import NeRFSpec
from palettenerf_tpu.train.trainer import Trainer

cfg = Config(path="data_proc/proc_toys", O=True, fp16=True, cuda_ray=True,
             preload=True, bound=1.0, scale=0.8, dt_gamma=0.0, min_near=0.05,
             bg_radius=0, test=True)
spec = NeRFSpec.build(bound=cfg.bound, bg_radius=cfg.bg_radius, fp16=True,
                      log2_hashmap_size=cfg.log2_hashmap_size,
                      grid_levels=cfg.grid_levels,
                      grid_level_dim=cfg.grid_level_dim)
tr = Trainer("ngp", cfg, spec, workspace="results/proc_toys/version_1",
             use_checkpoint="latest", mute=True)
ds = NeRFDataset(cfg, type="test")
data = next(iter(ds.iter_epoch()))
ro = np.asarray(data["rays_o"]).reshape(-1, 3)
rd = np.asarray(data["rays_d"]).reshape(-1, 3)
H, W = data["H"], data["W"]
print(f"frame {H}x{W} = {ro.shape[0]} rays", flush=True)

# (name, eval_fine_grid, eval-settings overrides)
variants = [
    ("exact plain", 0, dict(compaction_rounds=(), compact_frac=0.0)),
    ("rounds(default)", 0, dict(compact_frac=0.0)),
    ("rounds+compact3/8", 0, dict(compact_frac=0.375)),
    ("fine256 plain", 256, dict(compaction_rounds=(), compact_frac=0.0)),
    ("fine256+rounds", 256, dict(compact_frac=0.0)),
    ("fine256+r+c1/8", 256, dict(compact_frac=0.125)),
    ("fine256+r+c1/16", 256, dict(compact_frac=0.0625)),
    ("fine512+r+c1/16", 512, dict(compact_frac=0.0625)),
    ("fine512+r+c1/32", 512, dict(compact_frac=0.03125)),
    # hierarchical 2-phase march on top (exact when <= Sg groups pass per ray;
    # the PSNR-vs-golden column below is the empirical exactness check)
    ("fine256+r+c1/8+h32", 256, dict(compact_frac=0.125, march_groups=32)),
    ("fine512+r+c1/32+h32", 512, dict(compact_frac=0.03125, march_groups=32)),
]
gold = None
base_eval = tr.eval_settings
for name, fine, kw in variants:
    tr.opt = dataclasses.replace(cfg, eval_fine_grid=fine)
    tr._fine_bitfield = None
    tr.eval_settings = dataclasses.replace(base_eval, fine_grid_size=fine, **kw)
    tr._build_jit_fns()
    out = tr.render_image(ro, rd)          # compile + warm (+ fine bake)
    t0 = time.perf_counter()
    out = tr.render_image(ro, rd)
    dt = time.perf_counter() - t0
    img = out["image"].reshape(H, W, 3)
    if gold is None:
        gold = img
        ps = "  (golden)"
    else:
        mse = float(np.mean((img - gold) ** 2))
        ps = f"  PSNR vs exact: {10*np.log10(1.0/max(mse,1e-12)):.2f} dB"
    print(f"{name:20s}: {dt:7.2f} s/frame{ps}", flush=True)
