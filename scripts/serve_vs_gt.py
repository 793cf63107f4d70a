"""Serve-path quality vs ground truth (VERDICT #3 'Done' evidence).

1. Bake the trained proc_toys palette checkpoint (vd_bands=3, bitfield-masked).
2. render_sweep at every TEST pose -> PSNR vs the GT test images.
3. render_palette_eval (exact network path incl. view_dep) at the same poses
   -> PSNR vs GT, and sweep-vs-exact PSNR.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from palettenerf_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.models.palette import PaletteSpec
from palettenerf_tpu.render.baking import bake_palette, mask_with_bitfield
from palettenerf_tpu.render.sweep import build_sweep_volume, render_sweep
from palettenerf_tpu.train import checkpoint as ckpt_lib
from main_serve import find_checkpoint

def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))

ckpt = find_checkpoint("results_palette/proc_toys/version_1")
payload = ckpt_lib.load_checkpoint(ckpt)
params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
P = params["basis_color"].shape[0]
spec = PaletteSpec.build(bound=1.0, num_basis=P)
baked = bake_palette(params, spec, resolution=256, vd_bands=3)
gs = payload.get("grid_state")
if gs is not None and gs.get("bitfield") is not None:
    baked = mask_with_bitfield(baked, gs)  # linspace-correct map + 1-cell dilation
sv = build_sweep_volume(baked, sigma_thresh=1e-3)
bc = jnp.asarray(np.clip(np.asarray(params["basis_color"]), 0, 1), jnp.float32)
print("baked", flush=True)

cfg = Config(path="data_proc/proc_toys", bound=1.0, scale=0.8, dt_gamma=0.0,
             min_near=0.05, bg_radius=0, fp16=True)
ds = NeRFDataset(cfg, type="test")
from palettenerf_tpu.render.nerf_renderer import RenderSettings
from palettenerf_tpu.render.palette_renderer import render_palette_eval

bf = np.asarray(gs["bitfield"])
G = round(np.asarray(gs["density_grid"]).shape[-1] ** (1 / 3) + 1e-6)
eset = RenderSettings(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                      max_steps=512, num_samples=192, t_thresh=1e-2,
                      min_near=0.05, march_groups=48, compact_frac=0.375)
bitfield = jnp.asarray(bf[: G ** 3 // 8])

@jax.jit
def exact_chunk(ro, rd):
    out = render_palette_eval(params, spec, bitfield, ro, rd, eset,
                              bg_color=jnp.ones(3), gui_mode=True)
    return out["image"]

def exact_render(ro, rd, H, W, chunk=16384):
    outs = []
    for s in range(0, ro.shape[0], chunk):
        r1, r2 = ro[s:s + chunk], rd[s:s + chunk]
        pad = chunk - r1.shape[0]
        if pad:
            r1 = np.concatenate([r1, np.tile(r1[-1:], (pad, 1))])
            r2 = np.concatenate([r2, np.tile(r2[-1:], (pad, 1))])
        outs.append(np.asarray(exact_chunk(jnp.asarray(r1), jnp.asarray(r2)))[
            : chunk - pad if pad else chunk])
    return np.concatenate(outs).reshape(H, W, 3)

ps_sweep, ps_exact, ps_cross = [], [], []
for i, data in enumerate(ds.iter_epoch()):
    H, W = data["H"], data["W"]
    idx = data["index"]
    gt = np.asarray(ds.images[idx]).astype(np.float32)
    if gt.dtype != np.float32 or gt.max() > 1.5:
        gt = gt / 255.0
    gt = gt.reshape(H, W, -1)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
    pose = np.asarray(ds.poses[idx]).reshape(4, 4)
    intr = ds.intrinsics
    out = render_sweep(sv, pose, intr, H, W, u_res=448, basis_color=bc,
                       min_near=0.05)
    img = np.asarray(out["image"])
    ps_sweep.append(psnr(img, gt))
    line = f"view {i}: sweep-vs-GT {ps_sweep[-1]:.2f} dB"
    if i < 2:  # exact-path cross-check on 2 views (slower)
        ro = np.asarray(data["rays_o"]).reshape(-1, 3)
        rd = np.asarray(data["rays_d"]).reshape(-1, 3)
        t0 = time.perf_counter()
        ex = exact_render(ro, rd, H, W)
        dt = time.perf_counter() - t0
        ps_exact.append(psnr(ex, gt))
        ps_cross.append(psnr(img, ex))
        line += (f" | exact-vs-GT {ps_exact[-1]:.2f} dB | "
                 f"sweep-vs-exact {ps_cross[-1]:.2f} dB ({dt:.1f}s/frame)")
    print(line, flush=True)
print(f"sweep-vs-GT mean {np.mean(ps_sweep):.2f} dB over {len(ps_sweep)} views; "
      f"exact-vs-GT {np.mean(ps_exact):.2f}; sweep-vs-exact {np.mean(ps_cross):.2f}",
      flush=True)
