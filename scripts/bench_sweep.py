"""Ad-hoc sweep-renderer timing on the attached TPU (axon).

Timing uses host readbacks (float(...)) — block_until_ready lies on axon.
Usage: python scripts/bench_sweep.py [R] [U] [H] [P]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
U = int(sys.argv[2]) if len(sys.argv) > 2 else 512
H = int(sys.argv[3]) if len(sys.argv) > 3 else 800
P = int(sys.argv[4]) if len(sys.argv) > 4 else 6

import jax
import jax.numpy as jnp

from palettenerf_tpu.render.baking import BakedVolume
from palettenerf_tpu.render.sweep import build_sweep_volume, render_sweep
from palettenerf_tpu.render.palette_renderer import make_region_edit
from test_sweep import look_at_pose

print(f"devices: {jax.devices()}  R={R} U={U} H={H} P={P}")

rng = np.random.default_rng(0)
lin = np.linspace(-1, 1, R, dtype=np.float32)
g2 = lin[:, None, None] ** 2 + lin[None, :, None] ** 2 + lin[None, None, :] ** 2
density = (30.0 * np.exp(-g2 / 0.18)).astype(np.float32)
density[g2 > 0.8] = 0.0  # ~ realistic empty fraction


def tiled(shape_tail, lo, hi):
    """Cheap pseudo-random volume: tile a small random block (content is irrelevant
    to timing; shapes/dtypes are what matter)."""
    blk = rng.uniform(lo, hi, (16, R, R) + shape_tail).astype(np.float32)
    return jnp.asarray(np.broadcast_to(blk[None], (R // 16, 16, R, R) + shape_tail)
                       .reshape((R, R, R) + shape_tail))


om = rng.uniform(0.01, 1, (16, R, R, P)).astype(np.float32)
om /= om.sum(-1, keepdims=True)
om = jnp.asarray(np.broadcast_to(om[None], (R // 16, 16, R, R, P)).reshape(R, R, R, P))
baked = BakedVolume(
    R, 1.0,
    jnp.asarray(density),
    tiled((3,), 0, 1),
    om,
    tiled((3 * P,), -0.1, 0.1),
    tiled((), -0.5, 1.5),
)
t0 = time.time()
sv = build_sweep_volume(baked)
_ = float(jnp.sum(sv.vols[0][0, 0, 0]))
print(f"pack: {time.time()-t0:.2f}s  vol bytes/axis: {sv.vols[0].nbytes/1e6:.0f}MB "
      f"occ frac: {float(np.asarray(sv.occ[0]).mean()):.2f}")

bc = np.clip(rng.uniform(0, 1, (P, 3)), 0, 1)
edit = make_region_edit(P, clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
edit = edit._replace(delta_hsv=jnp.asarray([[120.0, 1.0, 1.0]] * P))
intr = (H * 0.9, H * 0.9, H / 2, H / 2)

for tag, kw in [("plain", {}), ("edited", dict(edit=edit))]:
    pose = look_at_pose((0.0, 0.3, -2.6))
    t0 = time.time()
    out = render_sweep(sv, pose, intr, H, H, u_res=U, basis_color=bc, **kw)
    _ = float(out["image"].sum())
    print(f"{tag}: compile+first {time.time()-t0:.2f}s")

    # steady state over several poses (same axis -> no recompile)
    ts = []
    for i in range(6):
        pose = look_at_pose((0.3 * np.sin(i), 0.3, -2.6))
        t0 = time.time()
        out = render_sweep(sv, pose, intr, H, H, u_res=U, basis_color=bc, **kw)
        _ = float(out["image"][0, 0, 0])
        ts.append(time.time() - t0)
    ts = sorted(ts)[:4]
    ms = 1000 * np.mean(ts)
    print(f"{tag}: {ms:.1f} ms/frame  -> {1000/ms:.2f} FPS  ({H}x{H}, U={U})")
