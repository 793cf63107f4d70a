"""Ad-hoc sweep-renderer timing on the attached TPU (axon).

Timing uses host readbacks (float(...)) — block_until_ready lies on axon. Volumes are
generated ON DEVICE (host->device upload through the tunnel is ~10 MB/s).
Usage: python scripts/bench_sweep.py "R,U,H,P[,occfrac]" [more configs...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from palettenerf_tpu.render.baking import BakedVolume
from palettenerf_tpu.render.sweep import build_sweep_volume, render_sweep
from palettenerf_tpu.render.palette_renderer import make_region_edit
from test_sweep import look_at_pose

print(f"devices: {jax.devices()}")

configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
    (256, 512, 800, 6)]


def make_sv(R, P):
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 5)
        lin = jnp.linspace(-1, 1, R)
        g2 = (lin[:, None, None] ** 2 + lin[None, :, None] ** 2
              + lin[None, None, :] ** 2)
        density = jnp.where(g2 > 0.8, 0.0, 30.0 * jnp.exp(-g2 / 0.18))
        diffuse = jax.random.uniform(ks[0], (R, R, R, 3))
        if P == 0:
            return density, diffuse, None, None, None
        om = jax.random.uniform(ks[1], (R, R, R, P), minval=0.01)
        om = om / om.sum(-1, keepdims=True)
        off = jax.random.uniform(ks[2], (R, R, R, 3 * P), minval=-0.1, maxval=0.1)
        rad = jax.random.uniform(ks[3], (R, R, R), minval=-0.5, maxval=1.5)
        return density, diffuse, om, off, rad

    t0 = time.time()
    density, diffuse, om, off, rad = gen(jax.random.PRNGKey(0))
    baked = BakedVolume(R, 1.0, density, diffuse, om, off, rad)
    sv = build_sweep_volume(baked)
    _ = float(jnp.sum(sv.vols[0][0, 0, 0]))
    print(f"  pack: {time.time()-t0:.1f}s occ: {float(np.asarray(sv.occ[0]).mean()):.2f}")
    return sv


for (R, U, H, P, *rest) in configs:
    print(f"--- R={R} U={U} H={H} P={P}")
    sv = make_sv(R, P)
    bc = np.clip(np.random.default_rng(0).uniform(0, 1, (max(P, 1), 3)), 0, 1)
    edit = make_region_edit(max(P, 1), clip_dim=1, mean_xyz=(0.2, 0.0, 0.0), std_xyz=0.4)
    edit = edit._replace(delta_hsv=jnp.asarray([[120.0, 1.0, 1.0]] * max(P, 1)))
    intr = (H * 0.9, H * 0.9, H / 2, H / 2)
    kw = dict(basis_color=bc, edit=edit) if P else {}

    pose = look_at_pose((0.0, 0.3, -2.6))
    t0 = time.time()
    out = render_sweep(sv, pose, intr, H, H, u_res=U, **kw)
    _ = float(out["image"].sum())
    print(f"  compile+first {time.time()-t0:.1f}s")

    # dispatch-inclusive: one frame per readback
    ts = []
    for i in range(6):
        pose = look_at_pose((0.3 * np.sin(i), 0.3, -2.6))
        t0 = time.time()
        out = render_sweep(sv, pose, intr, H, H, u_res=U, **kw)
        _ = float(out["image"][0, 0, 0])
        ts.append(time.time() - t0)
    ms = 1000 * np.mean(sorted(ts)[:4])
    print(f"  per-dispatch: {ms:.1f} ms/frame ({1000/ms:.2f} FPS)")

    # streaming: N frames in flight, readback once (the serving pattern);
    # repeat and take the min (tunnel load adds heavy-tailed noise)
    N, reps = 15, 3
    best = []
    for r in range(reps):
        outs = []
        t0 = time.time()
        for i in range(N):
            pose = look_at_pose((0.3 * np.sin(0.7 * i + r), 0.3, -2.6))
            outs.append(render_sweep(sv, pose, intr, H, H, u_res=U, **kw))
        _ = [float(o["image"][0, 0, 0]) for o in outs]
        best.append(1000 * (time.time() - t0) / N)
    ms = min(best)
    print(f"  streaming:    {ms:.1f} ms/frame ({1000/ms:.2f} FPS)  "
          f"reps={[f'{b:.0f}' for b in best]}")

# skip/unroll ablation (set ABLATE=1)
import os
if os.environ.get("ABLATE"):
    R, U, H, P = configs[0]
    sv = make_sv(R, P) if 'sv' not in dir() else sv
    for skip, unroll in [("none", 1), ("none", 4), ("slice", 1), ("block", 1), ("block", 4), ("block", 8)]:
        pose = look_at_pose((0.0, 0.3, -2.6))
        out = render_sweep(sv, pose, intr, H, H, u_res=U, skip=skip, unroll=unroll, **kw)
        _ = float(out["image"].sum())
        outs = []
        t0 = time.time()
        for i in range(8):
            pose = look_at_pose((0.3 * np.sin(0.7 * i), 0.3, -2.6))
            outs.append(render_sweep(sv, pose, intr, H, H, u_res=U, skip=skip, unroll=unroll, **kw))
        _ = [float(o["image"][0, 0, 0]) for o in outs]
        ms = 1000 * (time.time() - t0) / 8
        print(f"  skip={skip} unroll={unroll}: {ms:.1f} ms/frame ({1000/ms:.2f} FPS)")
