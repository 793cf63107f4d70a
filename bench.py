"""Benchmark harness — prints ONE JSON line for the driver.

Measures 800x800 eval-render throughput of the NeRF pipeline on the attached chip
(rays/sec and FPS). Baseline target (BASELINE.md): >= 30 FPS at 800x800 palette-edited
rendering; ``vs_baseline`` = measured_fps / 30.

Uses a randomly-initialized model with a sphere-shaped occupancy field (~8% cells
occupied) — representative of a converged Blender scene's occupancy rate, so marching +
MLP work matches real workloads. Switches to the palette renderer once that stage lands.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_scene(bound=1.0, occupancy_radius=0.5):
    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
    from palettenerf_tpu.ops.occupancy import packbits
    from palettenerf_tpu.render.nerf_renderer import RenderSettings

    spec = NeRFSpec.build(bound=bound)
    params = init_nerf(jax.random.PRNGKey(0), spec)

    H = 128
    r = (2 * (np.arange(H) + 0.5) / H - 1) * bound
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    occ = (X ** 2 + Y ** 2 + Z ** 2) < occupancy_radius ** 2
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))

    settings = RenderSettings(
        bound=bound, cascade=1, grid_size=H, dt_gamma=0.0,
        max_steps=512, num_samples=64, t_thresh=1e-2, min_near=0.2,
        # alive-ray compaction: all rays get 16 samples, top 1/4 continue for 16,
        # top 1/16 finish with 32 (static analog of the reference's alive-ray loop)
        compaction_rounds=((1, 16), (4, 16), (16, 32)),
        use_pallas_composite=False,  # compaction path uses its own fused scan
    )
    return spec, params, bitfield, settings


def camera_rays(H=800, W=800, fov_deg=60.0, radius=1.5):
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / f, -(j - H / 2) / f, -np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # camera at +z looking to origin
    R = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    eye = np.asarray([0, 0, radius], np.float32)
    rd = (dirs @ R.T).reshape(-1, 3).astype(np.float32)
    ro = np.broadcast_to(eye, rd.shape).astype(np.float32).copy()
    return ro, rd


def main():
    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.render.nerf_renderer import render_nerf_eval

    spec, params, bitfield, settings = build_scene()
    H = W = 800
    ro, rd = camera_rays(H, W)
    chunk = 100_000  # 800*800 = 6.4 chunks? -> use 64e4/8 = 80k even split
    chunk = 80_000
    n_chunks = (H * W) // chunk

    @jax.jit
    def render_chunk(params, bitfield, ro, rd):
        out = render_nerf_eval(params, spec, bitfield, ro, rd, settings)
        return out["image"], out["depth"], out["image"].sum()

    ro_d = jnp.asarray(ro).reshape(n_chunks, chunk, 3)
    rd_d = jnp.asarray(rd).reshape(n_chunks, chunk, 3)

    # warmup / compile (scalar readback is the only reliable sync on tunneled platforms:
    # block_until_ready can return before remote execution completes)
    img, dep, s = render_chunk(params, bitfield, ro_d[0], rd_d[0])
    _ = float(s)

    n_frames = 2
    t0 = time.perf_counter()
    for _ in range(n_frames):
        for c in range(n_chunks):
            img, dep, s = render_chunk(params, bitfield, ro_d[c], rd_d[c])
        _ = float(s)  # host readback forces full completion of the frame
    dt = (time.perf_counter() - t0) / n_frames

    fps = 1.0 / dt
    rays_per_sec = H * W / dt
    print(json.dumps({
        "metric": "nerf_eval_render_800x800",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "rays_per_sec": round(rays_per_sec),
        "samples_per_ray": settings.num_samples,
    }))


if __name__ == "__main__":
    main()
