"""Stage breakdown of the exact per-ray eval frame (verdict round-4 item 3).

Times the components of one 16384-ray eval chunk on the trained stage-1
checkpoint — march (flat, fine-grid culled), the field eval at the compacted
batch sizes, the full jitted chunk, and full-frame variants — so the next
optimization targets the measured bottleneck instead of the assumed one.

Run on the attached chip:  python scripts/profile_exact_eval.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from palettenerf_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

DATA = "data_proc/proc_toys"
WS = "results/proc_toys/version_1"


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def time_fn(fn, *args, reps=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    import dataclasses

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.data.provider import NeRFDataset
    from palettenerf_tpu.models.nerf import NeRFSpec, nerf_forward
    from palettenerf_tpu.ops.march import march_rays
    from palettenerf_tpu.ops.rays import near_far_from_aabb
    from palettenerf_tpu.train.trainer import Trainer

    fine = int(os.environ.get("FINE", "256"))
    cfrac = float(os.environ.get("CFRAC", "0.125"))
    cfg = Config(path=DATA, O=True, fp16=True, cuda_ray=True, preload=True,
                 bound=1.0, scale=0.8, dt_gamma=0.0, min_near=0.05,
                 bg_radius=0, test=True, eval_fine_grid=fine,
                 eval_compact_frac=cfrac)
    spec = NeRFSpec.build(bound=cfg.bound, bg_radius=cfg.bg_radius, fp16=True,
                          log2_hashmap_size=cfg.log2_hashmap_size,
                          grid_levels=cfg.grid_levels,
                          grid_level_dim=cfg.grid_level_dim)
    tr = Trainer("ngp", cfg, spec, workspace=WS, use_checkpoint="latest",
                 mute=True)
    ds = NeRFDataset(cfg, type="test")
    data = next(iter(ds.iter_epoch()))
    ro_f = np.asarray(data["rays_o"]).reshape(-1, 3)
    rd_f = np.asarray(data["rays_d"]).reshape(-1, 3)

    # full frame (this is the bench_exact_eval number)
    t0 = time.perf_counter()
    tr.render_image(ro_f, rd_f)
    print(f"frame (cold, compile+fine-bake): {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    tr.render_image(ro_f, rd_f)
    full_s = time.perf_counter() - t0
    print(f"frame (warm): {full_s:.2f} s  "
          f"[fine={fine} cfrac={cfrac}]", flush=True)

    # one jitted chunk (what render_image dispatches 40x)
    params = tr.eval_params()
    bitfield = tr._eval_bitfield()
    ro = jnp.asarray(ro_f[:16384])
    rd = jnp.asarray(rd_f[:16384])
    bg = jnp.ones((3,), jnp.float32)
    ms = time_fn(lambda: tr._eval_chunk(params, bitfield, ro, rd, bg))
    print(f"eval_chunk [16384 rays]: {ms:.1f} ms  (x40 chunks = "
          f"{ms * 40 / 1000:.2f} s dispatch-side)", flush=True)

    # march only (flat, fine-culled), identical call to render_nerf_eval_compact's
    s = tr.eval_settings
    aabb = jnp.asarray([-s.bound] * 3 + [s.bound] * 3, jnp.float32)

    @jax.jit
    def march_only(ro, rd):
        nears, fars = near_far_from_aabb(ro, rd, aabb, s.min_near)
        s_total = sum(r for _, r in s.compaction_rounds) or s.num_samples
        m = march_rays(ro, rd, nears, fars, bitfield, s.bound, s.cascade,
                       s.grid_size, s.dt_gamma, s.max_steps, s_total, None,
                       fine_grid_size=s.fine_grid_size)
        return m.xyzs.sum() + m.mask.sum()

    ms = time_fn(march_only, ro, rd)
    print(f"march-only [16384 x K={s.max_steps} -> "
          f"{sum(r for _, r in s.compaction_rounds) or s.num_samples} slots]: "
          f"{ms:.1f} ms  (x40 = {ms * 40 / 1000:.2f} s)", flush=True)

    # field eval at the compacted batch sizes seen per chunk
    nf = jax.jit(lambda x, d: nerf_forward(params, spec, x, d)[0].sum())
    for batch in (32768, 131072, 262144):
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (batch, 3)),
                        jnp.float32)
        d = jnp.asarray(np.random.default_rng(1).normal(size=(batch, 3)),
                        jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ms = time_fn(nf, x, d)
        print(f"nerf_forward [{batch}]: {ms:.1f} ms "
              f"({batch / ms * 1e-3:.1f}M samples/s)", flush=True)

    # full-frame variants: no alive-ray rounds; bigger chunk
    for label, eset_kw, chunk in (
        ("no-compaction-rounds", {"compaction_rounds": ()}, 16384),
        ("chunk=65536", {}, 65536),
        ("chunk=65536 no-rounds", {"compaction_rounds": ()}, 65536),
    ):
        eset = dataclasses.replace(tr.eval_settings, **eset_kw)
        tr.eval_settings = eset
        tr._build_jit_fns()
        t0 = time.perf_counter()
        tr.render_image(ro_f, rd_f, chunk=chunk)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        tr.render_image(ro_f, rd_f, chunk=chunk)
        print(f"frame variant [{label}]: {time.perf_counter() - t0:.2f} s "
              f"(cold {cold:.1f})", flush=True)


if __name__ == "__main__":
    main()
