"""Split the stage-1 CLI epoch time into its device components.

bench.py's scanned train bench measures ~71 ms/step pure compute, but the CLI
epoch loop runs at ~400-500 ms/step wall. This times, with explicit scalar
readback syncs (block_until_ready does not sync through the axon tunnel):

  - one 16-step ``_scan_steps`` dispatch (the epoch loop's unit of work)
  - one full ``_update_grid`` refresh and one rotating partial refresh
  - EMA + checkpoint-save host cost
  - one full epoch via ``train_one_epoch_fast`` for the composite number

Run on the attached chip with the acceptance scene present:
  python scripts/profile_train_overhead.py [--iters 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_scalar(x):
    return float(np.asarray(x).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data_proc/proc_toys")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from palettenerf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.data.provider import NeRFDataset
    from palettenerf_tpu.models.nerf import NeRFSpec
    from palettenerf_tpu.train.trainer import Trainer

    cfg = Config(path=args.data, O=True, fp16=True, cuda_ray=True, preload=True,
                 bound=1.0, scale=0.8, dt_gamma=0.0, min_near=0.05, bg_radius=0,
                 fast_grad=True, stochastic_trilerp=True, grad_levels=8,
                 num_rays=4096, max_steps=512, train_samples_per_ray=64,
                 infer_samples_per_ray=192)
    spec = NeRFSpec.build(bound=cfg.bound, bg_radius=cfg.bg_radius, fp16=True,
                          fast_grad=True, stochastic_trilerp=True, grad_levels=8,
                          log2_hashmap_size=cfg.log2_hashmap_size,
                          grid_levels=cfg.grid_levels,
                          grid_level_dim=cfg.grid_level_dim)
    tr = Trainer("prof", cfg, spec, workspace="/tmp/prof_ws",
                 use_checkpoint="scratch", mute=True)
    ds = NeRFDataset(cfg, type="train")

    imgs = ds.images
    tr._dev_images = jnp.asarray(imgs.reshape(imgs.shape[0], -1, imgs.shape[-1]))
    tr._dev_poses = jnp.asarray(ds.poses)
    tr._dev_images_src = id(ds)
    intr = tuple(float(v) for v in ds.intrinsics)
    chunk = jnp.asarray(np.arange(16) % len(ds.poses))

    # ---- scan dispatch (16 steps)
    def run_scan():
        tr.key, k = jax.random.split(tr.key)
        tr.params, tr.opt_state, tr.ema_params, ls = tr._scan_steps(
            tr.params, tr.opt_state, tr.ema_params, tr.grid_state.bitfield,
            k, tr._dev_images, tr._dev_poses, chunk, intr, ds.H, ds.W)
        return ls

    ls = run_scan()
    sync_scalar(ls[-1])  # compile
    t0 = time.perf_counter()
    for _ in range(args.reps):
        ls = run_scan()
    sync_scalar(ls[-1])
    scan_ms = (time.perf_counter() - t0) / args.reps * 1000
    print(f"scan16 dispatch: {scan_ms:.1f} ms ({scan_ms/16:.1f} ms/step)")

    # ---- grid refresh (full + partial)
    # (uint8 scalar reads through the axon tunnel raise InvalidArgument —
    # sync via an int32 reduction instead)
    def sync_bits(gs):
        return sync_scalar(jnp.sum(gs.bitfield.astype(jnp.int32))[None])

    # _update_grid donates grid_state — thread it through every call
    tr.key, k = jax.random.split(tr.key)
    tr.grid_state = tr._update_grid(tr.params, tr.grid_state, k)
    sync_bits(tr.grid_state)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        tr.key, k = jax.random.split(tr.key)
        tr.grid_state = tr._update_grid(tr.params, tr.grid_state, k)
    sync_bits(tr.grid_state)
    full_ms = (time.perf_counter() - t0) / args.reps * 1000
    print(f"grid refresh (full): {full_ms:.1f} ms")

    if hasattr(tr, "_update_grid_partial"):
        tr.key, k = jax.random.split(tr.key)
        tr.grid_state = tr._update_grid_partial(tr.params, tr.grid_state, k,
                                                jnp.int32(1))
        sync_bits(tr.grid_state)
        t0 = time.perf_counter()
        for i in range(args.reps):
            tr.key, k = jax.random.split(tr.key)
            tr.grid_state = tr._update_grid_partial(tr.params, tr.grid_state,
                                                    k, jnp.int32(i))
        sync_bits(tr.grid_state)
        part_ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"grid refresh (partial 1/4): {part_ms:.1f} ms")

    # ---- checkpoint save host cost
    t0 = time.perf_counter()
    tr.save_checkpoint(best=False)
    print(f"checkpoint save: {(time.perf_counter() - t0)*1000:.0f} ms")

    # ---- composite epoch
    tr.global_step = 10_000  # past warmup: partial refresh path
    t0 = time.perf_counter()
    tr.train_one_epoch_fast(ds)
    n = len(ds.poses)
    ep_s = time.perf_counter() - t0
    print(f"epoch ({n} steps): {ep_s:.1f} s ({ep_s/n*1000:.0f} ms/step wall)")

    # ---- second epoch, per-phase decomposition (everything warm now)
    interval = cfg.update_extra_interval
    order = np.arange(n)
    intr2 = tuple(float(v) for v in ds.intrinsics)
    t_ref = t_scan = t_sync = 0.0
    t0 = time.perf_counter()
    for start in range(0, n, interval):
        chunk = order[start:start + interval]
        tr.key, k = jax.random.split(tr.key)
        ta = time.perf_counter()
        tr.grid_state = tr._refresh_grid(k)
        tb = time.perf_counter()
        tr.key, k = jax.random.split(tr.key)
        tr.params, tr.opt_state, tr.ema_params, ls = tr._scan_steps(
            tr.params, tr.opt_state, tr.ema_params, tr.grid_state.bitfield,
            k, tr._dev_images, tr._dev_poses, jnp.asarray(chunk),
            intr2, ds.H, ds.W)
        tc = time.perf_counter()
        sync_scalar(ls[-1:])
        td = time.perf_counter()
        t_ref += tb - ta
        t_scan += tc - tb
        t_sync += td - tc
        print(f"  chunk@{start:3d} (n={len(chunk)}): refresh {1e3*(tb-ta):6.1f} ms"
              f"  scan-dispatch {1e3*(tc-tb):6.1f} ms  sync {1e3*(td-tc):7.1f} ms")
    ep2 = time.perf_counter() - t0
    print(f"epoch2 ({n} steps): {ep2:.1f} s  [refresh {t_ref:.1f}s, "
          f"scan-dispatch {t_scan:.1f}s, sync {t_sync:.1f}s]")

    # ---- third epoch: train_one_epoch_fast again, now fully warm (separates
    # the tail-chunk compile in the first call from any queueing pathology)
    t0 = time.perf_counter()
    tr.train_one_epoch_fast(ds)
    ep3 = time.perf_counter() - t0
    print(f"epoch3 warm train_one_epoch_fast: {ep3:.1f} s "
          f"({ep3/n*1000:.0f} ms/step wall)")


if __name__ == "__main__":
    main()
