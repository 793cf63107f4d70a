"""Stage-level timing of the exact eval path at real chunk shapes.

Times (on the attached chip) each stage of render_nerf_eval in isolation at the
render_image chunk shape (16384 rays), so optimization effort goes where the
frame time actually is: the candidate march (incl. its top_k compaction), the
field eval (hash encode + MLPs), and the composite. Timing rule: N reps, one
trailing scalar readback (tunnel: block_until_ready does not sync).
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from palettenerf_tpu.utils.jax_setup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.models.nerf import NeRFSpec, nerf_forward
from palettenerf_tpu.ops.march import march_rays
from palettenerf_tpu.ops.composite import composite_rays
from palettenerf_tpu.ops.rays import near_far_from_aabb
from palettenerf_tpu.train.trainer import Trainer

CHUNK = 16384
S = 192

cfg = Config(path="data_proc/proc_toys", O=True, fp16=True, cuda_ray=True,
             preload=True, bound=1.0, scale=0.8, dt_gamma=0.0, min_near=0.05,
             bg_radius=0, test=True)
spec = NeRFSpec.build(bound=cfg.bound, bg_radius=cfg.bg_radius, fp16=True,
                      log2_hashmap_size=cfg.log2_hashmap_size,
                      grid_levels=cfg.grid_levels,
                      grid_level_dim=cfg.grid_level_dim)
tr = Trainer("ngp", cfg, spec, workspace="results/proc_toys/version_1",
             use_checkpoint="latest", mute=True)
params = tr.eval_params()
ds = NeRFDataset(cfg, type="test")
data = next(iter(ds.iter_epoch()))
ro = jnp.asarray(np.asarray(data["rays_o"]).reshape(-1, 3)[:CHUNK])
rd = jnp.asarray(np.asarray(data["rays_d"]).reshape(-1, 3)[:CHUNK])
aabb = jnp.asarray([-1., -1., -1., 1., 1., 1.], jnp.float32)
nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.min_near)


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile+sync
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s}: {dt:8.2f} ms", flush=True)
    return out


for gname, fine in (("train128", 0), ("fine256", 256)):
    if fine:
        tr.opt = cfg.replace(eval_fine_grid=fine)
        tr._fine_bitfield = None
    bf = tr._eval_bitfield()  # train bits, or (train, fine) pair
    print(f"--- grid {gname} ---", flush=True)

    march_j = jax.jit(lambda ro, rd, nears, fars, bf: march_rays(
        ro, rd, nears, fars, bf, 1.0, 1, 128, 0.0, 512, S, None,
        fine_grid_size=fine))
    m = timeit(f"march 512cand->{S} ({gname})", march_j, ro, rd, nears, fars, bf)
    nvalid = int(m.mask.sum())
    print(f"  valid samples: {nvalid} ({nvalid / CHUNK:.1f}/ray)", flush=True)

    # march WITHOUT the top_k slot compaction (occupancy test only) — isolates
    # the top_k cost inside the march
    def march_notopk(ro, rd, nears, fars, bf):
        from palettenerf_tpu.ops.march import SQRT3, candidate_ts, _fine_occ_and
        from palettenerf_tpu.ops.occupancy import occ_lookup
        bf, fine_bf = bf if isinstance(bf, tuple) else (bf, None)
        dt_min = 2.0 * SQRT3 / 512
        ts = candidate_ts(nears, 512, dt_min, 2.0 * SQRT3 / 128, 0.0)
        xyz = jnp.clip(ro[:, None, :] + ts[..., None] * rd[:, None, :], -1, 1)
        cell = jnp.clip((0.5 * (xyz + 1.0) * 128).astype(jnp.int32), 0, 127)
        flat = cell[..., 0] * 128 * 128 + cell[..., 1] * 128 + cell[..., 2]
        occ = occ_lookup(bf, flat)
        if fine_bf is not None:
            occ = _fine_occ_and(occ, fine_bf, fine, xyz,
                                jnp.full_like(ts, dt_min), 1.0, None, 1)
        return occ & (ts < fars[:, None])

    timeit(f"march no-topk ({gname})", jax.jit(march_notopk),
           ro, rd, nears, fars, bf)

    fwd = jax.jit(lambda p, x, d: nerf_forward(p, spec, x, d))
    dirs = jnp.broadcast_to(rd[:, None, :], m.xyzs.shape)
    timeit(f"field eval {CHUNK}x{S}", fwd, params,
           m.xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    for B in (1 << 18, 1 << 17, 1 << 16):
        timeit(f"field eval compact {B}", fwd, params,
               m.xyzs.reshape(-1, 3)[:B], dirs.reshape(-1, 3)[:B])

    sig = jnp.where(m.mask, 5.0, 0.0)
    rgbv = jnp.ones(m.xyzs.shape, jnp.float32) * 0.5
    timeit("composite", jax.jit(lambda s, r: composite_rays(
        s, r, m.dts, m.t_cum, m.mask, 1e-2)), sig, rgbv)

