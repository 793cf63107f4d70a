"""Fixed-width occupancy-guided ray marching — the TPU replacement for the CUDA
two-pass adaptive marcher.

The reference (``raymarching/src/raymarching.cu:315-493`` train, ``:907-1021`` infer)
walks each ray sequentially: step ``dt = clamp(t*dt_gamma, dt_min, dt_max)``, test the
occupancy bitfield at the mip level ``max(mip_from_pos, mip_from_dt)``, emit a sample if
occupied else skip to the next voxel boundary, compacting samples into a flat buffer with
``atomicAdd``. That shape-dynamic, divergent loop is hostile to XLA.

Key observation enabling the TPU design: **dt depends only on t**, so the reference's
sample positions are exactly a subsequence of the deterministic candidate sequence
``t_{k+1} = t_k + clamp(gamma*t_k, dt_min, dt_max)`` — the retained ones are those whose
cell is occupied. The recurrence has a closed form (three regimes: linear dt_min,
geometric growth, linear dt_max), so we can

1. materialize all K candidate ``t`` values per ray in closed form (no scan),
2. test occupancy of every candidate (vectorized bit gathers; XLA fuses the position
   math into the gather),
3. compact the first S occupied candidates per ray to a fixed ``[N, S]`` layout with a
   single ``top_k`` (slot order == t order), masking unused slots.

Everything is static-shape; the wasted work is only the cheap candidate *test*, while the
expensive MLP evaluation runs on exactly the S retained samples.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .occupancy import occ_lookup

SQRT3 = 1.7320508075688772


class MarchResult(NamedTuple):
    xyzs: jnp.ndarray    # [N, S, 3] sample positions (clamped to the AABB)
    dts: jnp.ndarray     # [N, S] integration step of each sample (deltas[:,0])
    t_cum: jnp.ndarray   # [N, S] cumulative real delta since t0 (for depth; == sum deltas[:,1])
    ts: jnp.ndarray      # [N, S] sample t values
    mask: jnp.ndarray    # [N, S] bool, slot holds a real sample


def candidate_ts(t0, num: int, dt_min: float, dt_max: float, dt_gamma: float):
    """Closed-form candidate sequence t_k, k in [0, num), per ray.

    t0: [N]; returns [N, num]. Matches the CUDA recurrence
    ``t += clamp(t*dt_gamma, dt_min, dt_max)`` (raymarching.cu:368,400) regime-exactly.
    """
    k = jnp.arange(num, dtype=jnp.float32)[None, :]  # [1, K]
    t0 = t0[:, None]
    if dt_gamma <= 0:
        return t0 + k * dt_min

    g = dt_gamma
    t_a = dt_min / g  # below: dt == dt_min
    t_b = dt_max / g  # above: dt == dt_max
    # phase 1: linear dt_min until t >= t_a
    n1 = jnp.ceil(jnp.maximum(t_a - t0, 0.0) / dt_min)
    t_s = t0 + n1 * dt_min
    # phase 2: geometric t *= (1+g) until t >= t_b
    log1pg = math.log1p(g)
    n2 = jnp.ceil(jnp.maximum(jnp.log(jnp.maximum(t_b / t_s, 1.0)), 0.0) / log1pg)
    t_e = t_s * jnp.exp(n2 * log1pg)
    # piecewise evaluation
    t_phase1 = t0 + k * dt_min
    t_phase2 = t_s * jnp.exp(jnp.maximum(k - n1, 0.0) * log1pg)
    t_phase3 = t_e + jnp.maximum(k - n1 - n2, 0.0) * dt_max
    return jnp.where(k <= n1, t_phase1, jnp.where(k <= n1 + n2, t_phase2, t_phase3))


def _float_exponent(x):
    """frexp-style exponent: x = m * 2^e with m in [0.5, 1). Exact via f32 bit tricks."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 126


def mip_level(xyz, dt, grid_size: int, cascade: int):
    """max(mip_from_pos, mip_from_dt) (raymarching.cu:45-57), clamped to [0, CAS-1]."""
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    e_pos = _float_exponent(mx)
    e_dt = _float_exponent(dt * grid_size * 0.5)
    lvl = jnp.maximum(e_pos, e_dt)
    return jnp.clip(lvl, 0, cascade - 1)


SUPER_FACTOR = 4  # occupancy supercell = 4^3 fine cells


def build_super_bitfield(bitfield, grid_size: int, cascade: int,
                         factor: int = SUPER_FACTOR):
    """Dilated coarse occupancy mip for hierarchical empty-space tests.

    Supercell (c, X, Y, Z) is set iff ANY fine cell within one supercell radius
    (3^3 supercell neighbourhood, i.e. a conservative dilation) is occupied at
    cascade c. A candidate group whose representative point lies in an empty
    dilated supercell is guaranteed empty as long as every group member is within
    ``factor * cell_size`` of the representative — the invariant ``march_rays``
    maintains for its group span. Packed uint8 [CAS*(H/f)^3 // 8].
    """
    H = grid_size
    Hs = H // factor
    bits = jnp.unpackbits(bitfield, bitorder="little")
    occ = bits.reshape(-1, Hs, factor, Hs, factor, Hs, factor)
    sup = occ.max(axis=(2, 4, 6)).astype(jnp.uint8)          # [CAS, Hs, Hs, Hs]
    # 3^3 dilation via three separable edge-clamped axis max-pools
    for ax in (1, 2, 3):
        n = sup.shape[ax]
        lo = jnp.take(sup, jnp.clip(jnp.arange(n) - 1, 0, n - 1), axis=ax)
        hi = jnp.take(sup, jnp.clip(jnp.arange(n) + 1, 0, n - 1), axis=ax)
        sup = jnp.maximum(sup, jnp.maximum(lo, hi))
    return packbits_u8(sup.reshape(-1))


def packbits_u8(occ):
    bits = occ.reshape(-1, 8).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights[None, :]).sum(axis=-1, dtype=jnp.uint8)


def _march_rays_hier(rays_o, rays_d, t0, fars, bitfield, sup_bitfield, bound: float,
                     H: int, K: int, S: int, dt_min: float, g: int, Sg: int
                     ) -> MarchResult:
    """Two-phase hierarchical march (uniform dt, single cascade).

    Phase 1 tests one dilated supercell per GROUP of ``g`` consecutive candidates
    (K/g coarse gathers/ray instead of K), compacts the first ``Sg`` passing
    groups, then phase 2 occupancy-tests only their ``Sg*g`` member candidates.
    Gather rows drop from K to K/g + Sg*g (~3x for the default schedules); output
    is bit-identical to the flat path whenever <= Sg groups pass (the dilated
    supercell test is conservative, see build_super_bitfield).
    """
    N = rays_o.shape[0]
    Hs = H // SUPER_FACTOR
    Kg = K // g

    # ---- phase 1: group-representative supercell tests
    i_g = jnp.arange(Kg, dtype=jnp.float32)[None, :]
    t_rep = t0[:, None] + (i_g * g + (g - 1) * 0.5) * dt_min           # [N, Kg]
    xyz_rep = jnp.clip(rays_o[:, None, :] + t_rep[..., None] * rays_d[:, None, :],
                       -bound, bound)
    cell_s = jnp.clip((0.5 * (xyz_rep / bound + 1.0) * Hs).astype(jnp.int32),
                      0, Hs - 1)
    flat_s = cell_s[..., 0] * (Hs * Hs) + cell_s[..., 1] * Hs + cell_s[..., 2]
    sup_occ = occ_lookup(sup_bitfield, flat_s)
    first_t = t0[:, None] + (i_g * g) * dt_min
    gmask = sup_occ & (first_t < fars[:, None])                        # [N, Kg]

    # ---- compact first Sg passing groups (slot order == ray order)
    kg_idx = jnp.arange(Kg, dtype=jnp.int32)[None, :]
    gscore = jnp.where(gmask, Kg - kg_idx, 0)
    gvals, _ = jax.lax.top_k(gscore, Sg)                                # [N, Sg]
    gslot = gvals > 0
    kept_g = jnp.where(gslot, Kg - gvals, 0)                            # [N, Sg]

    # ---- phase 2: fine occupancy on member candidates
    j = jnp.arange(g, dtype=jnp.float32)[None, None, :]
    t_f = (t0[:, None, None]
           + (kept_g.astype(jnp.float32)[..., None] * g + j) * dt_min)  # [N, Sg, g]
    t_f = t_f.reshape(N, Sg * g)
    xyz = jnp.clip(rays_o[:, None, :] + t_f[..., None] * rays_d[:, None, :],
                   -bound, bound)
    cell = jnp.clip((0.5 * (xyz / bound + 1.0) * H).astype(jnp.int32), 0, H - 1)
    flat = cell[..., 0] * (H * H) + cell[..., 1] * H + cell[..., 2]
    occ = occ_lookup(bitfield, flat)
    fmask = (occ & (t_f < fars[:, None])
             & jnp.repeat(gslot, g, axis=-1))                           # [N, Sg*g]

    # ---- final sample compaction (fine set is t-ascending by construction)
    kf = jnp.arange(Sg * g, dtype=jnp.int32)[None, :]
    score = jnp.where(fmask, Sg * g - kf, 0)
    top_vals, _ = jax.lax.top_k(score, S)
    slot_mask = top_vals > 0
    kept_k = jnp.where(slot_mask, Sg * g - top_vals, 0)

    t_kept = jnp.take_along_axis(t_f, kept_k, axis=1)
    xyz_kept = jnp.clip(
        rays_o[:, None, :] + t_kept[..., None] * rays_d[:, None, :], -bound, bound)
    t_cum = jnp.where(slot_mask, t_kept + dt_min - t0[:, None], 0.0)
    return MarchResult(
        xyzs=jnp.where(slot_mask[..., None], xyz_kept, 0.0),
        dts=jnp.where(slot_mask, dt_min, 0.0),
        t_cum=t_cum,
        ts=jnp.where(slot_mask, t_kept, 0.0),
        mask=slot_mask,
    )


def march_rays(
    rays_o,            # [N, 3]
    rays_d,            # [N, 3]
    nears,             # [N]
    fars,              # [N]
    bitfield,          # [CAS*H^3//8] uint8
    bound: float,
    cascade: int,
    grid_size: int,
    dt_gamma: float,
    max_steps: int,    # K: candidate count (reference max_steps, default 1024)
    num_samples: int,  # S: retained sample slots per ray
    noise=None,        # [N] in [0,1) perturbation, or None
    sup_bitfield=None, # optional dilated supercell mip (build_super_bitfield) —
                       # enables the 2-phase hierarchical test (dt_gamma=0 only)
    max_groups: int = 0,  # candidate-group slots for the hierarchical test
) -> MarchResult:
    H = grid_size
    H3 = H ** 3
    N = rays_o.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascade - 1)) / H

    t0 = nears
    if noise is not None:
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    if sup_bitfield is not None and max_groups > 0 and dt_gamma <= 0 and cascade == 1:
        g = 8
        span = (g - 1) * dt_min  # group extent around its midpoint is span/2
        # soundness: every group member must stay within one supercell size of the
        # representative (the dilation radius); otherwise fall back to flat tests
        if span * 0.5 <= SUPER_FACTOR * 2.0 * bound / H and max_steps % g == 0:
            return _march_rays_hier(
                rays_o, rays_d, t0, fars, bitfield, sup_bitfield, bound, H,
                max_steps, num_samples, dt_min, g,
                min(max_groups, max_steps // g))

    ts = candidate_ts(t0, max_steps, dt_min, dt_max, dt_gamma)  # [N, K]
    dts = jnp.clip(ts * dt_gamma, dt_min, dt_max)
    in_range = ts < fars[:, None]

    # occupancy test of every candidate (fused elementwise + bit gather)
    xyz = jnp.clip(rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :], -bound, bound)
    lvl = mip_level(xyz, dts, H, cascade)
    mip_bound = jnp.minimum(jnp.exp2(lvl.astype(jnp.float32)), bound)
    cell = jnp.clip(
        (0.5 * (xyz / mip_bound[..., None] + 1.0) * H).astype(jnp.int32), 0, H - 1
    )
    flat = lvl * H3 + cell[..., 0] * (H * H) + cell[..., 1] * H + cell[..., 2]
    occ = occ_lookup(bitfield, flat)
    mask = occ & in_range  # [N, K]

    # compact first S occupied candidates: top_k on (K - k) keeps ascending-k order
    K = max_steps
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    score = jnp.where(mask, K - k_idx, 0)
    top_vals, _ = jax.lax.top_k(score, num_samples)  # [N, S] descending => k ascending
    slot_mask = top_vals > 0
    kept_k = jnp.where(slot_mask, K - top_vals, 0)

    t_kept = jnp.take_along_axis(ts, kept_k, axis=1)
    dt_kept = jnp.clip(t_kept * dt_gamma, dt_min, dt_max)
    xyz_kept = jnp.clip(
        rays_o[:, None, :] + t_kept[..., None] * rays_d[:, None, :], -bound, bound
    )
    # cumulative real delta since t0: sum of deltas[:,1] == (t_j + dt_j) - t0
    t_cum = jnp.where(slot_mask, t_kept + dt_kept - t0[:, None], 0.0)

    return MarchResult(
        xyzs=jnp.where(slot_mask[..., None], xyz_kept, 0.0),
        dts=jnp.where(slot_mask, dt_kept, 0.0),
        t_cum=t_cum,
        ts=jnp.where(slot_mask, t_kept, 0.0),
        mask=slot_mask,
    )
