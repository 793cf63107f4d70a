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
    """Dilated GLOBAL coarse occupancy mip for hierarchical empty-space tests.

    One [Hs^3] supergrid over the full scene extent (the top cascade's frame,
    ±2^(cascade-1)): supercell (X, Y, Z) is set iff ANY cascade's occupied fine
    cell intersects it or a 3^3 neighbour (conservative dilation). Because the
    reference marcher may test a sample at ANY mip level ≥ its position mip
    (``mip_from_dt``, raymarching.cu:45-57), a sound coarse skip must cover all
    cascades at once — hence the OR across cascades. Cascade c covers ±2^c with
    H^3 cells, so its cells block-reduce into supercells by the integer ratio
    ``factor * 2^(cascade-1-c)`` and land in the centered ``H/ratio``-cell
    sub-cube of the supergrid. Packed uint8 [(H/f)^3 // 8].

    A candidate group whose representative point lies in an empty dilated
    supercell is guaranteed empty as long as every group member is within one
    supercell size of the representative — checked per group in
    ``_march_rays_hier`` (static for dt_gamma=0, dynamic otherwise).
    """
    H = grid_size
    Hs = H // factor
    bits = jnp.unpackbits(bitfield, bitorder="little")
    occ = bits.reshape(cascade, H, H, H)
    sup = jnp.zeros((Hs, Hs, Hs), jnp.uint8)
    for c in range(cascade):
        r = factor * 2 ** (cascade - 1 - c)
        if r > H:  # cascade grid smaller than one supercell: give up (caller
            return None  # must gate on this via super_bitfield_ok)
        blk = occ[c].reshape(H // r, r, H // r, r, H // r, r).max(axis=(1, 3, 5))
        side = H // r
        o = (Hs - side) // 2
        sup = sup.at[o:o + side, o:o + side, o:o + side].max(blk.astype(jnp.uint8))
    # 3^3 dilation via three separable edge-clamped axis max-pools
    for ax in (0, 1, 2):
        n = sup.shape[ax]
        lo = jnp.take(sup, jnp.clip(jnp.arange(n) - 1, 0, n - 1), axis=ax)
        hi = jnp.take(sup, jnp.clip(jnp.arange(n) + 1, 0, n - 1), axis=ax)
        sup = jnp.maximum(sup, jnp.maximum(lo, hi))
    return packbits_u8(sup.reshape(-1))


def super_bitfield_ok(bound: float, grid_size: int, cascade: int,
                      factor: int = SUPER_FACTOR) -> bool:
    """Static soundness gate for the hierarchical march.

    The global supermip's cascade-frame alignment needs ``bound == 2^(cascade-1)``
    (the reference's own convention: cascade = 1 + ceil(log2 bound) makes mip c
    cover ±min(2^c, bound); a fractional bound mis-sizes the top frame), and
    every cascade's block-reduce ratio must fit the grid.
    """
    if cascade > 1 and abs(bound - 2 ** (cascade - 1)) > 1e-6:
        return False
    return factor * 2 ** (cascade - 1) <= grid_size


def packbits_u8(occ):
    bits = occ.reshape(-1, 8).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights[None, :]).sum(axis=-1, dtype=jnp.uint8)


def _fine_occ_and(occ, fine_bitfield, fine_grid_size: int, xyz, dts,
                  mip_bound, lvl, cascade: int):
    """AND a dt-aware fine-bitfield test into a coarse occupancy result.

    The candidate march tests occupancy only at positions spaced ``dt`` apart,
    so a culling grid is sound only where ``dt <= cell edge`` (otherwise a step
    can skip straight over an occupied cell — the same reasoning as the
    reference's ``mip_from_dt``, raymarching.cu:45-57, which coarsens the test
    grid as dt grows). Samples whose step is too coarse for the fine grid fall
    back to the coarse (train) bitfield result, which ``bake_fine_bitfield``
    guarantees is a superset. Exact-conservative for every (max_steps,
    fine_grid) combination.
    """
    Ff = fine_grid_size
    mb = jnp.asarray(mip_bound, jnp.float32)
    safe = dts <= 2.0 * mb / Ff
    denom = mb[..., None] if mb.ndim else mb
    cell_f = jnp.clip((0.5 * (xyz / denom + 1.0) * Ff).astype(jnp.int32),
                      0, Ff - 1)
    flat_f = cell_f[..., 0] * (Ff * Ff) + cell_f[..., 1] * Ff + cell_f[..., 2]
    if cascade > 1:
        flat_f = lvl * (Ff ** 3) + flat_f
    return occ & (occ_lookup(fine_bitfield, flat_f) | ~safe)


def _march_rays_hier(rays_o, rays_d, t0, fars, bitfield, sup_bitfield, bound: float,
                     H: int, K: int, S: int, dt_min: float, dt_max: float,
                     dt_gamma: float, cascade: int, g: int, Sg: int,
                     fine_bitfield=None, fine_grid_size: int = 0,
                     ) -> MarchResult:
    """Two-phase hierarchical march (any dt_gamma / cascade).

    Phase 1 tests one dilated GLOBAL supercell per GROUP of ``g`` consecutive
    candidates (K/g coarse gathers/ray instead of K), compacts the first ``Sg``
    passing groups, then phase 2 occupancy-tests only their ``Sg*g`` member
    candidates at each member's own mip level (exact flat-path semantics).
    Gather rows drop from K to K/g + Sg*g (~3x for the default schedules).

    Soundness with adaptive stepping: the coarse skip is valid only while every
    group member stays within one supercell size of the group midpoint. With
    ``dt_gamma > 0`` the span grows along the ray, so each group carries a
    dynamic ``safe`` bit — unsafe (far-field, dt ~ dt_max) groups are forced to
    PASS the coarse test and get fine-tested like the flat path would. Output
    is bit-identical to the flat path whenever <= Sg groups pass.
    """
    N = rays_o.shape[0]
    Hs = H // SUPER_FACTOR
    Kg = K // g
    H3 = H ** 3

    if dt_gamma > 0:
        ts_all = candidate_ts(t0, K, dt_min, dt_max, dt_gamma)          # [N, K]
        tg = ts_all.reshape(N, Kg, g)
        t_first, t_last = tg[:, :, 0], tg[:, :, -1]
        t_mid = 0.5 * (t_first + t_last)
    else:
        # uniform stepping: everything is closed-form in the group index —
        # no [N, K] candidate materialisation, no gathers (round-3 fast path)
        i_g = jnp.arange(Kg, dtype=jnp.float32)[None, :]
        t_first = t0[:, None] + (i_g * g) * dt_min
        t_last = t_first + (g - 1) * dt_min
        t_mid = t_first + (g - 1) * 0.5 * dt_min

    # ---- phase 1: group-midpoint supercell tests (global frame, all cascades)
    xyz_rep = jnp.clip(rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :],
                       -bound, bound)
    cell_s = jnp.clip((0.5 * (xyz_rep / bound + 1.0) * Hs).astype(jnp.int32),
                      0, Hs - 1)
    flat_s = cell_s[..., 0] * (Hs * Hs) + cell_s[..., 1] * Hs + cell_s[..., 2]
    sup_occ = occ_lookup(sup_bitfield, flat_s)
    if dt_gamma > 0:
        supercell = 2.0 * bound / Hs
        safe = (t_last - t_first) * 0.5 <= supercell                    # [N, Kg]
        gmask = (sup_occ | ~safe) & (t_first < fars[:, None])           # [N, Kg]
    else:
        # static span bound already checked by the march_rays gate
        gmask = sup_occ & (t_first < fars[:, None])                     # [N, Kg]

    # ---- compact first Sg passing groups (slot order == ray order)
    kg_idx = jnp.arange(Kg, dtype=jnp.int32)[None, :]
    gscore = jnp.where(gmask, Kg - kg_idx, 0)
    gvals, _ = jax.lax.top_k(gscore, Sg)                                # [N, Sg]
    gslot = gvals > 0
    kept_g = jnp.where(gslot, Kg - gvals, 0)                            # [N, Sg]

    # ---- phase 2: fine occupancy on member candidates (own mip level each)
    if dt_gamma > 0:
        t_f = jnp.take_along_axis(
            tg, kept_g[..., None], axis=1).reshape(N, Sg * g)           # [N, Sg*g]
    else:
        j = jnp.arange(g, dtype=jnp.float32)[None, None, :]
        t_f = (t0[:, None, None]
               + (kept_g.astype(jnp.float32)[..., None] * g + j) * dt_min
               ).reshape(N, Sg * g)                                     # [N, Sg*g]
    dt_f = (jnp.clip(t_f * dt_gamma, dt_min, dt_max) if dt_gamma > 0
            else jnp.full_like(t_f, dt_min))
    xyz = jnp.clip(rays_o[:, None, :] + t_f[..., None] * rays_d[:, None, :],
                   -bound, bound)
    if cascade > 1:
        lvl = mip_level(xyz, dt_f, H, cascade)
        mip_bound = jnp.minimum(jnp.exp2(lvl.astype(jnp.float32)), bound)
        cell = jnp.clip((0.5 * (xyz / mip_bound[..., None] + 1.0) * H
                         ).astype(jnp.int32), 0, H - 1)
        flat = lvl * H3 + cell[..., 0] * (H * H) + cell[..., 1] * H + cell[..., 2]
    else:
        lvl, mip_bound = None, bound
        cell = jnp.clip((0.5 * (xyz / bound + 1.0) * H).astype(jnp.int32), 0, H - 1)
        flat = cell[..., 0] * (H * H) + cell[..., 1] * H + cell[..., 2]
    occ = occ_lookup(bitfield, flat)
    if fine_bitfield is not None and fine_grid_size > 0:
        occ = _fine_occ_and(occ, fine_bitfield, fine_grid_size, xyz, dt_f,
                            mip_bound, lvl, cascade)
    fmask = (occ & (t_f < fars[:, None])
             & jnp.repeat(gslot, g, axis=-1))                           # [N, Sg*g]

    # ---- final sample compaction (fine set is t-ascending by construction)
    kf = jnp.arange(Sg * g, dtype=jnp.int32)[None, :]
    score = jnp.where(fmask, Sg * g - kf, 0)
    top_vals, _ = jax.lax.top_k(score, min(S, Sg * g))
    if Sg * g < S:  # tiny group budget: pad the sample slots
        top_vals = jnp.pad(top_vals, ((0, 0), (0, S - Sg * g)))
    slot_mask = top_vals > 0
    kept_k = jnp.where(slot_mask, Sg * g - top_vals, 0)

    t_kept = jnp.take_along_axis(t_f, kept_k, axis=1)
    dt_kept = (jnp.clip(t_kept * dt_gamma, dt_min, dt_max) if dt_gamma > 0
               else jnp.full_like(t_kept, dt_min))
    xyz_kept = jnp.clip(
        rays_o[:, None, :] + t_kept[..., None] * rays_d[:, None, :], -bound, bound)
    t_cum = jnp.where(slot_mask, t_kept + dt_kept - t0[:, None], 0.0)
    return MarchResult(
        xyzs=jnp.where(slot_mask[..., None], xyz_kept, 0.0),
        dts=jnp.where(slot_mask, dt_kept, 0.0),
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
    sup_bitfield=None, # optional dilated global supercell mip
                       # (build_super_bitfield) — enables the 2-phase
                       # hierarchical test (any dt_gamma / cascade)
    max_groups: int = 0,  # candidate-group slots for the hierarchical test
    fine_grid_size: int = 0,  # eval-only finer culling grid (bake_fine_bitfield):
                       # pass bitfield=(train_bits, fine_bits); the fine test
                       # applies only where dt <= fine cell edge (dt-aware
                       # fallback to the train grid keeps every config sound)
) -> MarchResult:
    if isinstance(bitfield, (tuple, list)):
        bitfield, fine_bitfield = bitfield
    else:
        fine_bitfield = None
    H = grid_size
    H3 = H ** 3
    N = rays_o.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascade - 1)) / H

    t0 = nears
    if noise is not None:
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    if (sup_bitfield is not None and max_groups > 0
            and super_bitfield_ok(bound, H, cascade)):
        g = 8
        if max_steps % g == 0:
            # dt_gamma == 0: the group span is static; require it within the
            # dilation radius up front (with dt_gamma > 0 the per-group
            # dynamic ``safe`` bit inside _march_rays_hier handles this)
            if dt_gamma > 0 or (g - 1) * dt_min * 0.5 <= SUPER_FACTOR * 2.0 * bound / H:
                return _march_rays_hier(
                    rays_o, rays_d, t0, fars, bitfield, sup_bitfield, bound, H,
                    max_steps, num_samples, dt_min, dt_max, dt_gamma, cascade,
                    g, min(max_groups, max_steps // g),
                    fine_bitfield, fine_grid_size)

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
    if fine_bitfield is not None and fine_grid_size > 0:
        occ = _fine_occ_and(occ, fine_bitfield, fine_grid_size, xyz, dts,
                            mip_bound, lvl, cascade)
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
