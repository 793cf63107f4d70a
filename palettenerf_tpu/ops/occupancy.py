"""Multi-cascade occupancy grid: density EMA state, bit packing, frustum culling.

TPU-native re-design of the reference density-grid machinery
(``nerf/renderer.py:90-103`` state, ``:467-561`` update_extra_state, ``:395-465``
mark_untrained_grid, and CUDA ``packbits`` ``raymarching/src/raymarching.cu:271-303``).

Differences from the reference, by design:
- **Linear cell layout** ``index = cas*H^3 + x*H^2 + y*H + z`` instead of Morton order
  (Morton only buys CUDA memory coalescing; linear indexing is cheaper to compute in a
  vectorized marcher). ``ops.morton`` still provides the Morton utilities.
- The grid state is a functional pytree threaded through jitted update fns, not module
  buffers.
- The periodic refresh re-queries *all* cells on a strided schedule instead of the
  reference's dynamic-shape "random + resampled occupied cells" pass
  (``nerf/renderer.py:511-537``) — same EMA semantics, static shapes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GridState(NamedTuple):
    """Occupancy state (all jnp arrays; shapes static given cascade & grid_size)."""

    density_grid: jnp.ndarray   # [CAS, H^3] f32; -1 marks untrained cells
    bitfield: jnp.ndarray       # [CAS*H^3//8] uint8, linear bit order
    mean_density: jnp.ndarray   # scalar f32
    iter_density: jnp.ndarray   # scalar int32


def init_grid_state(cascade: int, grid_size: int = 128) -> GridState:
    H3 = grid_size ** 3
    return GridState(
        density_grid=jnp.zeros((cascade, H3), jnp.float32),
        bitfield=jnp.zeros((cascade * H3 // 8,), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def packbits(occ: jnp.ndarray) -> jnp.ndarray:
    """bool/[0,1] [CAS*H^3] -> uint8 [CAS*H^3//8]; bit i of byte b = cell b*8+i.

    Mirrors kernel_packbits (raymarching.cu:271-303) with linear bit order.
    """
    bits = occ.reshape(-1, 8).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights[None, :]).sum(axis=-1, dtype=jnp.uint8)


def occ_lookup(bitfield: jnp.ndarray, cell_index: jnp.ndarray) -> jnp.ndarray:
    """Test occupancy bits for flat cell indices [...] -> bool [...]."""
    byte = bitfield[cell_index >> 3]
    return (byte >> (cell_index & 7).astype(jnp.uint8)) & 1 > 0


def cell_world_coords(cascade: int, grid_size: int, bound: float):
    """Static per-cascade world-space cell centers.

    Returns xyz [CAS, H^3, 3] and half_grid_size [CAS] following
    nerf/renderer.py:493-500: cells span [-(b - hgs), b - hgs] with b = min(2^cas, bound).
    """
    H = grid_size
    r = jnp.arange(H, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    unit = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [H^3, 3] in [0, H)
    unit = 2.0 * unit / (H - 1) - 1.0  # [-1, 1]
    xyzs = []
    hgs = []
    for cas in range(cascade):
        b = min(2.0 ** cas, bound)
        half = b / H
        xyzs.append(unit * (b - half))
        hgs.append(half)
    return jnp.stack(xyzs), jnp.asarray(hgs, jnp.float32)


def update_density_grid(
    state: GridState,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    bound: float,
    density_thresh: float,
    density_scale: float = 1.0,
    decay: float = 0.95,
    grid_size: int = 128,
    partial_fraction: int = 1,
    slab_index=None,
) -> GridState:
    """One density-grid refresh (EMA + repack). Jit-friendly; call every 16 steps.

    Queries the density network at cell centers + uniform jitter within the cell
    (nerf/renderer.py:485-507), EMA-updates ``max(old*decay, new)`` on cells where both
    old and new are >= 0 (``:545-546``), recomputes mean density and repacks the bitfield
    at ``min(mean_density, density_thresh)`` (``:552-553``).

    ``partial_fraction > 1`` refreshes only 1/fraction of the cells (the rotating slab
    ``slab_index``) — the static-shape analog of the reference's post-warmup partial
    update (nerf/renderer.py:511-537), cutting refresh cost by the same factor.
    """
    cascade = state.density_grid.shape[0]
    H3 = grid_size ** 3
    xyz, half = cell_world_coords(cascade, grid_size, bound)  # [CAS,H^3,3], [CAS]

    if partial_fraction <= 1:
        sel_xyz = xyz
    else:
        q = H3 // partial_fraction
        start = (slab_index % partial_fraction) * q
        sel_xyz = jax.lax.dynamic_slice(xyz, (0, start, 0), (cascade, q, 3))

    noise = jax.random.uniform(key, sel_xyz.shape, minval=-1.0, maxval=1.0)
    pts = sel_xyz + noise * half[:, None, None]
    sigmas = density_fn(pts.reshape(-1, 3)).reshape(cascade, -1) * density_scale
    tmp = sigmas.astype(jnp.float32)

    old = state.density_grid
    if partial_fraction <= 1:
        valid = old >= 0
        new_grid = jnp.where(valid, jnp.maximum(old * decay, tmp), old)
    else:
        q = H3 // partial_fraction
        start = (slab_index % partial_fraction) * q
        old_slab = jax.lax.dynamic_slice(old, (0, start), (cascade, q))
        new_slab = jnp.where(old_slab >= 0, jnp.maximum(old_slab * decay, tmp), old_slab)
        new_grid = jax.lax.dynamic_update_slice(old, new_slab, (0, start))

    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = packbits((new_grid > thresh).reshape(-1))
    return GridState(new_grid, bitfield, mean_density, state.iter_density + 1)


def bake_fine_bitfield(
    state: GridState,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bound: float,
    density_thresh: float,
    fine_size: int = 256,
    grid_size: int = 128,
    density_scale: float = 1.0,
    chunk: int = 1 << 19,
) -> jnp.ndarray:
    """Bake a FINER eval-time occupancy bitfield from the trained field.

    The train grid's cells (default 128^3 per cascade) are chunky relative to
    the march step (cell edge 2b/128 vs dt 2*sqrt(3)b/max_steps): every ray
    crossing an occupied cell pays ~2 field evals per cell even where sigma is
    only above threshold in a thin shell. Re-thresholding the field on a finer
    grid collapses march-valid samples to those shells — the dominant exact-eval
    cost (hash gathers per valid sample) drops with the occupied-cell volume.

    Semantics are a strict refinement of the reference's eval-time culling:
    - same threshold rule ``min(mean_density, density_thresh)``
      (nerf/renderer.py:552-553), applied at cell centers of the finer grid;
    - 3^3 max-dilation compensates center (vs jittered-EMA-max) sampling;
    - ANDed with the train bitfield upsampled to the fine resolution, so
      frustum-culled / EMA-culled regions stay culled (never LESS culling than
      the reference; strictly tighter inside occupied train cells).

    One-time host-driven bake (~CAS * F^3 density evals); eval-only — training
    keeps the EMA grid. Returns uint8 [CAS * F^3 // 8] in the marcher's linear
    bit order, used as ``march_rays(..., bitfield=(train_bits, fine_bits),
    fine_grid_size=F)`` — the marcher applies the fine test only where the
    step dt cannot skip a fine cell (dt-aware fallback to the train grid).
    """
    import numpy as np

    cascade = state.density_grid.shape[0]
    F = fine_size
    assert F % grid_size == 0, "fine grid must be a multiple of the train grid"
    rep = F // grid_size
    thresh = float(jnp.minimum(state.mean_density, density_thresh))

    xyz, _ = cell_world_coords(cascade, F, bound)  # [CAS, F^3, 3]
    flat = xyz.reshape(-1, 3)
    total = flat.shape[0]
    chunk = min(chunk, total)
    fn = jax.jit(lambda pts: (density_fn(pts) * density_scale) > thresh)
    occ = np.zeros((total,), bool)
    for s in range(0, total, chunk):
        pts = jax.lax.dynamic_slice(
            flat, (min(s, total - chunk), 0), (chunk, 3))  # static shape
        got = np.asarray(fn(pts))
        if s + chunk <= total:
            occ[s:s + chunk] = got
        else:
            occ[total - chunk:] = got
    occ = occ.reshape(cascade, F, F, F)

    # conservative 3^3 dilation (NumPy: shifted ORs along each axis)
    d = occ
    for ax in (1, 2, 3):
        shifted_fwd = np.roll(d, 1, axis=ax)
        shifted_bwd = np.roll(d, -1, axis=ax)
        # zero the wrapped borders
        idx_lo = [slice(None)] * 4
        idx_lo[ax] = slice(0, 1)
        idx_hi = [slice(None)] * 4
        idx_hi[ax] = slice(F - 1, F)
        shifted_fwd[tuple(idx_lo)] = False
        shifted_bwd[tuple(idx_hi)] = False
        d = d | shifted_fwd | shifted_bwd
    occ = d

    # refine-only: a fine cell is occupied only if its parent train cell is
    coarse_bits = np.unpackbits(
        np.asarray(state.bitfield), bitorder="little"
    ).astype(bool).reshape(cascade, grid_size, grid_size, grid_size)
    for ax in (1, 2, 3):
        coarse_bits = np.repeat(coarse_bits, rep, axis=ax)
    occ &= coarse_bits

    return packbits(jnp.asarray(occ.reshape(-1)))


def mark_untrained_grid(
    state: GridState,
    poses: jnp.ndarray,       # [B, 4, 4] c2w
    intrinsics,               # (fx, fy, cx, cy)
    bound: float,
    min_near: float = 0.2,
    filter_close_point: bool = False,
    grid_size: int = 128,
) -> GridState:
    """Mark cells never seen by any training camera with density -1.

    Port of nerf/renderer.py:395-465 (frustum coverage count + too-close filter).
    """
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    cascade = state.density_grid.shape[0]
    xyz, half = cell_world_coords(cascade, grid_size, bound)

    rot = poses[:, :3, :3]  # [B,3,3]
    trans = poses[:, :3, 3]  # [B,3]

    def one_cascade(cas_xyz, hgs):
        # cam = (xyz - t) @ R  (poses are c2w; world->cam via R^T, matching :443-444)
        cam = jnp.einsum("nc,bcd->bnd", cas_xyz, rot) - jnp.einsum("bc,bcd->bd", trans, rot)[:, None, :]
        mz = cam[..., 2] > 0
        mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + hgs * 2
        my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + hgs * 2
        seen = (mz & mx & my)
        count = seen.sum(axis=0)
        close = (seen & (cam[..., 2] < min_near)).sum(axis=0)
        if filter_close_point:
            close = close + (jnp.linalg.norm(cam, axis=-1) < min_near).sum(axis=0)
        return count, close

    counts, closes = jax.vmap(one_cascade)(xyz, half)
    covered = counts * (closes == 0)
    grid = jnp.where(covered == 0, -1.0, state.density_grid)
    return state._replace(density_grid=grid)
