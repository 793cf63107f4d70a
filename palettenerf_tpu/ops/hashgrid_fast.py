"""TPU-optimized multiresolution hash encoding (custom-VJP formulation).

Same math as ``ops.hashgrid`` (the golden reference; construction rules parity-exact
with gridencoder/grid.py:92-133 and gridencoder.cu:36-72), but structured around the
measured cost model of XLA's TPU gather/scatter lowering (v5e, verified with forced
host syncs):

- gather cost   ~ O(rows fetched), ~175M rows/s, width-independent up to 16 f32/row
- scatter cost  ~ O(updates): XLA row scatter ([T,2] updates) ~23M upd/s; a FLAT
                1-D scatter ~85M upd/s; the sorted Pallas tile kernel
                (ops/pallas_scatter.py) 140-185M upd/s — the bf16 backward routes
                through it. ONE big scatter still beats many small ones, and cost
                does not grow with table size above 2^17 rows
- layout: any array whose minor dim is small (K=8 corners, C=2 features, L=16
  levels) gets lane-padded to 128 on TPU — intermediates must keep the huge M
  axis minor (the transposed [L, M] formulation below)

Consequences baked into this implementation:

1. Corner indices/weights for ALL levels are computed once, into a single global index
   array; the forward is ONE flat gather and the backward ONE flat scatter over the
   concatenated table (global indices).
2. For ``gridtype="hash_xadd"`` (x enters the hash additively, ops/hashgrid.py), the
   two x-corners of a cell are ADJACENT rows, so an overlapped pair table
   ``P[q] = [T[q], T[q+1]]`` (built per call with cheap per-level rolls) lets the
   forward fetch both x-corners as one wide row: 4 rows/sample/level exact instead
   of 8, and the x-interpolation stays exact even in stochastic mode.
3. Stochastic mode draws one corner (or one x-pair) per (sample, level) with
   probability equal to its interpolation weight — an unbiased Monte-Carlo estimate
   of the trilinear interpolation (E[T[c*]] = sum_c w_c T_c) that cuts gathers and
   scatter updates 8x (4x for pairs). The uniform variate comes from a caller-supplied
   PRNG draw when available (``rand``), falling back to a position hash (which is only
   decorrelated by march jitter — weak at coarse levels; pass ``rand`` for training).
4. ``grad_levels``: backward-only level subsampling — each step scatters gradients for
   a random subset of K levels scaled by L/K (unbiased in expectation, like gradient
   dropout). Cuts the dominant scatter cost by L/K. Forward is unaffected.
5. Cotangents are cast to ``scatter_dtype`` (bf16 halves scatter cost, mirroring the
   reference's fp16 atomicAdd accumulation, gridencoder.cu:226-313).

Verified against ``ops.hashgrid.hashgrid_encode`` in tests/test_hashgrid_fast.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hashgrid import HashGridSpec, _PRIMES


# --------------------------------------------------------------------------- indices


def _level_frac(spec: HashGridSpec, lvl: int, x):
    scale = spec.level_scale(lvl)
    pos = x * scale + (0.0 if spec.align_corners else 0.5)
    pg0 = jnp.floor(pos)
    return pg0.astype(jnp.int32), pos - pg0


def _corner_global_index(spec: HashGridSpec, lvl: int, pg):
    """Global (concatenated-table) index of integer coords pg [..., D] at ``lvl``."""
    D = spec.input_dim
    hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
    res = spec.resolutions[lvl]
    side = res if spec.align_corners else res + 1

    pg = pg.astype(jnp.uint32)
    strides = []
    s = 1
    for _ in range(D):
        strides.append(s if s <= hashmap_size else None)
        s *= side
    overflow = s > hashmap_size

    if overflow and spec.gridtype == "hash":
        h = jnp.zeros(pg.shape[:-1], jnp.uint32)
        for d in range(D):
            h = h ^ (pg[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
    elif overflow and spec.gridtype == "hash_xadd":
        mix = jnp.zeros(pg.shape[:-1], jnp.uint32)
        for d in range(1, D):
            mix = mix ^ (pg[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        h = pg[..., 0] + mix
    else:
        h = jnp.zeros(pg.shape[:-1], jnp.uint32)
        for d in range(D):
            if strides[d] is not None:
                h = h + pg[..., d] * jnp.uint32(strides[d])
    return (h % jnp.uint32(hashmap_size)).astype(jnp.int32) + spec.offsets[lvl]


def _level_indices(spec: HashGridSpec, lvl: int, x):
    """All-corner global indices + trilinear weights for one level.

    x [M, D] in [0,1] -> (idx [M, 2^D] int32, w [M, 2^D] f32).
    """
    D = spec.input_dim
    pg0, frac = _level_frac(spec, lvl, x)
    idxs, ws = [], []
    for corner in range(2 ** D):
        bits = [(corner >> d) & 1 for d in range(D)]
        pg = pg0 + jnp.array(bits, jnp.int32)
        w = jnp.ones(x.shape[:-1], jnp.float32)
        for d in range(D):
            w = w * jnp.where(bits[d], frac[..., d], 1.0 - frac[..., d])
        idxs.append(_corner_global_index(spec, lvl, pg))
        ws.append(w)
    return jnp.stack(idxs, -1), jnp.stack(ws, -1)


def _all_indices(spec: HashGridSpec, x01):
    """[M, L*2^D] global indices and weights for all levels (test/debug helper)."""
    idxs, ws = [], []
    for lvl in range(spec.num_levels):
        i, w = _level_indices(spec, lvl, x01)
        idxs.append(i)
        ws.append(w)
    return jnp.concatenate(idxs, -1), jnp.concatenate(ws, -1)


# ---------------------------------------------------------------- pair (overlap) table


def pair_table(table, spec: HashGridSpec):
    """[total, C] -> [total, 2C] overlapped x-pair view: row q = [T[q], T[q+1]].

    The +1 neighbour wraps within each level segment (matching the ``% hashmap_size``
    of the additive-x hash; linear levels never address a wrapping base row).
    """
    parts = []
    for lvl in range(spec.num_levels):
        seg = jax.lax.dynamic_slice_in_dim(
            table, spec.offsets[lvl], spec.offsets[lvl + 1] - spec.offsets[lvl], axis=0)
        parts.append(jnp.concatenate([seg, jnp.roll(seg, -1, axis=0)], axis=1))
    return jnp.concatenate(parts, axis=0)


# --------------------------------------------------------------------------- lottery


class EncodeRand(NamedTuple):
    """Per-call randomness for the stochastic paths (all traced arrays).

    u:    [M, L] uniforms for the corner lottery (None -> position-hash fallback).
    lvls: [K] int32 level subset for the backward scatter (None -> all levels).
    """

    u: Optional[jnp.ndarray] = None
    lvls: Optional[jnp.ndarray] = None


def make_encode_rand(key, n_samples: int, spec: HashGridSpec,
                     grad_levels: int = 0) -> EncodeRand:
    """Draw the per-step randomness for ``hashgrid_encode_fast`` from a PRNG key."""
    ku, kl = jax.random.split(key)
    u = jax.random.uniform(ku, (n_samples, spec.num_levels))
    lvls = None
    if grad_levels and grad_levels < spec.num_levels:
        lvls = jax.random.permutation(kl, spec.num_levels)[:grad_levels]
    return EncodeRand(u=u, lvls=lvls)


# --------------------------------------------------------------------------- encode

_ENCODE_CHUNK = 32768  # bounds gather-output materialization: XLA sometimes assigns a
# tiled (8,128) layout to the [M*L*K, C] gather result, whose 128-lane padding inflates
# it up to 64x in HBM; chunking via lax.map caps the worst case at ~2 GB per buffer.


def _level_constants(spec: HashGridSpec):
    """Per-level constants packed as [L]-shaped arrays so the index math for ALL
    levels runs as one [M, L]-shaped vector pass instead of a Python per-level
    loop of tiny 1-D ops (the loop form measured 38 ms of VPU overhead per
    262k-sample encode — more than the gather itself)."""
    L, D = spec.num_levels, spec.input_dim
    scales, sizes, offs, is_hash, strides = [], [], [], [], []
    for lvl in range(L):
        size = spec.offsets[lvl + 1] - spec.offsets[lvl]
        res = spec.resolutions[lvl]
        side = res if spec.align_corners else res + 1
        st, s = [], 1
        for _ in range(D):
            st.append(s if s <= size else 0)
            s *= side
        overflow = s > size
        scales.append(spec.level_scale(lvl))
        sizes.append(size)
        offs.append(spec.offsets[lvl])
        is_hash.append(bool(overflow and spec.gridtype in ("hash", "hash_xadd")))
        strides.append(st)
    return (jnp.asarray(scales, jnp.float32),
            jnp.asarray(sizes, jnp.uint32),
            jnp.asarray(offs, jnp.int32),
            jnp.asarray(is_hash),
            jnp.asarray(strides, jnp.uint32))


def _geom_T(spec: HashGridSpec, consts, xT):
    """xT [D, M] -> per-dim lists (pg0 [D][L, M] int32, frac [D][L, M] f32).

    TRANSPOSED layout: every per-level intermediate is [L, M] with the huge M axis
    minor (lane dimension). The earlier [M, L, K] formulation put K=8 on lanes,
    which TPU pads to 128 — a 16x HBM inflation that measured ~70 ms per 262k-sample
    encode. [L, M] arrays pack perfectly (L=16 sublanes, M lanes)."""
    scales = consts[0]
    shift = 0.0 if spec.align_corners else 0.5
    pg0, frac = [], []
    for d in range(spec.input_dim):
        pos = xT[d][None, :] * scales[:, None] + shift
        p0 = jnp.floor(pos)
        pg0.append(p0.astype(jnp.int32))
        frac.append(pos - p0)
    return pg0, frac


def _corner_index_T(spec: HashGridSpec, consts, pg):
    """pg [D] list of [L, M] int32 corner coords -> GLOBAL table indices [L, M].
    Same construction rules as ops.hashgrid._corner_index, vectorized over L."""
    _, sizes_u, offs_i, is_hash_b, strides_u = consts
    D = spec.input_dim
    pgu = [p.astype(jnp.uint32) for p in pg]
    lin = jnp.zeros(pgu[0].shape, jnp.uint32)
    for d in range(D):
        lin = lin + pgu[d] * strides_u[:, d][:, None]
    if spec.gridtype == "hash_xadd":
        mix = jnp.zeros(pgu[0].shape, jnp.uint32)
        for d in range(1, D):
            mix = mix ^ (pgu[d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        h = pgu[0] + mix
    else:
        h = jnp.zeros(pgu[0].shape, jnp.uint32)
        for d in range(D):
            h = h ^ (pgu[d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
    idx = jnp.where(is_hash_b[:, None], h, lin) % sizes_u[:, None]
    return idx.astype(jnp.int32) + offs_i[:, None]


def _col_perm(L: int, K: int):
    """Static permutation mapping [K*L]-major columns to level-major l*K+k order."""
    return jnp.asarray([k * L + lvl for lvl in range(L) for k in range(K)], jnp.int32)


def _encode_T(table, spec: HashGridSpec, x, u, stochastic: bool):
    """Encode a [Mc, D] block, transposed layout; handles both gridtypes.

    Residual formats (unchanged from the pre-transpose implementation, consumed
    by ``_bwd``): exact non-pair (idx [Mc, L*K], w [Mc, L*K], fx [Mc, 0]);
    exact pair (idx [Mc, L*P], w [Mc, L*P], fx [Mc, L]); stochastic non-pair
    (idx [Mc, L], w/fx empty); stochastic pair (idx [Mc, L], w empty,
    fx [Mc, 2L] = [fx | ux], ux driving the backward x-corner lottery).

    The stochastic corner draw is an in-loop inverse-CDF select (never builds a
    [*, K] stacked weight array): the LAST corner k with u >= sum_{j<k} w_j wins,
    identical to the previous cumsum/argmin formulation including the u>=1 clamp.
    """
    C, L, D = spec.level_dim, spec.num_levels, spec.input_dim
    pairs = spec.gridtype == "hash_xadd"
    d_lo = 1 if pairs else 0
    K = 2 ** (D - d_lo)
    Mc = x.shape[0]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    consts = _level_constants(spec)
    pg0, frac = _geom_T(spec, consts, x.T)
    src = pair_table(table, spec) if pairs else table
    fxT = frac[0] if pairs else None                               # [L, M]

    def corner_iw(corner):
        bits = [0] * d_lo + [(corner >> i) & 1 for i in range(D - d_lo)]
        w = jnp.ones((L, Mc), jnp.float32)
        for d in range(d_lo, D):
            w = w * (frac[d] if bits[d] else 1.0 - frac[d])
        return _corner_index_T(spec, consts, [pg0[d] + bits[d] for d in range(D)]), w

    def interp_rows(rows):
        """Gathered rows [L*M, Csrc] -> features [L, M, C] (x-interp for pairs)."""
        if pairs:
            rows = rows.reshape(L, Mc, 2 * C)
            fxe = fxT[..., None].astype(rows.dtype)
            return rows[..., :C] * (1 - fxe) + rows[..., C:] * fxe
        return rows.reshape(L, Mc, C)

    if stochastic:
        if u is None:
            # position-hash fallback: seed from the FINEST level's frac (highest
            # spatial frequency, least position correlation) but mix the level
            # index in so corner draws stay independent across levels (a shared
            # broadcast variate would perfectly correlate the joint-level draw)
            coef = jnp.asarray([12.9898, 78.233, 37.719][:D], jnp.float32)
            base = sum(frac[d][L - 1] * coef[d] for d in range(D))
            lvl = jnp.arange(L, dtype=jnp.float32)[:, None]
            s = jnp.sin(base[None, :] + lvl * 1.6180339887) * 43758.5453
            uT = s - jnp.floor(s)
        else:
            uT = u.T
        csum = jnp.zeros((L, Mc), jnp.float32)
        chosen = prev = wsel = None
        for corner in range(K):
            idx_k, w = corner_iw(corner)
            if corner == 0:
                chosen, prev, wsel = idx_k, csum, w
            else:
                sel = uT >= csum
                chosen = jnp.where(sel, idx_k, chosen)
                prev = jnp.where(sel, csum, prev)
                wsel = jnp.where(sel, w, wsel)
            csum = csum + w
        outT = interp_rows(src[chosen.reshape(-1)])
        out = jnp.where(oob[:, None], 0, outT.transpose(1, 0, 2).reshape(Mc, L * C))
        empty = jnp.zeros((Mc, 0), jnp.float32)
        if pairs:
            rem = jnp.clip((uT - prev) / jnp.maximum(wsel, 1e-9), 0.0, 1.0 - 1e-6)
            fx_ux = jnp.concatenate([fxT, rem], axis=0).T          # [Mc, 2L]
            return out, chosen.T, empty, fx_ux, oob
        return out, chosen.T, empty, empty, oob

    acc = jnp.zeros((L, Mc, C), table.dtype)
    idxs, ws = [], []
    for corner in range(K):
        idx_k, w = corner_iw(corner)
        acc = acc + interp_rows(src[idx_k.reshape(-1)]) * w[..., None].astype(table.dtype)
        idxs.append(idx_k)
        ws.append(w)
    out = jnp.where(oob[:, None], 0, acc.transpose(1, 0, 2).reshape(Mc, L * C))
    perm = _col_perm(L, K)
    idx = jnp.stack(idxs, 0).reshape(K * L, Mc).T[:, perm]
    w = jnp.stack(ws, 0).reshape(K * L, Mc).T[:, perm]
    fx = fxT.T if pairs else jnp.zeros((Mc, 0), jnp.float32)
    return out, idx, w, fx, oob


def _fwd_impl(table, x01, rand: EncodeRand, spec: HashGridSpec, stochastic: bool):
    D, C, L = spec.input_dim, spec.level_dim, spec.num_levels
    pairs = spec.gridtype == "hash_xadd"
    K = (1 if stochastic else 2 ** (D - 1)) if pairs else (1 if stochastic else 2 ** D)
    lead = x01.shape[:-1]
    x = x01.reshape(-1, D).astype(jnp.float32)
    M = x.shape[0]
    u = None if rand is None else rand.u
    if u is not None:
        u = u.reshape(-1, L)

    def enc(xc, uc):
        return _encode_T(table, spec, xc, uc, stochastic)

    if M <= _ENCODE_CHUNK:
        out, idx, w, fx, oob = enc(x, u)
    else:
        pad = (-M) % _ENCODE_CHUNK
        xp = jnp.concatenate([x, jnp.full((pad, D), 0.5, x.dtype)], 0) if pad else x
        n_chunks = xp.shape[0] // _ENCODE_CHUNK
        if u is not None:
            up = (jnp.concatenate([u, jnp.full((pad, L), 0.5, u.dtype)], 0)
                  if pad else u).reshape(n_chunks, _ENCODE_CHUNK, L)
            out, idx, w, fx, oob = jax.lax.map(
                lambda args: enc(args[0], args[1]),
                (xp.reshape(n_chunks, _ENCODE_CHUNK, D), up))
        else:
            out, idx, w, fx, oob = jax.lax.map(
                lambda xc: enc(xc, None), xp.reshape(n_chunks, _ENCODE_CHUNK, D))
        out = out.reshape(-1, L * C)[:M]
        idx = idx.reshape(-1, L * K)[:M]
        w = w.reshape(M + pad, -1)[:M]
        fx = fx.reshape(M + pad, -1)[:M]
        oob = oob.reshape(-1)[:M]

    return out.reshape(*lead, L * C), (idx, w, fx, oob, lead)


# ------------------------------------------------------------------------ custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def hashgrid_encode_fast(table, x01, rand: Optional[EncodeRand], spec: HashGridSpec,
                         scatter_dtype=None,
                         nearest_corner_grad: bool = False,
                         stochastic: bool = False,
                         grad_levels: int = 0):
    """table [total, C]; x01 [..., D] in [0,1] -> [..., L*C].

    Output matches ops.hashgrid.hashgrid_encode bit-for-bit in f32 (when
    ``stochastic`` is off). See the module docstring for the mode matrix.

    ``rand`` (traced, optional): per-call EncodeRand from ``make_encode_rand``.
    ``scatter_dtype`` (static): cotangent dtype for the backward scatter (bf16
    halves its cost; the forward gather stays in the table dtype).
    ``nearest_corner_grad`` (static): route each sample's gradient only to its
    max-weight corner (pair row for hash_xadd) per level — 8x (4x) fewer scatter
    updates, biased. Forward stays exact. Superseded by ``stochastic``.
    ``stochastic`` (static): Monte-Carlo corner draw, unbiased; training only.
    ``grad_levels`` (static): backward level subsampling (0 = all levels); needs
    ``rand.lvls`` (falls back to all levels when absent).
    """
    out, _ = _fwd_impl(table, x01, rand, spec, stochastic)
    return out


def _fwd(table, x01, rand, spec, scatter_dtype=None, nearest_corner_grad=False,
         stochastic=False, grad_levels=0):
    out, res = _fwd_impl(table, x01, rand, spec, stochastic)
    dtype_token = jnp.zeros((0,), table.dtype)  # residuals must be arrays
    lvls = None if rand is None else rand.lvls
    return out, (res, lvls, dtype_token)


def _scatter_global(idx_flat, upd, total_rows: int, cdtype, out_dtype, width: int):
    """One batched scatter-add: upd [U, width] (cast to cdtype) at rows idx_flat.

    bf16 cotangents route through the sorted Pallas tile kernel
    (ops/pallas_scatter.py): 140-185M upd/s on chip vs ~23M for XLA's row
    scatter and ~85M for a flat 1-D scatter. The f32 (exact) path keeps the
    flat 1-D XLA scatter (the kernel's MXU accumulation is bf16-valued)."""
    from .pallas_scatter import tile_scatter_add

    if jnp.dtype(cdtype) == jnp.bfloat16 and total_rows <= 256 * 256 * 128:
        vals = upd.astype(jnp.bfloat16).astype(jnp.float32)
        grad = tile_scatter_add(idx_flat, vals, total_rows,
                                interpret=jax.default_backend() != "tpu")
        return grad.astype(out_dtype)
    # Column-major flat scatter + [width, total] reshape + transpose: every step
    # is bitcast-compatible with the compact {0,1} layout of [total, width]. The
    # previous row-major form (idx*width + c, then reshape(total, width)) was only
    # bitcast-free in the row-major {1,0} layout, whose (8,128) tiling pads
    # width=2 to 128 — a 64x HBM blowup that propagated through the adam update
    # into the scan carry and OOM'd the exact-f32 train compile at 17.5 GB
    # (4 x 2.92 GB carry copies for a 46.7 MB table; round-4 on-chip finding,
    # repro: 3.13 GB -> 98.6 MB of HLO temps from this change alone).
    fidx = jnp.concatenate([c * total_rows + idx_flat for c in range(width)])
    fupd = jnp.concatenate([upd[:, c] for c in range(width)])
    grad = jnp.zeros((total_rows * width,), cdtype).at[fidx].add(fupd.astype(cdtype))
    return grad.reshape(width, total_rows).T.astype(out_dtype)


def _select_levels(arrs, lvls, L: int, K: int):
    """Slice per-level column blocks [*, L*K] (or [*, L]) down to the lvls subset."""
    outs = []
    for a, k in arrs:
        if k == 1:
            outs.append(a[:, lvls])
        else:
            cols = (lvls[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
            outs.append(a[:, cols])
    return outs


def _wrap_plus_one(idx2d, spec: HashGridSpec, lvl_ids):
    """Level-local +1 neighbour of global base indices idx2d [M, Leff], where
    column j belongs to level lvl_ids[j] (traced). Wraps within the level segment
    (the pair row's second half, matching ``pair_table``'s roll)."""
    offs = jnp.asarray(spec.offsets, jnp.int32)
    lo = offs[lvl_ids][None, :]
    size = (offs[lvl_ids + 1] - offs[lvl_ids])[None, :]
    return lo + (idx2d - lo + 1) % size


def _bwd(spec: HashGridSpec, scatter_dtype, nearest_corner_grad, stochastic,
         grad_levels, saved, g):
    (idx, w, fx, oob, lead), lvls, dtype_token = saved
    cdtype = scatter_dtype if scatter_dtype is not None else dtype_token.dtype
    D, C, L = spec.input_dim, spec.level_dim, spec.num_levels
    pairs = spec.gridtype == "hash_xadd"
    K = (2 ** (D - 1)) if pairs else (2 ** D)
    total = spec.total_params
    M = idx.shape[0]

    g = g.reshape(M, L, C)
    g = jnp.where(oob[:, None, None], 0, g)

    scale = 1.0
    use_lvls = grad_levels and grad_levels < L and lvls is not None
    if use_lvls:
        scale = L / float(grad_levels)
        Leff = int(grad_levels)
        g = g[:, lvls, :] * scale
        lvl_ids = lvls
    else:
        Leff = L
        lvl_ids = jnp.arange(L, dtype=jnp.int32)

    if stochastic:
        # one drawn row per (sample, level), C-wide updates only (C=2 scatters are
        # ~2.5x faster per update than C=4 on TPU). For pairs the forward realized
        # an exact x-interp; the backward routes each cotangent to ONE x-corner
        # drawn with probability (1-fx, fx) — an unbiased estimator of the pair
        # gradient using the ux variate carried in fx[..., 1] (see _encode_block_pair)
        if use_lvls:
            idx_s, = _select_levels([(idx, 1)], lvls, L, 1)
            fx_s = fx[:, lvls] if pairs else fx
            ux_s = fx[:, L + lvls] if pairs else None
        else:
            idx_s = idx
            fx_s = fx[:, :L] if pairs else fx
            ux_s = fx[:, L:] if pairs else None
        gm = g.reshape(M * Leff, C)
        if pairs:
            take_x1 = ux_s < fx_s                                   # P(x1) = fx
            idx_p1 = _wrap_plus_one(idx_s, spec, lvl_ids)
            idx_b = jnp.where(take_x1, idx_p1, idx_s).reshape(-1)
            grad = _scatter_global(idx_b, gm, total, cdtype, dtype_token.dtype, C)
            return grad, None, None
        grad = _scatter_global(idx_s.reshape(-1), gm, total, cdtype,
                               dtype_token.dtype, C)
        return grad, None, None

    # exact / nearest-corner paths
    if use_lvls:
        idx_s, w_s = _select_levels([(idx, K), (w, K)], lvls, L, K)
        fx_s = _select_levels([(fx, 1)], lvls, L, 1)[0] if pairs else fx
    else:
        idx_s, w_s, fx_s = idx, w, fx

    if nearest_corner_grad:
        w_lvl = w_s.reshape(M, Leff, K)
        best = jnp.argmax(w_lvl, axis=-1)                           # [M, Leff]
        idx_l = jnp.take_along_axis(idx_s.reshape(M, Leff, K), best[..., None],
                                    -1)[..., 0]                      # [M, Leff]
        gm = g.reshape(M * Leff, C)
        if pairs:
            # nearest corner includes the x axis: route to the closer x-corner
            idx_p1 = _wrap_plus_one(idx_l, spec, lvl_ids)
            idx_l = jnp.where(fx_s > 0.5, idx_p1, idx_l)
        grad = _scatter_global(idx_l.reshape(-1), gm, total, cdtype,
                               dtype_token.dtype, C)
        return grad, None, None

    gk = jnp.repeat(g, K, axis=1).reshape(M * Leff * K, C)          # [M*Leff*K, C]
    wf = w_s.reshape(M * Leff * K, 1)
    if pairs:
        # both x-corners of every base pair, as two C-wide update streams in ONE
        # scatter (C=2 updates are ~2.5x faster per update than C=4)
        fxf = jnp.repeat(fx_s, K, axis=-1).reshape(M * Leff * K, 1)
        idx_p1 = _wrap_plus_one(
            idx_s.reshape(M, Leff * K),
            spec, jnp.repeat(lvl_ids, K)).reshape(-1)
        idx_cat = jnp.concatenate([idx_s.reshape(-1), idx_p1], 0)
        upd_cat = jnp.concatenate([gk * wf * (1 - fxf), gk * wf * fxf], 0)
        grad = _scatter_global(idx_cat, upd_cat, total, cdtype,
                               dtype_token.dtype, C)
        return grad, None, None
    grad = _scatter_global(idx_s.reshape(-1), gk * wf, total, cdtype,
                           dtype_token.dtype, C)
    return grad, None, None


hashgrid_encode_fast.defvjp(_fwd, _bwd)


def hashgrid_encode_fast_bounded(table, x, spec: HashGridSpec, bound: float,
                                 scatter_dtype=None, nearest_corner_grad: bool = False,
                                 stochastic: bool = False, rand: EncodeRand = None,
                                 grad_levels: int = 0):
    return hashgrid_encode_fast(table, (x + bound) / (2.0 * bound), rand, spec,
                                scatter_dtype, nearest_corner_grad, stochastic,
                                grad_levels)
