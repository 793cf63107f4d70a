"""TPU-optimized multiresolution hash encoding (custom-VJP formulation).

Same math as ``ops.hashgrid`` (the golden reference; construction rules parity-exact
with gridencoder/grid.py:92-133 and gridencoder.cu:36-72), but structured around the
measured cost model of XLA's TPU gather/scatter lowering:

- gather cost   ~ O(rows fetched)            (~200M rows/s, width-independent)
- scatter cost  ~ O(updates x table_rows)    (lowered as an implicit one-hot matmul on
                                              the MXU; bf16 cotangents nearly double it)

Consequences baked into this implementation:
1. Corner indices/weights for ALL levels are computed once, into a single global index
   array; the forward is ONE flat gather (no per-level dynamic_slice copies).
2. The backward is hand-written (custom VJP): per-level scatters into each level's own
   sub-table (cost M_l x T_l each, instead of one O(M x T_total) scatter), expressed as
   vjp-of-gather (measured 2x faster than ``.at[idx].add``), with cotangents cast to the
   table dtype first (bf16 tables halve the scatter matmul cost, mirroring the
   reference's fp16 atomicAdd accumulation, gridencoder.cu:226-313).
3. No input gradients (the reference's default ``calc_grad_inputs=False``; positions are
   never a function of parameters in this pipeline).

Verified against ``ops.hashgrid.hashgrid_encode`` in tests/test_hashgrid_fast.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .hashgrid import HashGridSpec, _PRIMES


def _level_indices(spec: HashGridSpec, lvl: int, x):
    """Global corner indices + interpolation weights for one level.

    x: [M, D] in [0,1]. Returns (idx [M, 2^D] int32 GLOBAL indices, w [M, 2^D] f32).
    """
    D = spec.input_dim
    hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
    res = spec.resolutions[lvl]
    side = res if spec.align_corners else res + 1
    scale = spec.level_scale(lvl)

    pos = x * scale + (0.0 if spec.align_corners else 0.5)
    pg0 = jnp.floor(pos)
    frac = pos - pg0
    pg0 = pg0.astype(jnp.int32)

    # which stride-dims fit before the hash kicks in (gridencoder.cu:55-72)
    strides = []
    s = 1
    for _ in range(D):
        strides.append(s if s <= hashmap_size else None)
        s *= side
    overflow = s > hashmap_size  # (after full loop) -> hash for gridtype 'hash'

    idxs, ws = [], []
    for corner in range(2 ** D):
        bits = [(corner >> d) & 1 for d in range(D)]
        pg = (pg0 + jnp.array(bits, jnp.int32)).astype(jnp.uint32)
        w = jnp.ones(x.shape[:-1], jnp.float32)
        for d in range(D):
            w = w * jnp.where(bits[d], frac[..., d], 1.0 - frac[..., d])
        if overflow and spec.gridtype == "hash":
            h = jnp.zeros(x.shape[:-1], jnp.uint32)
            for d in range(D):
                h = h ^ (pg[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        else:
            h = jnp.zeros(x.shape[:-1], jnp.uint32)
            for d in range(D):
                if strides[d] is not None:
                    h = h + pg[..., d] * jnp.uint32(strides[d])
        idx = (h % jnp.uint32(hashmap_size)).astype(jnp.int32) + spec.offsets[lvl]
        idxs.append(idx)
        ws.append(w)
    return jnp.stack(idxs, -1), jnp.stack(ws, -1)


def _all_indices(spec: HashGridSpec, x01):
    """[M, L*2^D] global indices and weights for all levels."""
    idxs, ws = [], []
    for lvl in range(spec.num_levels):
        i, w = _level_indices(spec, lvl, x01)
        idxs.append(i)
        ws.append(w)
    return jnp.concatenate(idxs, -1), jnp.concatenate(ws, -1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def hashgrid_encode_fast(table, x01, spec: HashGridSpec, scatter_dtype=None,
                         nearest_corner_grad: bool = False,
                         stochastic: bool = False):
    """table [total, C]; x01 [..., D] in [0,1] -> [..., L*C].

    Output matches ops.hashgrid.hashgrid_encode bit-for-bit in f32 (when
    ``stochastic`` is off).

    ``scatter_dtype`` (static): dtype for the backward scatter-add cotangents (bf16
    halves the scatter matmul cost, mirroring the reference's fp16 atomicAdd
    accumulation). The FORWARD gather stays in the table dtype: bf16 gather *outputs*
    of shape [rows, 2] get a tiled (2,1) layout whose 128-lane padding inflates them
    64x in HBM (observed OOM at eval scale), so don't feed bf16 tables here.

    ``nearest_corner_grad`` (static): route each sample's gradient only to its
    max-weight corner per level (weight renormalized to 1). XLA scatter cost scales
    with update count, so this cuts the backward ~8x at the cost of a biased (but
    unbiased-in-expectation-under-jitter) interpolation gradient. Forward stays exact
    trilinear. Off by default.

    ``stochastic`` (static): single-corner Monte-Carlo trilinear — per (sample,
    level), gather ONE corner drawn with probability equal to its trilinear weight
    (a position-hash supplies the uniform variate, so the estimator re-randomizes
    with the per-step march jitter). Unbiased: E[T[c*]] = sum_c w_c T_c. Cuts the
    forward gather 8x AND the backward scatter 8x (the realized function's exact
    gradient touches only the drawn corner). Training-only — eval paths must use
    the exact interpolation. Supersedes ``nearest_corner_grad`` when set.
    """
    out, _ = _fwd_impl(table, x01, spec, stochastic)
    return out


def _corner_lottery(frac, w):
    """Pseudo-random corner selection: u from a position hash (GLSL-style sin
    fract), corner c* with P(c*) = w_c via the inverse CDF over the K corners.
    frac [M, D] fractional coords; w [M, K] trilinear weights (sum 1)."""
    coef = jnp.asarray([12.9898, 78.233, 37.719][: frac.shape[-1]], jnp.float32)
    s = jnp.sin((frac * coef).sum(-1)) * 43758.5453
    u = (s - jnp.floor(s))[:, None]                                # [M, 1] in [0,1)
    csum = jnp.cumsum(w, axis=-1)
    return jnp.minimum((u >= csum).sum(-1), w.shape[-1] - 1)       # [M] int


_ENCODE_CHUNK = 32768  # bounds gather-output materialization: XLA sometimes assigns a
# tiled (8,128) layout to the [M*L*K, C] gather result, whose 128-lane padding inflates
# it up to 64x in HBM; chunking via lax.map caps the worst case at ~2 GB per buffer.


def _encode_block(table, spec: HashGridSpec, x, stochastic: bool = False):
    """Encode a [Mc, D] block -> (out [Mc, L*C], idx, w, oob).

    Exact mode: idx/w are [Mc, L*K]. Stochastic mode: one drawn corner per
    (sample, level) — idx is [Mc, L], w is a dummy (the realized weight is 1)."""
    C, L, K = spec.level_dim, spec.num_levels, 2 ** spec.input_dim
    Mc = x.shape[0]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    if stochastic:
        sel_idxs = []
        for lvl in range(L):
            ilvl, wlvl = _level_indices(spec, lvl, x)              # [Mc,K] each
            scale = spec.level_scale(lvl)
            pos = x * scale + (0.0 if spec.align_corners else 0.5)
            frac = pos - jnp.floor(pos)
            c = _corner_lottery(frac, wlvl)                        # [Mc]
            sel_idxs.append(jnp.take_along_axis(ilvl, c[:, None], 1)[:, 0])
        idx = jnp.stack(sel_idxs, -1)                              # [Mc, L]
        out = table[idx.reshape(-1)].reshape(Mc, L * C).astype(table.dtype)
        out = jnp.where(oob[:, None], 0, out)
        return out, idx, jnp.zeros((Mc, 0), jnp.float32), oob
    idx, w = _all_indices(spec, x)
    feats = table[idx.reshape(-1)].reshape(Mc, L * K, C)
    fw = feats * w[..., None].astype(table.dtype)
    # corner-sum via a tiny matmul instead of a [Mc, L, K, C] reshape — 4D arrays with
    # small minor dims trigger catastrophic tile padding in TPU layouts
    reduce = jnp.zeros((L * K, L), fw.dtype)
    lvl_of = jnp.repeat(jnp.arange(L), K)
    reduce = reduce.at[jnp.arange(L * K), lvl_of].set(1)
    out = jnp.einsum("mkc,kl->mlc", fw, reduce).reshape(Mc, L * C)
    out = jnp.where(oob[:, None], 0, out)
    return out, idx, w, oob


def _fwd_impl(table, x01, spec: HashGridSpec, stochastic: bool = False):
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    K = 1 if stochastic else 2 ** D
    lead = x01.shape[:-1]
    x = x01.reshape(-1, D).astype(jnp.float32)
    M = x.shape[0]

    if M <= _ENCODE_CHUNK:
        out, idx, w, oob = _encode_block(table, spec, x, stochastic)
    else:
        pad = (-M) % _ENCODE_CHUNK
        xp = jnp.concatenate([x, jnp.full((pad, D), 0.5, x.dtype)], 0) if pad else x
        n_chunks = xp.shape[0] // _ENCODE_CHUNK
        out, idx, w, oob = jax.lax.map(
            lambda xc: _encode_block(table, spec, xc, stochastic),
            xp.reshape(n_chunks, _ENCODE_CHUNK, D),
        )
        out = out.reshape(-1, L * C)[:M]
        idx = idx.reshape(-1, L * K)[:M]
        w = w.reshape(M + pad, -1)[:M]
        oob = oob.reshape(-1)[:M]

    return out.reshape(*lead, L * C), (idx, w, oob, lead)


def _fwd(table, x01, spec: HashGridSpec, scatter_dtype=None, nearest_corner_grad=False,
         stochastic=False):
    out, res = _fwd_impl(table, x01, spec, stochastic)
    dtype_token = jnp.zeros((0,), table.dtype)  # residuals must be arrays
    return out, (res, dtype_token)


def _bwd_stochastic(spec: HashGridSpec, scatter_dtype, saved, g):
    """Gradient of the realized single-corner function: one update per
    (sample, level), weight 1, into the drawn corner."""
    (idx, _w, oob, lead), dtype_token = saved
    tdtype = scatter_dtype if scatter_dtype is not None else dtype_token.dtype
    C, L = spec.level_dim, spec.num_levels
    M = idx.shape[0]
    g = g.reshape(M, L * C)
    g = jnp.where(oob[:, None], 0, g)
    grads = []
    for lvl in range(L):
        lo, hi = spec.offsets[lvl], spec.offsets[lvl + 1]
        idx_l = idx[:, lvl] - lo
        gw_l = g[:, lvl * C:(lvl + 1) * C].astype(tdtype)
        sub = jnp.zeros((hi - lo, C), tdtype)
        _, vjp = jax.vjp(lambda t: t[idx_l], sub)
        (grad_l,) = vjp(gw_l)
        grads.append(grad_l)
    return jnp.concatenate(grads, 0).astype(dtype_token.dtype), None


def _bwd(spec: HashGridSpec, scatter_dtype, nearest_corner_grad, stochastic, saved, g):
    if stochastic:
        return _bwd_stochastic(spec, scatter_dtype, saved, g)
    (idx, w, oob, lead), dtype_token = saved
    tdtype = scatter_dtype if scatter_dtype is not None else dtype_token.dtype
    D, C, L = spec.input_dim, spec.level_dim, spec.num_levels
    K = 2 ** D
    M = idx.shape[0]

    g = g.reshape(M, L * C)
    g = jnp.where(oob[:, None], 0, g)

    grads = []
    for lvl in range(L):
        lo, hi = spec.offsets[lvl], spec.offsets[lvl + 1]
        idx_lvl = idx[:, lvl * K:(lvl + 1) * K]                         # [M, K]
        w_lvl = w[:, lvl * K:(lvl + 1) * K]                             # [M, K]
        g_l = g[:, lvl * C:(lvl + 1) * C]                               # [M, C]
        if nearest_corner_grad:
            # route the gradient to the max-weight corner only (1 update/sample):
            # cuts the scatter 8x; forward interpolation stays exact
            best = jnp.argmax(w_lvl, axis=1)
            idx_l = jnp.take_along_axis(idx_lvl, best[:, None], 1).reshape(-1) - lo
            gw_l = g_l.astype(tdtype)
        else:
            idx_l = idx_lvl.reshape(-1) - lo                            # [M*K]
            w_l = w_lvl.reshape(-1, 1)
            gw_l = (jnp.repeat(g_l, K, axis=0) * w_l.astype(g.dtype)).astype(tdtype)
        # vjp-of-gather: measured ~2x faster than zeros.at[idx].add on TPU
        sub = jnp.zeros((hi - lo, C), tdtype)
        _, vjp = jax.vjp(lambda t: t[idx_l], sub)
        (grad_l,) = vjp(gw_l)
        grads.append(grad_l)
    grad_table = jnp.concatenate(grads, 0).astype(dtype_token.dtype)
    return grad_table, None


hashgrid_encode_fast.defvjp(_fwd, _bwd)


def hashgrid_encode_fast_bounded(table, x, spec: HashGridSpec, bound: float,
                                 scatter_dtype=None, nearest_corner_grad: bool = False,
                                 stochastic: bool = False):
    return hashgrid_encode_fast(table, (x + bound) / (2.0 * bound), spec, scatter_dtype,
                                nearest_corner_grad, stochastic)
