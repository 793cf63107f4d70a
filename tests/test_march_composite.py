"""Tests for the fixed-width marcher and masked compositor against sequential references."""

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.ops.composite import composite_rays, composite_weights
from palettenerf_tpu.ops.march import SQRT3, candidate_ts, march_rays, mip_level
from palettenerf_tpu.ops.occupancy import init_grid_state, packbits


def _sequential_ts(t0, num, dt_min, dt_max, gamma):
    """Direct port of the CUDA stepping recurrence for verification."""
    ts = []
    t = t0
    for _ in range(num):
        ts.append(t)
        t = t + np.clip(t * gamma, dt_min, dt_max)
    return np.array(ts)


def test_candidate_ts_matches_sequential_recurrence():
    for gamma in [0.0, 1 / 128, 1 / 64]:
        dt_min, dt_max = 2 * SQRT3 / 1024, 2 * SQRT3 * 2 / 128
        t0 = np.array([0.05, 0.2, 1.7], dtype=np.float32)
        got = np.asarray(candidate_ts(jnp.asarray(t0), 256, dt_min, dt_max, gamma))
        for i, t in enumerate(t0):
            ref = _sequential_ts(t, 256, dt_min, dt_max, gamma)
            np.testing.assert_allclose(got[i], ref, rtol=2e-4, atol=1e-5)


def test_mip_level_matches_frexp():
    xyz = jnp.asarray([[0.3, 0.1, 0.2], [0.7, 0.0, 0.0], [1.5, 0.2, 0.1], [3.0, 0.0, 0.0]])
    dt = jnp.full((4,), 1e-3)
    lvl = np.asarray(mip_level(xyz, dt, 128, 4))
    # frexp exponents of max|xyz|: 0.3->-1, 0.7->0, 1.5->1, 3.0->2 ; clamped to >= 0
    np.testing.assert_array_equal(lvl, [0, 0, 1, 2])


def _occupied_box_bitfield(cascade=1, H=128, lo=-0.5, hi=0.5, bound=1.0):
    """Occupancy bitfield with a solid box [lo,hi]^3 occupied."""
    r = (2 * (np.arange(H) + 0.5) / H - 1) * bound
    occ = ((r[:, None, None] >= lo) & (r[:, None, None] <= hi)
           & (r[None, :, None] >= lo) & (r[None, :, None] <= hi)
           & (r[None, None, :] >= lo) & (r[None, None, :] <= hi))
    full = np.zeros((cascade, H, H, H), bool)
    full[0] = occ
    return packbits(jnp.asarray(full.reshape(-1)))


def test_march_rays_hits_occupied_box_only():
    H, bound = 128, 1.0
    bf = _occupied_box_bitfield(H=H, bound=bound)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near = jnp.asarray([1.0])
    far = jnp.asarray([3.0])
    res = march_rays(o, d, near, far, bf, bound, 1, H, 0.0, 1024, 384)
    n = int(res.mask.sum())
    assert n > 0
    z = np.asarray(res.xyzs[0, :n, 2])
    # samples only inside the occupied box (allow one cell of slack at the boundary)
    cell = 2 * bound / H
    assert (z >= -0.5 - cell).all() and (z <= 0.5 + cell).all()
    # t strictly increasing over valid slots
    ts = np.asarray(res.ts[0, :n])
    assert (np.diff(ts) > 0).all()
    # expected sample count ~ box depth / dt_min
    dt_min = 2 * SQRT3 / 1024
    assert abs(n - 1.0 / dt_min) < 20


def test_march_rays_miss_gives_empty():
    H, bound = 128, 1.0
    bf = _occupied_box_bitfield(H=H, bound=bound)
    o = jnp.asarray([[0.9, 0.9, -2.0]])  # passes outside the box corner
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = jnp.asarray([1.0]), jnp.asarray([3.0])
    res = march_rays(o, d, near, far, bf, bound, 1, H, 0.0, 1024, 64)
    assert int(res.mask.sum()) == 0


def _sequential_composite(sigmas, rgbs, dts, t_cum, t_thresh):
    """Direct port of kernel_composite_rays_train_forward (raymarching.cu:537-570)."""
    T, ws, d = 1.0, 0.0, 0.0
    rgb = np.zeros(3)
    for j in range(len(sigmas)):
        alpha = 1 - np.exp(-sigmas[j] * dts[j])
        w = alpha * T
        rgb += w * rgbs[j]
        d += w * t_cum[j]
        ws += w
        T *= 1 - alpha
        if T < t_thresh:
            break
    return ws, d, rgb


def test_composite_matches_sequential_reference():
    rng = np.random.default_rng(7)
    N, S = 8, 64
    sigmas = rng.uniform(0, 50, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    dts = np.full((N, S), 0.01, np.float32)
    t_cum = np.cumsum(dts, axis=1).astype(np.float32)
    nvalid = rng.integers(0, S + 1, N)
    mask = np.arange(S)[None, :] < nvalid[:, None]

    ws, depth, image = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(dts),
        jnp.asarray(t_cum), jnp.asarray(mask), 1e-4,
    )
    for i in range(N):
        n = nvalid[i]
        rws, rd, rrgb = _sequential_composite(sigmas[i, :n], rgbs[i, :n], dts[i, :n], t_cum[i, :n], 1e-4)
        np.testing.assert_allclose(ws[i], rws, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(depth[i], rd, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(image[i], rrgb, rtol=1e-4, atol=1e-5)


def test_composite_early_termination_mask():
    # huge density: first sample saturates, later ones must be excluded
    sigmas = jnp.full((1, 8), 1e4)
    dts = jnp.full((1, 8), 0.1)
    mask = jnp.ones((1, 8), bool)
    w, ws, _ = composite_weights(sigmas, dts, mask, 1e-4)
    assert float(w[0, 0]) > 0.999
    assert float(jnp.abs(w[0, 1:]).sum()) == 0.0


def test_composite_gradients_finite():
    rng = np.random.default_rng(8)
    sigmas = jnp.asarray(rng.uniform(0, 10, (4, 16)), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (4, 16, 3)), jnp.float32)
    dts = jnp.full((4, 16), 0.02)
    t_cum = jnp.cumsum(dts, axis=1)
    mask = jnp.ones((4, 16), bool)

    def loss(s, r):
        ws, d, img = composite_rays(s, r, dts, t_cum, mask, 1e-4)
        return (img ** 2).sum() + (ws ** 2).sum()

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert np.isfinite(np.asarray(gs)).all() and np.isfinite(np.asarray(gr)).all()


def test_composite_sigma_gradient_matches_analytic():
    """Autodiff sigma-grad must equal the reference analytic form (raymarching.cu:741-746)."""
    rng = np.random.default_rng(9)
    S = 12
    sigmas = rng.uniform(0.1, 20, S).astype(np.float32)
    rgbs = rng.uniform(0, 1, (S, 3)).astype(np.float32)
    dts = np.full(S, 0.03, np.float32)
    t_cum = np.cumsum(dts).astype(np.float32)
    g_img = rng.uniform(-1, 1, 3).astype(np.float32)
    g_ws = float(rng.uniform(-1, 1))

    def out(s):
        ws, d, img = composite_rays(
            s[None], jnp.asarray(rgbs)[None], jnp.asarray(dts)[None],
            jnp.asarray(t_cum)[None], jnp.ones((1, S), bool), 0.0,
        )
        return (img[0] * g_img).sum() + ws[0] * g_ws

    got = np.asarray(jax.grad(out)(jnp.asarray(sigmas)))

    # analytic reference
    alpha = 1 - np.exp(-sigmas * dts)
    T = np.concatenate([[1.0], np.cumprod(1 - alpha)])[:-1]
    w = alpha * T
    rgb_final = (w[:, None] * rgbs).sum(0)
    ws_final = w.sum()
    pref_rgb = np.cumsum(w[:, None] * rgbs, axis=0)
    pref_ws = np.cumsum(w)
    T_post = np.cumprod(1 - alpha)
    expect = dts * (
        (g_img * (T_post[:, None] * rgbs - (rgb_final - pref_rgb))).sum(-1)
        + g_ws * (1 - ws_final)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-5)


class TestHierarchicalMarch:
    """2-phase hierarchical march (ops/march.py _march_rays_hier) vs flat path."""

    def _scene(self, n=64, key=0):
        import numpy as np
        rng = np.random.default_rng(key)
        G = 64
        r = (2 * (np.arange(G) + 0.5) / G - 1)
        X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
        occ = ((X - 0.2) ** 2 + Y ** 2 + Z ** 2) < 0.3
        occ |= ((X + 0.5) ** 2 + (Y + 0.4) ** 2 + Z ** 2) < 0.05
        from palettenerf_tpu.ops.occupancy import packbits
        bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))
        z = rng.normal(size=(n, 3)) * 0.25 + np.asarray([0, 0, 1.0])
        rd = z / np.linalg.norm(z, axis=-1, keepdims=True)
        ro = np.broadcast_to(np.asarray([0.0, 0.0, -1.6]), (n, 3))
        from palettenerf_tpu.ops.rays import near_far_from_aabb
        nears, fars = near_far_from_aabb(
            jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
            jnp.asarray([-1., -1, -1, 1, 1, 1]), 0.2)
        return bitfield, jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32), nears, fars, G

    def test_matches_flat_when_groups_suffice(self):
        """With max_groups = K/8 (no truncation possible) the hierarchical result
        must be bit-identical to the flat path: the dilated coarse test is
        conservative, so it can only skip candidates the fine test also rejects."""
        from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
        bitfield, ro, rd, nears, fars, G = self._scene()
        K, S = 256, 64
        sup = build_super_bitfield(bitfield, G, 1)
        flat = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, None)
        hier = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, None,
                          sup_bitfield=sup, max_groups=K // 8)
        np.testing.assert_array_equal(np.asarray(flat.mask), np.asarray(hier.mask))
        np.testing.assert_allclose(np.asarray(flat.ts), np.asarray(hier.ts), atol=1e-6)
        np.testing.assert_allclose(np.asarray(flat.xyzs), np.asarray(hier.xyzs), atol=1e-6)
        np.testing.assert_allclose(np.asarray(flat.dts), np.asarray(hier.dts), atol=1e-6)

    def test_with_noise_and_small_groups(self):
        """Truncated group budget still yields a valid prefix of the flat samples."""
        from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
        bitfield, ro, rd, nears, fars, G = self._scene(n=32, key=3)
        K, S = 256, 32
        sup = build_super_bitfield(bitfield, G, 1)
        noise = jax.random.uniform(jax.random.PRNGKey(0), (32,))
        flat = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, noise)
        hier = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, noise,
                          sup_bitfield=sup, max_groups=8)
        fm, hm = np.asarray(flat.mask), np.asarray(hier.mask)
        ft, ht = np.asarray(flat.ts), np.asarray(hier.ts)
        for i in range(32):
            nh = hm[i].sum()
            # hier samples are a prefix of flat samples (same t values, in order)
            assert nh <= fm[i].sum() + 1e-9
            np.testing.assert_allclose(ht[i, :nh], ft[i, :nh], atol=1e-6)

    def test_super_bitfield_conservative(self):
        """Every occupied fine cell's supercell (and neighbours) must be set."""
        from palettenerf_tpu.ops.march import build_super_bitfield
        from palettenerf_tpu.ops.occupancy import occ_lookup, packbits
        import numpy as np
        rng = np.random.default_rng(0)
        G = 32
        occ = rng.random((G, G, G)) < 0.01
        bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))
        sup = build_super_bitfield(bitfield, G, 1)
        Hs = G // 4
        sup_bits = np.unpackbits(np.asarray(sup), bitorder="little")[:Hs ** 3].reshape(Hs, Hs, Hs)
        xs, ys, zs = np.nonzero(occ)
        for x, y, z in list(zip(xs, ys, zs))[:200]:
            assert sup_bits[x // 4, y // 4, z // 4] == 1

class TestHierarchicalMarchAdaptive:
    """Generalized 2-phase march: dt_gamma > 0 and multi-cascade scenes
    (reference adaptive stepping raymarching.cu:348-402), plus adversarial
    probes of the dilation-radius invariant and the group-budget overflow
    posture (round-3 verdict items 3 and 7)."""

    def _multicascade_scene(self, n=48, key=1, G=64, cascade=3):
        """Occupancy in all cascades: a ball near the origin (cascade 0) and
        content out at |x| ~ 3 that only cascade 2 covers."""
        rng = np.random.default_rng(key)
        bound = float(2 ** (cascade - 1))
        occ = np.zeros((cascade, G, G, G), bool)
        r = 2 * (np.arange(G) + 0.5) / G - 1            # cell centers, frame units
        X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
        for c in range(cascade):
            e = 2.0 ** c                                 # cascade extent +-e
            Xw, Yw, Zw = X * e, Y * e, Z * e
            occ[c] |= (Xw ** 2 + Yw ** 2 + Zw ** 2) < 0.3          # central ball
            occ[c] |= ((Xw - 3.0) ** 2 + Yw ** 2 + (Zw - 1.0) ** 2) < 0.4  # far blob
        from palettenerf_tpu.ops.occupancy import packbits
        bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))
        z = rng.normal(size=(n, 3)) * 0.35 + np.asarray([0.3, 0, 1.0])
        rd = z / np.linalg.norm(z, axis=-1, keepdims=True)
        ro = np.broadcast_to(np.asarray([0.0, 0.0, -1.2 * bound]), (n, 3))
        from palettenerf_tpu.ops.rays import near_far_from_aabb
        nears, fars = near_far_from_aabb(
            jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
            jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32), 0.05)
        return (bitfield, jnp.asarray(ro, jnp.float32),
                jnp.asarray(rd, jnp.float32), nears, fars, G, bound, cascade)

    def _assert_equal_march(self, flat, hier):
        np.testing.assert_array_equal(np.asarray(flat.mask), np.asarray(hier.mask))
        np.testing.assert_allclose(np.asarray(flat.ts), np.asarray(hier.ts), atol=1e-6)
        np.testing.assert_allclose(np.asarray(flat.dts), np.asarray(hier.dts), atol=1e-6)
        np.testing.assert_allclose(np.asarray(flat.xyzs), np.asarray(hier.xyzs),
                                   atol=1e-6)

    def test_dt_gamma_matches_flat(self):
        """LLFF profile (dt_gamma > 0, single cascade): with a full group budget
        the hierarchical march must reproduce the flat path exactly — far-field
        groups whose span exceeds the dilation radius auto-pass the coarse test."""
        from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
        bitfield, ro, rd, nears, fars, G, bound, cas = self._multicascade_scene(
            cascade=1)
        K, S = 512, 64
        sup = build_super_bitfield(bitfield, G, cas)
        for dt_gamma in (1.0 / 256, 1.0 / 64):
            flat = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G,
                              dt_gamma, K, S, None)
            hier = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G,
                              dt_gamma, K, S, None,
                              sup_bitfield=sup, max_groups=K // 8)
            self._assert_equal_march(flat, hier)
            assert np.asarray(flat.mask).sum() > 0  # scene actually hit

    def test_multicascade_matches_flat(self):
        """bound=4 / cascade=3 / dt_gamma>0 (mip360-style): exact flat parity
        with a full group budget, including samples only cascade 2 covers."""
        from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
        bitfield, ro, rd, nears, fars, G, bound, cas = self._multicascade_scene()
        K, S = 512, 96
        sup = build_super_bitfield(bitfield, G, cas)
        flat = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G,
                          1.0 / 128, K, S, None)
        hier = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G,
                          1.0 / 128, K, S, None,
                          sup_bitfield=sup, max_groups=K // 8)
        self._assert_equal_march(flat, hier)
        # the far blob at |x|~3 is outside cascade 0/1 (extent 1, 2): the rays
        # must be sampling it through the top cascade for the test to mean much
        ts = np.asarray(flat.ts)[np.asarray(flat.mask)]
        assert (ts > 0.6 * float(np.asarray(nears).min() + 3.0)).any()

    def test_dilation_radius_boundary(self):
        """Adversarial: K chosen so the static group half-span sits just inside
        the dilation radius (worst-case geometry for the supercell invariant).
        Still must match flat exactly with a full group budget."""
        from palettenerf_tpu.ops.march import (
            SUPER_FACTOR, SQRT3, build_super_bitfield, march_rays)
        bitfield, ro, rd, nears, fars, G, bound, cas = self._multicascade_scene(
            cascade=1, key=7)
        # largest K multiple of 8 with span/2 <= supercell: span/2 = 3.5*2*sqrt3/K
        sup_size = SUPER_FACTOR * 2.0 * bound / G
        K = 8 * int(np.ceil(3.5 * 2 * SQRT3 / sup_size / 8))
        assert (8 - 1) * (2 * SQRT3 / K) * 0.5 <= sup_size  # gate passes
        assert (8 - 1) * (2 * SQRT3 / (K - 8)) * 0.5 > sup_size  # ...barely
        S = 64
        sup = build_super_bitfield(bitfield, G, cas)
        flat = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G, 0.0,
                          K, S, None)
        hier = march_rays(ro, rd, nears, fars, bitfield, bound, cas, G, 0.0,
                          K, S, None, sup_bitfield=sup, max_groups=K // 8)
        self._assert_equal_march(flat, hier)

    def test_group_overflow_prefix_posture(self):
        """Adversarial: EVERY group passes the coarse test (all cells occupied)
        and the group budget is tiny. The documented drop posture: the result is
        exactly the flat samples that fall in the first Sg groups (a t-prefix),
        never reordered or invented samples."""
        from palettenerf_tpu.ops.march import build_super_bitfield, march_rays
        from palettenerf_tpu.ops.occupancy import packbits
        G = 32
        bitfield = packbits(jnp.ones((G ** 3 // 8 * 8,), jnp.uint8))
        n = 16
        rng = np.random.default_rng(5)
        z = rng.normal(size=(n, 3)) * 0.2 + np.asarray([0, 0, 1.0])
        rd = jnp.asarray(z / np.linalg.norm(z, axis=-1, keepdims=True), jnp.float32)
        ro = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.5]), (n, 3))
        from palettenerf_tpu.ops.rays import near_far_from_aabb
        nears, fars = near_far_from_aabb(
            ro, rd, jnp.asarray([-1., -1, -1, 1, 1, 1]), 0.2)
        K, S, Sg = 256, 64, 4
        sup = build_super_bitfield(bitfield, G, 1)
        flat = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, None)
        hier = march_rays(ro, rd, nears, fars, bitfield, 1.0, 1, G, 0.0, K, S, None,
                          sup_bitfield=sup, max_groups=Sg)
        fm, hm = np.asarray(flat.mask), np.asarray(hier.mask)
        ft, ht = np.asarray(flat.ts), np.asarray(hier.ts)
        for i in range(n):
            nh = int(hm[i].sum())
            assert nh == min(Sg * 8, int(fm[i].sum()), S)
            np.testing.assert_allclose(ht[i, :nh], ft[i, :nh], atol=1e-6)
