"""Cross-ray valid-sample compaction (forward_compact) parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
from palettenerf_tpu.ops.occupancy import packbits
from palettenerf_tpu.render.nerf_renderer import (
    RenderSettings, forward_compact, render_nerf_eval)


def _scene():
    spec = NeRFSpec.build(bound=1.0)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    G = 32
    r = 2 * (np.arange(G) + 0.5) / G - 1
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    occ = (X ** 2 + Y ** 2 + Z ** 2) < 0.55
    bitfield = packbits(jnp.asarray(occ.reshape(-1).astype(np.uint8)))
    key = jax.random.PRNGKey(1)
    n = 64
    z = jax.random.normal(key, (n, 3)) * 0.2 + jnp.asarray([0, 0, 1.0])
    rd = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.5]), (n, 3))
    return spec, params, bitfield, G, ro, rd


def test_forward_compact_expand_parity():
    key = jax.random.PRNGKey(2)
    M = 1024
    xyz = jax.random.normal(key, (M, 3))
    valid = jax.random.uniform(key, (M,)) < 0.3

    def fn(x):
        return (x.sum(-1), x * 2.0)

    a, b = forward_compact(fn, valid, 512, xyz)
    ra, rb = fn(xyz)
    np.testing.assert_allclose(np.asarray(a), np.asarray(jnp.where(valid, ra, 0)),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(jnp.where(valid[:, None], rb, 0)), rtol=1e-6)


def test_forward_compact_budget_drop():
    M = 256
    valid = jnp.ones((M,), bool)
    xyz = jnp.arange(M, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    (out,) = forward_compact(lambda x: (x.sum(-1),), valid, 128, xyz)
    np.testing.assert_allclose(np.asarray(out[:128]),
                               np.asarray(xyz[:128].sum(-1)))
    assert float(jnp.abs(out[128:]).max()) == 0.0  # overflow samples dropped


def test_eval_compact_matches_plain():
    spec, params, bitfield, G, ro, rd = _scene()
    base = dict(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                max_steps=128, num_samples=64, t_thresh=1e-4, min_near=0.2)
    plain = render_nerf_eval(params, spec, bitfield, ro, rd,
                             RenderSettings(**base))
    comp = render_nerf_eval(params, spec, bitfield, ro, rd,
                            RenderSettings(**base, compact_frac=1.0))
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(comp[k]), np.asarray(plain[k]),
                                   rtol=2e-4, atol=2e-5)


def test_eval_compact_rounds_matches_plain():
    spec, params, bitfield, G, ro, rd = _scene()
    base = dict(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                max_steps=128, num_samples=64, t_thresh=1e-4, min_near=0.2,
                compaction_rounds=((1, 16), (4, 48)))
    plain = render_nerf_eval(params, spec, bitfield, ro, rd,
                             RenderSettings(**base))
    comp = render_nerf_eval(params, spec, bitfield, ro, rd,
                            RenderSettings(**base, compact_frac=1.0))
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(comp[k]), np.asarray(plain[k]),
                                   rtol=2e-4, atol=2e-5)


def test_train_compact_grad_parity():
    """render_nerf_train with compact_frac=1.0 must match the plain path in both
    value and parameter gradients (exact-trilerp spec so the forward is
    deterministic regardless of the rand sample count)."""
    spec, params, bitfield, G, ro, rd = _scene()
    base = dict(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                max_steps=128, num_samples=32, t_thresh=1e-4, min_near=0.2)
    key = jax.random.PRNGKey(3)
    gt = jax.random.uniform(key, (ro.shape[0], 3))

    def loss(p, settings):
        out = render_nerf_train(p, spec, bitfield, ro, rd, key, settings,
                                bg_color=jnp.ones(3), rays_gt=gt, perturb=True)
        return ((out["image"] - gt) ** 2).mean() + out["rgb_norm"].mean()

    from palettenerf_tpu.render.nerf_renderer import render_nerf_train  # noqa: F811

    l0, g0 = jax.value_and_grad(loss)(params, RenderSettings(**base))
    l1, g1 = jax.value_and_grad(loss)(params, RenderSettings(**base,
                                                             compact_frac=1.0))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for (path, a0), a1 in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=5e-4, atol=1e-6, err_msg=str(path))


def test_compact_overflow_count_surfaced():
    """An undersized compact budget must surface the dropped-valid-sample count
    (advisor round-3: silent drops darken renders with no diagnostic)."""
    spec, params, bitfield, G, ro, rd = _scene()
    base = dict(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                max_steps=128, num_samples=64, t_thresh=1e-4, min_near=0.2)
    full = render_nerf_eval(params, spec, bitfield, ro, rd,
                            RenderSettings(**base, compact_frac=1.0))
    assert int(np.asarray(full["compact_overflow"])[0]) == 0
    tiny = render_nerf_eval(params, spec, bitfield, ro, rd,
                            RenderSettings(**base, compact_frac=0.05))
    n_over = int(np.asarray(tiny["compact_overflow"])[0])
    assert n_over > 0  # budget 0.05 * 64 rays * 64 samples = 205 slots << valid
    # train path surfaces it too
    from palettenerf_tpu.render.nerf_renderer import render_nerf_train
    out = render_nerf_train(params, spec, bitfield, ro, rd, jax.random.PRNGKey(0),
                            RenderSettings(**base, compact_frac=0.05),
                            bg_color=jnp.ones(3), perturb=False)
    assert int(np.asarray(out["compact_overflow"])[0]) > 0


def test_compact_overflow_gradients_bounded():
    """Under an overflowing budget, gradients must flow ONLY through in-budget
    samples — dropped slots contribute exactly zero (never NaN/garbage), and the
    compacted loss stays differentiable."""
    spec, params, bitfield, G, ro, rd = _scene()
    from palettenerf_tpu.render.nerf_renderer import render_nerf_train
    base = dict(bound=1.0, cascade=1, grid_size=G, dt_gamma=0.0,
                max_steps=128, num_samples=32, t_thresh=1e-4, min_near=0.2)
    key = jax.random.PRNGKey(3)
    gt = jax.random.uniform(key, (ro.shape[0], 3))

    def loss(p):
        out = render_nerf_train(p, spec, bitfield, ro, rd, key,
                                RenderSettings(**base, compact_frac=0.08),
                                bg_color=jnp.ones(3), rays_gt=gt, perturb=False)
        return ((out["image"] - gt) ** 2).mean()

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
