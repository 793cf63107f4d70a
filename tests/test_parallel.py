"""Data-parallel sharding over the 8-device virtual CPU mesh.

The only collective surface in this model family is ray-DP with replicated params
(SURVEY.md §2.3); these tests pin that the sharded train step compiles, executes, and
matches the unsharded computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from palettenerf_tpu.models.nerf import NeRFSpec, init_nerf
from palettenerf_tpu.ops.occupancy import packbits
from palettenerf_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from palettenerf_tpu.render.nerf_renderer import RenderSettings, render_nerf_train


@pytest.fixture(scope="module")
def setup():
    spec = NeRFSpec.build(bound=1.0, grid_levels=4, log2_hashmap_size=13)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    bitfield = packbits(jnp.ones((64 ** 3,), jnp.uint8))
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=64, max_steps=64,
                              num_samples=16, min_near=0.05)
    n = 64 * 8
    rng = np.random.default_rng(0)
    ro = np.tile(np.array([[0, 0, -1.5]], np.float32), (n, 1))
    rd = rng.normal(size=(n, 3)) * 0.1 + [0, 0, 1]
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(np.float32)
    gt = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return spec, params, bitfield, settings, ro, rd, gt


def _loss_fn(spec, settings, bitfield):
    def loss(params, ro, rd, gt):
        out = render_nerf_train(params, spec, bitfield, ro, rd,
                                jax.random.PRNGKey(1), settings,
                                bg_color=jnp.ones((3,), jnp.float32),
                                rays_gt=gt, perturb=False)
        return ((out["image"] - gt) ** 2).mean()

    return loss


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"


def test_dp_sharded_grads_match_unsharded(setup):
    spec, params, bitfield, settings, ro, rd, gt = setup
    loss = _loss_fn(spec, settings, bitfield)

    g_ref = jax.jit(jax.grad(loss))(params, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(gt))

    mesh = make_mesh(8)
    rep, shard = replicated(mesh), shard_batch(mesh)
    with mesh:
        step = jax.jit(jax.grad(loss), in_shardings=(rep, shard, shard, shard),
                       out_shardings=rep)
        params_s = jax.device_put(params, rep)
        g_dp = step(params_s, jax.device_put(jnp.asarray(ro), shard),
                    jax.device_put(jnp.asarray(rd), shard),
                    jax.device_put(jnp.asarray(gt), shard))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_full_train_step_runs(setup):
    """Full optimizer step (grads + adam + EMA) sharded over 8 devices."""
    spec, params, bitfield, settings, ro, rd, gt = setup
    loss = _loss_fn(spec, settings, bitfield)
    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    def train_step(params, opt_state, ro, rd, gt):
        l, grads = jax.value_and_grad(loss)(params, ro, rd, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    mesh = make_mesh(8)
    rep, shard = replicated(mesh), shard_batch(mesh)
    with mesh:
        step = jax.jit(train_step,
                       in_shardings=(rep, rep, shard, shard, shard),
                       out_shardings=(rep, rep, rep))
        p, o, l = step(jax.device_put(params, rep), jax.device_put(opt_state, rep),
                       jax.device_put(jnp.asarray(ro), shard),
                       jax.device_put(jnp.asarray(rd), shard),
                       jax.device_put(jnp.asarray(gt), shard))
    assert np.isfinite(float(l))
    # params actually changed
    d = sum(float(jnp.abs(a - b).sum()) for a, b in
            zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p)))
    assert d > 0
