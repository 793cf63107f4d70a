"""hashgrid_fast must match the golden jnp implementation exactly (fwd and grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from palettenerf_tpu.ops.hashgrid_fast import hashgrid_encode_fast


@pytest.mark.parametrize("gridtype", ["hash", "tiled"])
def test_fast_matches_golden_forward(gridtype):
    spec = HashGridSpec.build(num_levels=8, desired_resolution=512,
                              log2_hashmap_size=15, gridtype=gridtype)
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (256, 3)), jnp.float32)
    a = np.asarray(hashgrid_encode(table, x, spec))
    b = np.asarray(hashgrid_encode_fast(table, x, spec))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fast_oob_zeros():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x = jnp.asarray([[1.2, 0.5, 0.5], [-0.1, 0.5, 0.5]], jnp.float32)
    out = np.asarray(hashgrid_encode_fast(table, x, spec))
    assert (out == 0).all()


def test_fast_grad_matches_golden():
    spec = HashGridSpec.build(num_levels=6, desired_resolution=256, log2_hashmap_size=14)
    table = init_hashgrid(jax.random.PRNGKey(2), spec)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (128, 3)), jnp.float32)
    co = jnp.asarray(np.random.default_rng(4).normal(size=(128, spec.output_dim)), jnp.float32)

    g_gold = jax.grad(lambda t: (hashgrid_encode(t, x, spec) * co).sum())(table)
    g_fast = jax.grad(lambda t: (hashgrid_encode_fast(t, x, spec) * co).sum())(table)
    np.testing.assert_allclose(np.asarray(g_gold), np.asarray(g_fast), rtol=1e-4, atol=1e-6)


def test_fast_grad_oob_contributes_zero():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(5), spec)
    x = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)  # fully out of bounds
    g = jax.grad(lambda t: hashgrid_encode_fast(t, x, spec).sum())(table)
    assert float(jnp.abs(g).sum()) == 0.0


def test_fast_bf16_table():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(6), spec).astype(jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (64, 3)), jnp.float32)
    out = hashgrid_encode_fast(table, x, spec)
    assert out.dtype == jnp.bfloat16
    g = jax.grad(lambda t: hashgrid_encode_fast(t, x, spec).astype(jnp.float32).sum())(table)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()
