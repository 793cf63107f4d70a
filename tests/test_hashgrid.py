"""Hash-grid encoder tests: construction parity, interpolation correctness, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_bounded,
    init_hashgrid,
)


def _reference_offsets(num_levels, level_dim, base, log2_T, desired, input_dim=3, align_corners=False):
    """Independent numpy re-derivation of grid.py:110-124 construction."""
    pls = 2.0 ** (np.log2(desired / base) / (num_levels - 1))
    max_params = 2 ** log2_T
    offsets, off = [0], 0
    for i in range(num_levels):
        res = int(np.ceil(base * pls**i))
        side = res if align_corners else res + 1
        n = min(max_params, side**input_dim)
        n = int(np.ceil(n / 8) * 8)
        off += n
        offsets.append(off)
    return offsets, pls


def test_spec_construction_matches_reference_rules():
    spec = HashGridSpec.build(desired_resolution=2048)
    offsets, pls = _reference_offsets(16, 2, 16, 19, 2048)
    assert list(spec.offsets) == offsets
    assert abs(spec.per_level_scale - pls) < 1e-12
    assert spec.output_dim == 32
    # early levels are dense (not hashed): (res+1)^3 fits below 2^19
    assert spec.offsets[1] - spec.offsets[0] == 17**3 + (8 - 17**3 % 8) % 8


def test_dense_level_trilinear_interpolation():
    """On a dense (non-hashed) level, the encoder must do exact trilinear interp."""
    spec = HashGridSpec.build(num_levels=1, base_resolution=4, desired_resolution=None,
                              per_level_scale=1.0, log2_hashmap_size=19)
    table = init_hashgrid(jax.random.PRNGKey(0), spec) * 1e4  # scale up for precision
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3)), jnp.float32)
    out = np.asarray(hashgrid_encode(table, x, spec))

    # numpy reference: scale = base - 1 = 3, pos = x*3 + 0.5, side = 5
    tab = np.asarray(table)
    scale, side = 3.0, 5
    pos = np.asarray(x) * scale + 0.5
    pg0 = np.floor(pos).astype(int)
    f = pos - pg0
    ref = np.zeros((64, spec.level_dim))
    for corner in range(8):
        bits = [(corner >> d) & 1 for d in range(3)]
        w = np.ones(64)
        idx = np.zeros(64, dtype=np.int64)
        stride = 1
        for d in range(3):
            w *= f[:, d] if bits[d] else 1 - f[:, d]
            idx += (pg0[:, d] + bits[d]) * stride
            stride *= side
        hashmap = spec.offsets[1] - spec.offsets[0]
        ref += tab[idx % hashmap] * w[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


def test_hash_level_uses_fast_hash():
    """A level too large to be dense must produce indices via the xor/prime hash."""
    spec = HashGridSpec.build(num_levels=1, base_resolution=512, desired_resolution=None,
                              per_level_scale=1.0, log2_hashmap_size=10)
    assert spec.total_params == 1024
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x = jnp.asarray([[0.25, 0.5, 0.75]], jnp.float32)
    out = np.asarray(hashgrid_encode(table, x, spec))

    tab = np.asarray(table)
    scale = 511.0
    pos = np.asarray(x)[0] * scale + 0.5
    pg0 = np.floor(pos).astype(np.uint32)
    f = pos - pg0
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    ref = np.zeros(spec.level_dim)
    for corner in range(8):
        bits = np.array([(corner >> d) & 1 for d in range(3)], dtype=np.uint32)
        pg = pg0 + bits
        h = np.uint32(0)
        for d in range(3):
            h ^= np.uint32((np.uint64(pg[d]) * primes[d]) & np.uint64(0xFFFFFFFF))
        w = np.prod(np.where(bits, f, 1 - f))
        ref += tab[int(h % 1024)] * w
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-7)


def test_out_of_bounds_inputs_are_zero():
    spec = HashGridSpec.build(desired_resolution=64, num_levels=4)
    table = init_hashgrid(jax.random.PRNGKey(2), spec)
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]], jnp.float32)
    out = np.asarray(hashgrid_encode(table, x, spec))
    assert (out == 0).all()


def test_gradients_wrt_table_and_inputs():
    spec = HashGridSpec.build(desired_resolution=64, num_levels=4)
    table = init_hashgrid(jax.random.PRNGKey(3), spec)
    x = jnp.asarray(np.random.default_rng(4).uniform(-0.9, 0.9, (32, 3)), jnp.float32)

    def loss(t, p):
        return (hashgrid_encode_bounded(t, p, spec, 1.0) ** 2).sum()

    gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
    assert np.isfinite(np.asarray(gt)).all() and np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gt).sum()) > 0

    # finite-difference check on the table (gather grad must be exact scatter-add)
    eps = 1e-3
    idx_flat = int(np.argmax(np.abs(np.asarray(gt))))
    i, j = divmod(idx_flat, spec.level_dim)
    t_p = table.at[i, j].add(eps)
    t_m = table.at[i, j].add(-eps)
    fd = (loss(t_p, x) - loss(t_m, x)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(gt)[i, j], fd, rtol=2e-2)


def test_jit_and_vmap_compatible():
    spec = HashGridSpec.build(desired_resolution=128, num_levels=4)
    table = init_hashgrid(jax.random.PRNGKey(5), spec)
    f = jax.jit(lambda t, x: hashgrid_encode(t, x, spec))
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (8, 3)), jnp.float32)
    out = f(table, x)
    assert out.shape == (8, spec.output_dim)
