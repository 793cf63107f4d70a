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
    b = np.asarray(hashgrid_encode_fast(table, x, None, spec))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fast_oob_zeros():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x = jnp.asarray([[1.2, 0.5, 0.5], [-0.1, 0.5, 0.5]], jnp.float32)
    out = np.asarray(hashgrid_encode_fast(table, x, None, spec))
    assert (out == 0).all()


def test_fast_grad_matches_golden():
    spec = HashGridSpec.build(num_levels=6, desired_resolution=256, log2_hashmap_size=14)
    table = init_hashgrid(jax.random.PRNGKey(2), spec)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (128, 3)), jnp.float32)
    co = jnp.asarray(np.random.default_rng(4).normal(size=(128, spec.output_dim)), jnp.float32)

    g_gold = jax.grad(lambda t: (hashgrid_encode(t, x, spec) * co).sum())(table)
    g_fast = jax.grad(lambda t: (hashgrid_encode_fast(t, x, None, spec) * co).sum())(table)
    np.testing.assert_allclose(np.asarray(g_gold), np.asarray(g_fast), rtol=1e-4, atol=1e-6)


def test_fast_grad_oob_contributes_zero():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(5), spec)
    x = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)  # fully out of bounds
    g = jax.grad(lambda t: hashgrid_encode_fast(t, x, None, spec).sum())(table)
    assert float(jnp.abs(g).sum()) == 0.0


def test_fast_bf16_table():
    spec = HashGridSpec.build(num_levels=4, desired_resolution=64)
    table = init_hashgrid(jax.random.PRNGKey(6), spec).astype(jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (64, 3)), jnp.float32)
    out = hashgrid_encode_fast(table, x, None, spec)
    assert out.dtype == jnp.bfloat16
    g = jax.grad(lambda t: hashgrid_encode_fast(t, x, None, spec).astype(jnp.float32).sum())(table)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


class TestStochasticTrilerp:
    """Single-corner Monte-Carlo trilinear (stochastic=True): unbiased forward
    estimator, exact gradient of the realized function."""

    def _spec(self):
        return HashGridSpec.build(num_levels=4, level_dim=2, base_resolution=4,
                                  log2_hashmap_size=9, desired_resolution=32)

    def test_output_is_some_corner_value(self):
        """Each output feature must equal one of the 8 exact corner features."""
        spec = self._spec()
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.02, maxval=0.98)
        out = hashgrid_encode_fast(table, x, None, spec, None, False, True)
        from palettenerf_tpu.ops.hashgrid_fast import _all_indices
        idx, _ = _all_indices(spec, x)
        K = 8
        for lvl in range(spec.num_levels):
            got = np.asarray(out[:, lvl * 2:(lvl + 1) * 2])
            corners = np.asarray(table)[np.asarray(idx[:, lvl * K:(lvl + 1) * K])]
            match = np.any(np.all(np.isclose(corners, got[:, None, :]), -1), 1)
            assert match.all(), f"level {lvl}: output not a corner value"

    def test_unbiased_expectation_under_jitter(self):
        """Averaging the stochastic encode over a dense cloud of jittered
        positions must approach the exact encode's average over the same cloud
        (the estimator is unbiased conditional on position)."""
        spec = self._spec()
        key = jax.random.PRNGKey(2)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        base = jnp.asarray([[0.37, 0.52, 0.61]])
        jit = jax.random.uniform(jax.random.PRNGKey(3), (20000, 3),
                                 minval=-0.03, maxval=0.03)
        x = jnp.clip(base + jit, 0, 1)
        exact = hashgrid_encode_fast(table, x, None, spec)
        stoch = hashgrid_encode_fast(table, x, None, spec, None, False, True)
        e, s = np.asarray(exact).mean(0), np.asarray(stoch).mean(0)
        scale = np.abs(e).mean() + 1e-3
        assert np.abs(e - s).max() / scale < 0.15, (e - s)

    def test_gradient_routes_to_drawn_corner(self):
        """grad wrt table must be nonzero exactly at the gathered rows, with the
        output cotangent (weight 1)."""
        spec = self._spec()
        key = jax.random.PRNGKey(4)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(5), (32, 3), minval=0.05, maxval=0.95)

        out, idxinfo = None, None
        g = jax.grad(lambda t: hashgrid_encode_fast(t, x, None, spec, None, False, True).sum())(table)
        g = np.asarray(g)
        out = np.asarray(hashgrid_encode_fast(table, x, None, spec, None, False, True))
        # every row with nonzero grad must have an integer multiple of the
        # cotangent 1.0 (counts of samples that drew it)
        nz = np.abs(g) > 0
        assert nz.any()
        vals = g[nz.any(-1)]
        assert np.allclose(vals, np.round(vals), atol=1e-5)

    def test_oob_zero(self):
        spec = self._spec()
        table = jnp.ones((spec.total_params, spec.level_dim))
        x = jnp.asarray([[1.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
        out = hashgrid_encode_fast(table, x, None, spec, None, False, True)
        assert float(jnp.abs(out[0]).max()) == 0.0
        assert float(jnp.abs(out[1]).min()) > 0.0


class TestHashXAddPairs:
    """gridtype='hash_xadd': x enters the hash additively so both x-corners are
    adjacent rows; the fast path fetches them as one overlapped pair row."""

    def _spec(self, gridtype="hash_xadd"):
        return HashGridSpec.build(num_levels=6, level_dim=2, base_resolution=4,
                                  log2_hashmap_size=9, desired_resolution=64,
                                  gridtype=gridtype)

    def test_exact_matches_golden(self):
        """Pair-path exact forward == golden all-corner encode for hash_xadd."""
        spec = self._spec()
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
        a = np.asarray(hashgrid_encode(table, x, spec))
        b = np.asarray(hashgrid_encode_fast(table, x, None, spec))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_x_adjacency_in_hashed_level(self):
        """For overflow levels the +1-in-x corner must live at index+1 (mod size)."""
        from palettenerf_tpu.ops.hashgrid_fast import _corner_global_index
        spec = self._spec()
        lvl = spec.num_levels - 1  # finest level must overflow at lg9
        size = spec.offsets[lvl + 1] - spec.offsets[lvl]
        assert (spec.resolutions[lvl] + 1) ** 3 > size, "test needs an overflow level"
        pg = jax.random.randint(jax.random.PRNGKey(2), (128, 3), 0, spec.resolutions[lvl])
        i0 = np.asarray(_corner_global_index(spec, lvl, pg)) - spec.offsets[lvl]
        i1 = np.asarray(_corner_global_index(spec, lvl, pg + jnp.asarray([1, 0, 0]))) - spec.offsets[lvl]
        np.testing.assert_array_equal((i0 + 1) % size, i1)

    def test_grad_matches_golden(self):
        spec = self._spec()
        key = jax.random.PRNGKey(3)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=0.02, maxval=0.98)
        co = jax.random.normal(jax.random.PRNGKey(5), (64, spec.output_dim))
        g_gold = jax.grad(lambda t: (hashgrid_encode(t, x, spec) * co).sum())(table)
        g_fast = jax.grad(lambda t: (hashgrid_encode_fast(t, x, None, spec) * co).sum())(table)
        np.testing.assert_allclose(np.asarray(g_gold), np.asarray(g_fast),
                                   rtol=1e-4, atol=1e-4)

    def test_stochastic_pair_unbiased(self):
        """Pair-stochastic mode (exact x-interp, MC over y/z corners) must match the
        exact encode in expectation over the PRNG draws."""
        from palettenerf_tpu.ops.hashgrid_fast import EncodeRand
        spec = self._spec()
        key = jax.random.PRNGKey(6)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(7), (16, 3), minval=0.05, maxval=0.95)
        exact = np.asarray(hashgrid_encode_fast(table, x, None, spec))
        acc = 0.0
        R = 300
        for r in range(R):
            u = jax.random.uniform(jax.random.PRNGKey(100 + r), (16, spec.num_levels))
            acc = acc + np.asarray(hashgrid_encode_fast(
                table, x, EncodeRand(u=u, lvls=None), spec, None, False, True))
        np.testing.assert_allclose(acc / R, exact, atol=0.12)

    def test_grad_levels_subsample_unbiased(self):
        """grad_levels=K backward: expectation over subsets == full gradient."""
        from palettenerf_tpu.ops.hashgrid_fast import EncodeRand
        spec = self._spec()
        key = jax.random.PRNGKey(8)
        table = jax.random.normal(key, (spec.total_params, spec.level_dim))
        x = jax.random.uniform(jax.random.PRNGKey(9), (32, 3), minval=0.05, maxval=0.95)
        co = jax.random.normal(jax.random.PRNGKey(10), (32, spec.output_dim))
        g_full = np.asarray(jax.grad(
            lambda t: (hashgrid_encode_fast(t, x, None, spec) * co).sum())(table))
        K = 2
        acc = 0.0
        R = 200
        for r in range(R):
            lvls = jax.random.permutation(jax.random.PRNGKey(500 + r), spec.num_levels)[:K]
            rand = EncodeRand(u=None, lvls=lvls)
            acc = acc + np.asarray(jax.grad(
                lambda t: (hashgrid_encode_fast(t, x, rand, spec, None, False, False, K) * co).sum())(table))
        np.testing.assert_allclose(acc / R, g_full, atol=np.abs(g_full).max() * 0.25 + 1e-3)
