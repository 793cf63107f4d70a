"""Pallas window-gather gadget vs numpy (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from palettenerf_tpu.ops.pallas_window_gather import window_gather


def test_window_gather_matches_numpy():
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (8, 128))
    r = jax.random.randint(key, (100, 128), 0, 8)
    c = jax.random.randint(jax.random.PRNGKey(1), (100, 128), 0, 128)
    interpret = jax.default_backend() != "tpu"
    out = window_gather(W, r, c, interpret=interpret)
    ref = np.asarray(W)[np.asarray(r), np.asarray(c)]
    np.testing.assert_allclose(np.asarray(out), ref)


def test_window_gather_multirow_window():
    key = jax.random.PRNGKey(2)
    W = jax.random.normal(key, (16, 128))
    r = jax.random.randint(key, (64, 128), 0, 16)
    c = jax.random.randint(jax.random.PRNGKey(3), (64, 128), 0, 128)
    interpret = jax.default_backend() != "tpu"
    out = window_gather(W, r, c, interpret=interpret)
    ref = np.asarray(W)[np.asarray(r), np.asarray(c)]
    np.testing.assert_allclose(np.asarray(out), ref)
