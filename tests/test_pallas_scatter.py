"""tile_scatter_add (Pallas sorted tile scatter) vs a plain XLA scatter-add.

Runs in interpret mode on the CPU test mesh; the same kernel compiles for TPU.
Values are bf16-representable so both paths are exact (on TPU the kernel's MXU
path truncates values to bf16 by design, matching the bf16 scatter_dtype the
trainer uses — reference parity: gridencoder.cu's fp16 atomicAdd accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palettenerf_tpu.ops.pallas_scatter import TILE, TPP, tile_scatter_add


def _ref(idx, vals, total):
    return jnp.zeros((total, vals.shape[1]), jnp.float32).at[idx].add(
        vals.astype(jnp.float32))


@pytest.mark.parametrize("total,U,C", [
    (TILE * TPP * 2, 4096, 2),       # 2 programs
    (TILE * 3 + 17, 2048, 2),        # partial final tile, 1 program
    (TILE * TPP + 1, 8192, 1),       # C=1, boundary straddling
])
def test_matches_xla_scatter(total, U, C):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (U,), 0, total)
    vals = jax.random.normal(k2, (U, C)).astype(jnp.bfloat16).astype(jnp.float32)
    out = tile_scatter_add(idx, vals, total, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(idx, vals, total)),
                               rtol=1e-5, atol=1e-5)


def test_heavy_duplicates_accumulate():
    total = TILE * 2
    U = 4096
    idx = jnp.zeros((U,), jnp.int32).at[1:].set(jnp.arange(1, U) % 7)
    vals = jnp.ones((U, 2), jnp.float32)
    out = tile_scatter_add(idx, vals, total, interpret=True)
    ref = _ref(idx, vals, total)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_empty_tiles_zero():
    total = TILE * TPP          # updates only in tile 0 -> all other tiles empty
    idx = jnp.arange(256, dtype=jnp.int32)
    vals = jnp.ones((256, 2), jnp.float32)
    out = tile_scatter_add(idx, vals, total, interpret=True)
    assert float(jnp.abs(out[TILE:]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(out[:256]), 1.0)
