"""Frequency (sin/cos) positional encoding, pure ``jnp``.

Replaces the reference CUDA kernel (``freqencoder/src/freqencoder.cu:30-94``) and the
pure-torch fallback (``encoding.py:5-43``). Output layout follows the CUDA version
(``freqencoder/freq.py``): identity first, then per-frequency [sin, cos] interleaved over
the full input vector: ``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x, degree: int = 6):
    """x: [..., D]; returns [..., D * (1 + 2*degree)]."""
    out = [x]
    for i in range(degree):
        s = x * (2.0 ** i)
        out.append(jnp.sin(s))
        out.append(jnp.cos(s))
    return jnp.concatenate(out, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)
