"""Activations with custom gradients.

``trunc_exp``: exponential whose backward clamps the *input* to [-15, 15] before
re-exponentiating, preventing gradient explosion for large densities. Mirrors the
reference semantics (reference ``activation.py:5-18``): forward is exact ``exp(x)``
computed in float32 regardless of the compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


def _trunc_exp_fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _trunc_exp_bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def softplus(x):
    """Numerically-stable softplus (used for palette radiance/omega heads)."""
    return jax.nn.softplus(x)
