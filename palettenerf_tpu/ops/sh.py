"""Spherical-harmonics direction encoding, pure ``jnp``.

Replaces the reference CUDA kernel (``shencoder/src/shencoder.cu:28-120``) — the analytic
real-SH polynomial basis needs no custom kernel on TPU: XLA fuses the polynomial
evaluation into neighbouring ops, and autodiff provides exact input gradients, so this is
already "speed of light" (VPU-bound elementwise math).

Conventions match the reference wrapper (``shencoder/sphere_harmonics.py:61-80``):
inputs are direction vectors in [-1, 1]^3 (unit-norm in practice), output dim = degree².
Supported degree 1..4 covers every configuration the reference ships (degree 4 default,
``encoding.py:59-61``).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.48860251190291987


def sh_encode(d, degree: int = 4):
    """d: [..., 3] direction in [-1,1]; returns [..., degree**2]."""
    if not 1 <= degree <= 4:
        raise ValueError(f"sh_encode supports degree 1..4, got {degree}")

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if degree >= 2:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree
