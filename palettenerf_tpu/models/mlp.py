"""Minimal functional MLP building blocks.

Parameters are plain dict pytrees (no framework) so that cross-stage warm-starts can be
done by name mapping, mirroring the reference's reliance on shared ``nn.Module`` names
(``palette/utils.py:1306-1330``). Initialization replicates ``torch.nn.Linear`` defaults
(kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); same bound for bias)
so training dynamics match the reference's.

Weights are stored ``[in, out]`` (row-vector convention: ``y = x @ W + b``) — the
transpose of torch's layout but the natural layout for TPU MXU matmuls.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_linear(key, in_dim: int, out_dim: int, bias: bool = False, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_mlp(key, dims: Sequence[int], bias: bool = False, dtype=jnp.float32):
    """dims = [in, hidden..., out]; returns list of layer param dicts."""
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, dims[i], dims[i + 1], bias, dtype) for i, k in enumerate(keys)]


def apply_mlp(layers, x, activation: Callable = jax.nn.relu, final_activation: Optional[Callable] = None):
    h = x
    for i, p in enumerate(layers):
        h = apply_linear(p, h)
        if i != len(layers) - 1:
            h = activation(h)
    if final_activation is not None:
        h = final_activation(h)
    return h
