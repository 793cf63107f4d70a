"""Device-mesh sharding helpers: data-parallel over rays.

The reference's distributed backend is torch DDP/NCCL scaffolding that is never actually
launched multi-GPU (SURVEY.md §2.3; ``nerf/utils.py:381-383,977-992``). The TPU-native
equivalent is sharding the ray batch across a ``jax.sharding.Mesh`` axis ("dp") with
replicated parameters: XLA inserts the ``psum`` for the loss/grad all-reduce over ICI —
the hash tables are tens of MB, so replicated-params + ray-DP is both the faithful and
the bandwidth-optimal mapping. The eval all_gather of predictions
(nerf/utils.py:977-992) is likewise just the unsharded jit output.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh; the same
code paths work with processes x local devices (DCN only carries the input pipeline).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard leading (ray) dimension across the dp axis."""
    return NamedSharding(mesh, P(axis))


def shard_rays(mesh: Optional[Mesh], *arrays, axis: str = "dp"):
    """Constrain leading (ray) dim of each array to be sharded over the mesh axis;
    no-op when mesh is None. Used INSIDE jitted train steps — XLA then partitions
    the downstream render/grad compute over rays and inserts the grad psum."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    s = NamedSharding(mesh, P(axis))
    out = tuple(jax.lax.with_sharding_constraint(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
