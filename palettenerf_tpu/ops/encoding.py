"""Encoder factory — parity with the reference ``encoding.py:45-78`` get_encoder.

Returns ``(encode_fn, output_dim, init_fn)`` for a named encoding. Encoders are
functional: ``init_fn(key) -> params-or-None``; ``encode_fn(params, x, **kw) -> feats``.
Supported names match the reference: None / frequency / sphere_harmonics / hashgrid /
tiledgrid ("ash" was an external experimental encoder in the reference and is not
supported here).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

from .freq import freq_encode, freq_output_dim
from .hashgrid import HashGridSpec, init_hashgrid
from .hashgrid_fast import hashgrid_encode_fast_bounded
from .sh import sh_encode, sh_output_dim


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: float = 2048,
    align_corners: bool = False,
    **kwargs,
) -> Tuple[Callable, int, Callable]:
    if encoding in (None, "None", "none"):
        return (lambda params, x, **kw: x), input_dim, (lambda key: None)

    if encoding == "frequency":
        return (
            lambda params, x, **kw: freq_encode(x, multires),
            freq_output_dim(input_dim, multires),
            lambda key: None,
        )

    if encoding == "sphere_harmonics":
        return (
            lambda params, d, **kw: sh_encode(d, degree),
            sh_output_dim(degree),
            lambda key: None,
        )

    if encoding in ("hashgrid", "tiledgrid"):
        spec = HashGridSpec.build(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution, log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
        )

        def encode(params, x, bound: float = 1.0, **kw):
            return hashgrid_encode_fast_bounded(params, x, spec, bound)

        encode.spec = spec  # expose for callers needing construction details
        return encode, spec.output_dim, (lambda key: init_hashgrid(key, spec))

    raise NotImplementedError(
        f"Unknown encoding '{encoding}'; choose from "
        "[None, frequency, sphere_harmonics, hashgrid, tiledgrid]"
    )
