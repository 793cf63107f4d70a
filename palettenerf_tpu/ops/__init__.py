"""TPU-native compute ops (the Pallas/XLA replacement for the reference CUDA extensions)."""

from .activation import trunc_exp
from .composite import (
    composite_channels,
    composite_rays,
    composite_weights,
    spread_ray_to_sample,
)
from .freq import freq_encode, freq_output_dim
from .hashgrid import HashGridSpec, hashgrid_encode, hashgrid_encode_bounded, init_hashgrid
from .march import MarchResult, candidate_ts, march_rays, mip_level
from .morton import morton3d, morton3d_invert
from .occupancy import (
    GridState,
    init_grid_state,
    mark_untrained_grid,
    occ_lookup,
    packbits,
    update_density_grid,
)
from .rays import near_far_from_aabb, sph_from_ray
from .sh import sh_encode, sh_output_dim

__all__ = [
    "trunc_exp",
    "composite_channels", "composite_rays", "composite_weights", "spread_ray_to_sample",
    "freq_encode", "freq_output_dim",
    "HashGridSpec", "hashgrid_encode", "hashgrid_encode_bounded", "init_hashgrid",
    "MarchResult", "candidate_ts", "march_rays", "mip_level",
    "morton3d", "morton3d_invert",
    "GridState", "init_grid_state", "mark_untrained_grid", "occ_lookup", "packbits",
    "update_density_grid",
    "near_far_from_aabb", "sph_from_ray",
    "sh_encode", "sh_output_dim",
]
