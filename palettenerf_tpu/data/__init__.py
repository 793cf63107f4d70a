from .provider import NeRFDataset
from .rays import gen_rays, sample_ray_indices

__all__ = ["NeRFDataset", "gen_rays", "sample_ray_indices"]
