from .nerf import NeRFSpec, init_nerf, nerf_background, nerf_color, nerf_density, nerf_forward

__all__ = [
    "NeRFSpec", "init_nerf", "nerf_background", "nerf_color", "nerf_density", "nerf_forward",
]
