from .nerf_renderer import RenderSettings, render_nerf_eval, render_nerf_train

__all__ = ["RenderSettings", "render_nerf_eval", "render_nerf_train"]
