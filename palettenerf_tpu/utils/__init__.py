from .color import hsv_to_rgb, linear_to_srgb, rgb_to_hsv, srgb_to_linear

__all__ = ["hsv_to_rgb", "linear_to_srgb", "rgb_to_hsv", "srgb_to_linear"]
