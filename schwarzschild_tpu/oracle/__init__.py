from .reference import OracleScene, render_image, render_pixel, trace_ray

__all__ = ["OracleScene", "render_image", "render_pixel", "trace_ray"]
