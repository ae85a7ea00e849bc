"""schwarzschild_tpu — a TPU-native differentiable Schwarzschild raytracer.

Brand-new JAX/Pallas re-design of the capabilities of the reference OpenGL
application (Yachim/schwarzschild-raytracer): the per-pixel GLSL geodesic
shader becomes a vectorized/jitted ray march (and a Pallas kernel on the hot
path), the OO scene graph becomes struct-of-arrays PyTrees, uniform upload
becomes function arguments, and everything is differentiable end-to-end.
"""

from .config import RenderConfig
from .camera import (
    CURVED,
    FLAT,
    HALF_HEIGHT,
    HALF_WIDTH,
    Camera,
    hyperbolic_trajectory,
    look_at,
    make_camera,
)
from .scene import (
    Box,
    Disk,
    HollowDisk,
    LateralCylinder,
    Light,
    Material,
    Plane,
    Rectangle,
    Scene,
    Sphere,
    build_scene,
    empty_scene,
)
from .intersect import Hit, TestRay, intersect_scene
from .render import render, save_png, to_uint8
from .geometry import Transform, make_transform
from .shading import get_background, shade
from .textures import (
    Texture,
    TextureStack,
    build_mips,
    from_array,
    load_texture,
    load_texture_array,
    solid_color_texture,
    stack_textures,
    stack_with_dtype,
    stack_with_mips,
    with_dtype,
    with_mips,
)

__version__ = "0.1.0"
