"""Scene description and packing into struct-of-arrays PyTrees.

Replaces the reference's OO scene graph + uniform marshaling:
  * the 12 ``Object`` subclasses under /root/reference/src/lib/Objects/ become
    plain Python dataclasses with the same fields and defaults;
  * ``ObjectLoader`` (/root/reference/src/lib/ObjectLoader/objectLoader.cpp:27-109)
    becomes :func:`build_scene`, which packs a heterogeneous object list into
    typed struct-of-arrays jnp arrays — the TPU analog of the GLSL uniform
    arrays (black_hole.frag:96-180).  Materials are deduplicated by identity
    like the reference's pointer map (objectLoader.cpp:83-92), but indices
    start at 0 (we do NOT reproduce the reference quirk where ``materials[0]``
    is never written).

Closest-hit tie-breaking follows candidate order: black hole first, then
spheres, planes, disks, hollow disks, cylinders, rectangles, boxes (the
reference's linear scan keeps the first strict minimum, black_hole.frag:805-814).

No singletons, no mutation: ``build_scene`` returns an immutable PyTree that
is a plain function argument of the renderer (the "uniform upload" is just
argument passing under jit).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

# Object type codes (black_hole.frag:162-171).
OBJECT_TYPE_TEST_RAY_CURVED = -99
OBJECT_TYPE_TEST_RAY_FLAT = -98
OBJECT_TYPE_SPECIAL = -42  # the black-hole horizon sphere
OBJECT_TYPE_SPHERE = 0
OBJECT_TYPE_PLANE = 1
OBJECT_TYPE_DISK = 2
OBJECT_TYPE_HOLLOW_DISK = 3
OBJECT_TYPE_CYLINDER = 4
OBJECT_TYPE_RECTANGLE = 5
OBJECT_TYPE_BOX = 6

_IDENTITY = np.eye(3, dtype=np.float32)


def _axes(value) -> np.ndarray:
    a = np.asarray(value, np.float32)
    if a.shape != (3, 3):
        raise ValueError(f"axes must be (3,3) column frame, got {a.shape}")
    return a


# ---------------------------------------------------------------------------
# User-facing dataclasses (defaults match the reference classes exactly).
# ---------------------------------------------------------------------------


@dataclass(eq=False)
class Material:
    """Phong material (material.h:53-64).

    The reference has two upload bugs we deliberately fix: the ctor
    self-assigns shininess (material.cpp:7) and ``invert_uv_y`` uploads
    ``m_invertUvX`` (material.cpp:120).
    """

    color: Tuple[float, float, float, float] = (0.5, 0.0, 0.5, 1.0)
    ambient: float = 0.1
    diffuse: float = 0.9
    specular: float = 0.5
    shininess: float = 32.0
    texture_index: int = -1
    normal_map_index: int = -1
    invert_uv_x: bool = False
    invert_uv_y: bool = False
    swap_uvs: bool = False
    double_sided_normals: bool = True
    flip_normals: bool = False


DEFAULT_MATERIAL = Material()


@dataclass(eq=False)
class Light:
    """Point light (light.h:11-13, light.cpp:4)."""

    pos: Tuple[float, float, float] = (10.0, 10.0, 10.0)
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    intensity: float = 2.5
    attenuation_constant: float = 1.0
    attenuation_linear: float = 0.09
    attenuation_quadratic: float = 0.032


@dataclass(eq=False)
class _Primitive:
    pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    axes: np.ndarray = field(default_factory=lambda: _IDENTITY.copy())
    material: Optional[Material] = None


@dataclass(eq=False)
class Sphere(_Primitive):
    """pos = center (sphere.h:7-26)."""

    radius: float = 1.0


@dataclass(eq=False)
class Plane(_Primitive):
    """Infinite plane; pos = some point, normal = up axis (plane.h:27-29)."""

    texture_offset: Tuple[float, float] = (0.0, 0.0)
    texture_size: Tuple[float, float] = (1.0, 1.0)
    repeat_texture: bool = True


@dataclass(eq=False)
class Disk(Plane):
    """Filled disk; pos = center (disk.h:20)."""

    radius: float = 1.0


@dataclass(eq=False)
class HollowDisk(Plane):
    """Annulus — the accretion disk (hollowDisk.h:23-24; defaults span
    2.5..5 Schwarzschild radii)."""

    inner_radius: float = 2.5
    outer_radius: float = 5.0


@dataclass(eq=False)
class LateralCylinder(_Primitive):
    """Open cylinder without caps; pos = base center
    (lateralCylinder.h:22-23)."""

    height: float = 5.0
    radius: float = 1.0


@dataclass(eq=False)
class Rectangle(Plane):
    """pos = top-left corner; extents along local x (width) and z (height)
    (rectangle.h:23-24)."""

    width: float = 1.0
    height: float = 1.0


@dataclass(eq=False)
class Box(_Primitive):
    """Axis box; pos = left-bottom-back corner (box.h:26-28)."""

    width: float = 1.0
    depth: float = 1.0
    height: float = 1.0


# ---------------------------------------------------------------------------
# Packed struct-of-arrays PyTrees.
# ---------------------------------------------------------------------------


class MaterialsSoA(NamedTuple):
    color: jnp.ndarray  # (M, 4)
    ambient: jnp.ndarray  # (M,)
    diffuse: jnp.ndarray
    specular: jnp.ndarray
    shininess: jnp.ndarray
    texture_index: jnp.ndarray  # (M,) int32
    normal_map_index: jnp.ndarray  # (M,) int32
    invert_uv_x: jnp.ndarray  # (M,) bool
    invert_uv_y: jnp.ndarray
    swap_uvs: jnp.ndarray
    double_sided_normals: jnp.ndarray
    flip_normals: jnp.ndarray


class LightsSoA(NamedTuple):
    pos: jnp.ndarray  # (L, 3)
    color: jnp.ndarray  # (L, 3)
    intensity: jnp.ndarray  # (L,)
    attenuation_constant: jnp.ndarray
    attenuation_linear: jnp.ndarray
    attenuation_quadratic: jnp.ndarray


class SpheresSoA(NamedTuple):
    pos: jnp.ndarray  # (N, 3)
    axes: jnp.ndarray  # (N, 3, 3)
    radius: jnp.ndarray  # (N,)
    mat_idx: jnp.ndarray  # (N,) int32


class PlanesSoA(NamedTuple):
    pos: jnp.ndarray
    axes: jnp.ndarray
    texture_offset: jnp.ndarray  # (N, 2)
    texture_size: jnp.ndarray  # (N, 2)
    repeat_texture: jnp.ndarray  # (N,) bool
    mat_idx: jnp.ndarray


class DisksSoA(NamedTuple):
    pos: jnp.ndarray
    axes: jnp.ndarray
    radius: jnp.ndarray
    mat_idx: jnp.ndarray


class HollowDisksSoA(NamedTuple):
    pos: jnp.ndarray
    axes: jnp.ndarray
    inner_radius: jnp.ndarray
    outer_radius: jnp.ndarray
    mat_idx: jnp.ndarray


class CylindersSoA(NamedTuple):
    pos: jnp.ndarray
    axes: jnp.ndarray
    height: jnp.ndarray
    radius: jnp.ndarray
    mat_idx: jnp.ndarray


class RectanglesSoA(NamedTuple):
    pos: jnp.ndarray
    axes: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    mat_idx: jnp.ndarray


class BoxesSoA(NamedTuple):
    """Boxes are stored as their 6 derived face rectangles, precomputed on the
    host (the reference rebuilds them per pixel per step,
    black_hole.frag:586-648 — pointless work inside a TPU kernel).

    Face order matches the reference: bot, top, front, back, left, right; the
    4x3 cube-map atlas UV offsets (black_hole.frag:667-692) are stored
    alongside.
    """

    face_pos: jnp.ndarray  # (N, 6, 3)
    face_axes: jnp.ndarray  # (N, 6, 3, 3)
    face_width: jnp.ndarray  # (N, 6)
    face_height: jnp.ndarray  # (N, 6)
    atlas_offset: jnp.ndarray  # (6, 2) — (du, dv) added before /4, /3
    mat_idx: jnp.ndarray  # (N,) int32


class Scene(NamedTuple):
    materials: MaterialsSoA
    lights: LightsSoA
    spheres: SpheresSoA
    planes: PlanesSoA
    disks: DisksSoA
    hollow_disks: HollowDisksSoA
    cylinders: CylindersSoA
    rectangles: RectanglesSoA
    boxes: BoxesSoA


# Atlas UV offsets per face before the /4, /3 rescale (black_hole.frag:667-692).
_BOX_ATLAS_OFFSETS = np.array(
    [
        [1.0, 0.0],  # bot
        [1.0, 2.0],  # top
        [1.0, 1.0],  # front
        [3.0, 1.0],  # back
        [0.0, 1.0],  # left
        [2.0, 1.0],  # right
    ],
    np.float32,
)


def box_faces(pos, axes, width, depth, height):
    """The 6 face rectangles of a box, exactly as built in
    black_hole.frag:587-649.

    ``axes`` columns are (x, y, z) = (right, up, forward); returns
    (face_pos (6,3), face_axes (6,3,3), face_width (6,), face_height (6,)).
    """
    pos = np.asarray(pos, np.float32)
    axes = np.asarray(axes, np.float32)
    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]

    def frame(c0, c1, c2):
        return np.stack([c0, c1, c2], axis=-1)

    faces = [
        # bot (frag:587-598)
        (pos + az * depth, frame(ax, -ay, -az), width, depth),
        # top (frag:599-603)
        (pos + ay * height, axes, width, depth),
        # front (frag:617-625): note front is defined from back_rect
        (pos + ax * 0.0 + ay * height + az * depth, frame(ax, az, -ay), width, height),
        # back (frag:605-616)
        (pos + ax * width + ay * height, frame(-ax, -az, -ay), width, height),
        # left (frag:627-638)
        (pos + ay * height, frame(az, -ax, -ay), depth, height),
        # right (frag:639-647)
        (pos + ax * width + ay * height + az * depth, frame(-az, ax, -ay), depth, height),
    ]
    # Reference iterates rects[] in order (bot, top, front, back, left, right)
    # (frag:649) — keep identical order for tie-breaking parity.
    fp = np.stack([f[0] for f in faces])
    fa = np.stack([f[1] for f in faces])
    fw = np.array([f[2] for f in faces], np.float32)
    fh = np.array([f[3] for f in faces], np.float32)
    return fp, fa, fw, fh


def build_scene(
    objects: Sequence[_Primitive] = (),
    lights: Sequence[Light] = (),
) -> Scene:
    """Pack dataclass objects into a :class:`Scene` of jnp arrays."""
    # Deduplicate materials by identity, insertion order (objectLoader.cpp:83-92).
    materials: list[Material] = []
    mat_ids: dict[int, int] = {}

    def mat_index(m: Optional[Material]) -> int:
        m = m if m is not None else DEFAULT_MATERIAL
        key = id(m)
        if key not in mat_ids:
            mat_ids[key] = len(materials)
            materials.append(m)
        return mat_ids[key]

    by_type: dict[type, list] = {
        Sphere: [],
        Plane: [],
        Disk: [],
        HollowDisk: [],
        LateralCylinder: [],
        Rectangle: [],
        Box: [],
    }
    for obj in objects:
        for cls in (Sphere, Disk, HollowDisk, Rectangle, Plane, LateralCylinder, Box):
            if isinstance(obj, cls):
                by_type[cls].append(obj)
                break
        else:
            raise TypeError(f"unsupported object {type(obj)}")

    def f32(rows, shape):
        return jnp.asarray(np.array(rows, np.float32).reshape((len(rows),) + shape))

    def i32(rows):
        return jnp.asarray(np.array(rows, np.int32))

    def b8(rows):
        return jnp.asarray(np.array(rows, bool))

    def common(objs):
        pos = f32([o.pos for o in objs], (3,))
        axes = f32([_axes(o.axes) for o in objs], (3, 3))
        mi = i32([mat_index(o.material) for o in objs])
        return pos, axes, mi

    sp = by_type[Sphere]
    s_pos, s_axes, s_mi = common(sp)
    spheres = SpheresSoA(s_pos, s_axes, f32([o.radius for o in sp], ()), s_mi)

    pl = by_type[Plane]
    p_pos, p_axes, p_mi = common(pl)
    planes = PlanesSoA(
        p_pos,
        p_axes,
        f32([o.texture_offset for o in pl], (2,)),
        f32([o.texture_size for o in pl], (2,)),
        b8([o.repeat_texture for o in pl]),
        p_mi,
    )

    dk = by_type[Disk]
    d_pos, d_axes, d_mi = common(dk)
    disks = DisksSoA(d_pos, d_axes, f32([o.radius for o in dk], ()), d_mi)

    hd = by_type[HollowDisk]
    h_pos, h_axes, h_mi = common(hd)
    hollow_disks = HollowDisksSoA(
        h_pos,
        h_axes,
        f32([o.inner_radius for o in hd], ()),
        f32([o.outer_radius for o in hd], ()),
        h_mi,
    )

    cy = by_type[LateralCylinder]
    c_pos, c_axes, c_mi = common(cy)
    cylinders = CylindersSoA(
        c_pos, c_axes, f32([o.height for o in cy], ()), f32([o.radius for o in cy], ()), c_mi
    )

    rc = by_type[Rectangle]
    r_pos, r_axes, r_mi = common(rc)
    rectangles = RectanglesSoA(
        r_pos, r_axes, f32([o.width for o in rc], ()), f32([o.height for o in rc], ()), r_mi
    )

    bx = by_type[Box]
    face_data = [box_faces(o.pos, _axes(o.axes), o.width, o.depth, o.height) for o in bx]
    boxes = BoxesSoA(
        face_pos=f32([fd[0] for fd in face_data], (6, 3)),
        face_axes=f32([fd[1] for fd in face_data], (6, 3, 3)),
        face_width=f32([fd[2] for fd in face_data], (6,)),
        face_height=f32([fd[3] for fd in face_data], (6,)),
        atlas_offset=jnp.asarray(_BOX_ATLAS_OFFSETS),
        mat_idx=i32([mat_index(o.material) for o in bx]),
    )

    if not materials:
        mat_index(DEFAULT_MATERIAL)
    mats = MaterialsSoA(
        color=f32([m.color for m in materials], (4,)),
        ambient=f32([m.ambient for m in materials], ()),
        diffuse=f32([m.diffuse for m in materials], ()),
        specular=f32([m.specular for m in materials], ()),
        shininess=f32([m.shininess for m in materials], ()),
        texture_index=i32([m.texture_index for m in materials]),
        normal_map_index=i32([m.normal_map_index for m in materials]),
        invert_uv_x=b8([m.invert_uv_x for m in materials]),
        invert_uv_y=b8([m.invert_uv_y for m in materials]),
        swap_uvs=b8([m.swap_uvs for m in materials]),
        double_sided_normals=b8([m.double_sided_normals for m in materials]),
        flip_normals=b8([m.flip_normals for m in materials]),
    )

    lt = list(lights)
    lights_soa = LightsSoA(
        pos=f32([l.pos for l in lt], (3,)),
        color=f32([l.color for l in lt], (3,)),
        intensity=f32([l.intensity for l in lt], ()),
        attenuation_constant=f32([l.attenuation_constant for l in lt], ()),
        attenuation_linear=f32([l.attenuation_linear for l in lt], ()),
        attenuation_quadratic=f32([l.attenuation_quadratic for l in lt], ()),
    )

    return Scene(
        materials=mats,
        lights=lights_soa,
        spheres=spheres,
        planes=planes,
        disks=disks,
        hollow_disks=hollow_disks,
        cylinders=cylinders,
        rectangles=rectangles,
        boxes=boxes,
    )


def empty_scene() -> Scene:
    return build_scene([], [])
