"""Interactive-feature replacements: the debug test ray.

The reference integrates one geodesic on the CPU when key R is pressed
(/root/reference/src/main.cpp:94-124) and uploads the polyline; the shader
draws it as a chain of red cylinders next to the green un-deflected ray
(black_hole.frag:760-803).  Here the integration is a host-side float32
function producing a :class:`TestRay` PyTree that the renderer consumes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .camera import Camera
from .intersect import TestRay

TEST_RAY_OFFSET = 1.0  # main.cpp:71
MAX_STEPS = 100  # main.cpp:68
MAX_REVOLUTIONS = 2  # main.cpp:69


def calculate_test_ray(cam: Camera, capacity: int = MAX_STEPS + 1,
                       max_steps: int = MAX_STEPS,
                       max_revolutions: int = MAX_REVOLUTIONS,
                       r_s: float = 1.0) -> TestRay:
    """CPU float32 RK4 test-ray integration (main.cpp:94-124).

    Stops when u < 0 (escape) or u > 1/r_s (fell through the horizon —
    main.cpp:117 hard-codes u > 1 because the reference fixes r_s = 1; with
    r_s a free parameter the radius test r < r_s is u·r_s > 1) — note this
    differs from the shader march, which tests the horizon as a scene sphere.
    Returns a fixed-capacity TestRay.
    """
    f32 = np.float32
    direction = np.asarray(cam.forward, f32)
    origin = np.asarray(cam.pos, f32) + direction * f32(TEST_RAY_OFFSET)

    normal_vec = origin / np.linalg.norm(origin).astype(f32)
    max_angle = f32(2.0 * max_revolutions * np.pi)

    if abs(np.dot(direction, normal_vec)) >= 1.0 - 1e-6:  # radial, main.cpp:104
        pts = [origin, origin + direction]
    else:
        tangent_vec = np.cross(np.cross(normal_vec, direction), normal_vec)
        tangent_vec = (tangent_vec / np.linalg.norm(tangent_vec)).astype(f32)
        u = f32(1.0) / np.linalg.norm(origin).astype(f32)
        du = -u * f32(np.dot(direction, normal_vec)) / f32(np.dot(direction, tangent_vec))
        pts = [origin]
        phi = f32(0.0)
        for i in range(max_steps):
            h = (max_angle - phi) / f32(max_steps - i)
            phi = phi + h
            d_u, d_du = _rk4(u, du, h, f32(r_s))
            u = u + d_u
            if u < 0.0 or u * f32(r_s) > 1.0:  # main.cpp:117 (r_s=1 there)
                break
            du = du + d_du
            pts.append(((np.cos(phi) * normal_vec + np.sin(phi) * tangent_vec)
                        / u).astype(f32))

    n = len(pts)
    if n > capacity:
        pts = pts[:capacity]
        n = capacity
    buf = np.zeros((capacity, 3), f32)
    buf[:n] = np.stack(pts)
    # Pad with the last point so inactive segments are degenerate.
    buf[n:] = buf[n - 1]
    return TestRay(
        points=jnp.asarray(buf),
        num_points=jnp.asarray(n, jnp.int32),
        flat_origin=jnp.asarray(origin),
        flat_dir=jnp.asarray(direction),
    )


def _rk4(u, du, h, r_s):
    f32 = np.float32

    def ddu(x):
        return -x * (f32(1.0) - f32(1.5) * r_s * x)

    k1 = du
    l1 = ddu(u)
    k2 = du + f32(0.5) * l1 * h
    l2 = ddu(u + f32(0.5) * k1 * h)
    k3 = du + f32(0.5) * l2 * h
    l3 = ddu(u + f32(0.5) * k2 * h)
    k4 = du + l3 * h
    l4 = ddu(u + k3 * h)
    return (h / f32(6.0) * (k1 + 2 * k2 + 2 * k3 + k4),
            h / f32(6.0) * (l1 + 2 * l2 + 2 * l3 + l4))
