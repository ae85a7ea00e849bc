"""Null-geodesic physics of the Schwarzschild metric in Binet form.

The reference integrates u(phi) = 1/r along the orbital plane with a classical
RK4 scheme (black_hole.frag:336-355, duplicated CPU-side at
/root/reference/src/main.cpp:73-92).  The ODE for a null geodesic with
Schwarzschild radius r_s is

    u''(phi) = -u (1 - 1.5 r_s u)

The reference hard-codes r_s = 1 (geometric units); we expose ``r_s`` as an
explicit — and differentiable — parameter so inverse rendering can optimize the
black-hole mass.  At r_s=1 this reduces exactly to black_hole.frag:337.

Everything here is scalar math broadcast over arbitrary batch shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import geometry as geo


def ddu(u, r_s=1.0):
    """Second derivative u''(phi) (black_hole.frag:336-338)."""
    return -u * (1.0 - 1.5 * r_s * u)


def rk4_step(u, du, delta_phi, r_s=1.0):
    """One classical RK4 step; returns (delta_u, delta_du)
    (black_hole.frag:341-355)."""
    k1 = du
    l1 = ddu(u, r_s)

    k2 = du + 0.5 * l1 * delta_phi
    l2 = ddu(u + 0.5 * k1 * delta_phi, r_s)

    k3 = du + 0.5 * l2 * delta_phi
    l3 = ddu(u + 0.5 * k2 * delta_phi, r_s)

    k4 = du + l3 * delta_phi
    l4 = ddu(u + k3 * delta_phi, r_s)

    return (
        delta_phi / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4),
        delta_phi / 6.0 * (l1 + 2.0 * l2 + 2.0 * l3 + l4),
    )


def orbital_plane(origin, direction):
    """Basis of the orbital plane through ``origin`` with tangent ``direction``.

    Returns (normal_vec, tangent_vec) where normal_vec = normalize(origin) and
    tangent_vec = normalize(cross(cross(n, dir), n)) (black_hole.frag:865,883).
    """
    n = geo.normalize(origin)
    t = geo.normalize(geo.cross(geo.cross(n, direction), n))
    return n, t


def initial_conditions(origin, direction, normal_vec, tangent_vec):
    """Initial (u, du) for the Binet ODE (black_hole.frag:886-887)."""
    u = 1.0 / geo.length(origin)
    du = -u * geo.dot(direction, normal_vec) / geo.dot(direction, tangent_vec)
    return u, du


def step_size(phi, i, max_angle, max_steps):
    """Adaptive-uniform step in phi: remaining angle over remaining steps
    (black_hole.frag:914).  ``i`` may be traced."""
    return (max_angle - phi) / (max_steps - i)


def reconstruct_position(phi, u, normal_vec, tangent_vec):
    """Cartesian position from polar state (black_hole.frag:925)."""
    return (
        jnp.cos(phi)[..., None] * normal_vec + jnp.sin(phi)[..., None] * tangent_vec
    ) / u[..., None]


def is_radial(direction, normal_vec, epsilon=geo.EPSILON):
    """Radial-trajectory degeneracy test (black_hole.frag:872,902)."""
    return jnp.abs(geo.dot(direction, normal_vec)) >= 1.0 - epsilon


def binet_energy(u, du, r_s=1.0):
    """Conserved quantity of the Binet equation:  E = du^2 + u^2 (1 - r_s u).

    (d/dphi)E = 2 du (u'' + u - 1.5 r_s u^2) = 0 along exact solutions; used by
    the unit tests to bound integrator drift.  Not present in the reference.
    """
    return du * du + u * u * (1.0 - r_s * u)
