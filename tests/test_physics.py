"""Unit tests for the Binet-equation integrator (SURVEY.md section 4 item 1).

JAX here runs f32 (TPU-native); the oracle is f64 numpy.  Tolerances are f32
round-off scale.
"""

import numpy as np
import jax
import jax.numpy as jnp

from schwarzschild_tpu import physics
from schwarzschild_tpu.oracle import reference as oracle


def test_ddu_matches_reference_form():
    # u'' = -u (1 - 1.5 u) at r_s = 1 (black_hole.frag:337).
    us = np.array([0.0, 0.1, 0.5, 1.0, 2.0, -0.3], np.float32)
    got = np.asarray(physics.ddu(jnp.asarray(us)))
    np.testing.assert_allclose(got, -us * (1 - 1.5 * us), rtol=1e-6)


def test_ddu_mass_scaling():
    # General r_s: u'' = -u + 1.5 r_s u^2; r_s=0 gives straight lines u''=-u.
    u = jnp.float32(0.3)
    assert np.isclose(float(physics.ddu(u, r_s=0.0)), -0.3, rtol=1e-6)
    assert np.isclose(float(physics.ddu(u, r_s=2.0)),
                      -0.3 * (1 - 1.5 * 2.0 * 0.3), rtol=1e-6)


def test_rk4_step_matches_oracle(rng):
    n = 200
    u = rng.uniform(0.01, 0.9, n)
    du = rng.uniform(-1, 1, n)
    h = rng.uniform(0.01, 0.3, n)
    d_u, d_du = jax.jit(physics.rk4_step)(
        jnp.asarray(u, jnp.float32), jnp.asarray(du, jnp.float32),
        jnp.asarray(h, jnp.float32))
    exp = np.array([oracle.rk4_step(u[i], du[i], h[i]) for i in range(n)])
    np.testing.assert_allclose(np.asarray(d_u), exp[:, 0], rtol=3e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(d_du), exp[:, 1], rtol=3e-5, atol=2e-6)


def test_rk4_flat_space_closed_form():
    # r_s=0: u'' = -u has solution u = A cos(phi) + B sin(phi).  f64 oracle
    # form already cross-checked against the jnp implementation above.
    u, du = 0.2, 0.15
    phi_total = 1.0
    n = 64
    h = phi_total / n
    uu, dd = u, du
    for _ in range(n):
        d_u, d_du = oracle.rk4_step(uu, dd, h, r_s=0.0)
        uu, dd = uu + d_u, dd + d_du
    exact = u * np.cos(phi_total) + du * np.sin(phi_total)
    assert abs(uu - exact) < 1e-9


def test_binet_invariant_drift_bounded():
    """E = du^2 + u^2(1 - u) conserved along the march (f32, jitted scan)."""

    @jax.jit
    def march(u0, du0):
        max_angle = jnp.float32(4 * np.pi)

        def body(carry, i):
            u, du, phi = carry
            h = (max_angle - phi) / (100.0 - i.astype(jnp.float32))
            phi = phi + h
            d_u, d_du = physics.rk4_step(u, du, h)
            return (u + d_u, du + d_du, phi), None

        (u, du, _), _ = jax.lax.scan(body, (u0, du0, jnp.float32(0.0)),
                                     jnp.arange(100))
        return physics.binet_energy(u, du)

    u0, du0 = jnp.float32(1.0 / 15.0), jnp.float32(0.05)
    e0 = float(physics.binet_energy(u0, du0))
    e1 = float(march(u0, du0))
    assert abs(e1 - e0) < 1e-5 * max(1.0, abs(e0))


def test_initial_conditions_match_shader():
    # frag:886-887 on a concrete ray.
    origin = jnp.array([0.0, 2.0, 15.0])
    d = np.array([0.3, -0.2, -0.9])
    direction = jnp.asarray(d / np.linalg.norm(d), jnp.float32)
    n, t = physics.orbital_plane(origin, direction)
    u, du = physics.initial_conditions(origin, direction, n, t)
    np.testing.assert_allclose(
        np.asarray(n), np.asarray(origin) / np.linalg.norm(origin), rtol=1e-6)
    assert abs(float(jnp.dot(n, t))) < 1e-6
    assert np.isclose(float(jnp.linalg.norm(t)), 1.0, rtol=1e-6)
    assert np.isclose(float(u), 1.0 / np.linalg.norm(origin), rtol=1e-6)
    expected_du = (-float(u) * float(jnp.dot(direction, n))
                   / float(jnp.dot(direction, t)))
    assert np.isclose(float(du), expected_du, rtol=1e-5)


def test_reconstruct_position_roundtrip():
    origin = jnp.array([0.0, 2.0, 15.0])
    d = np.array([0.1, 0.0, -1.0])
    direction = jnp.asarray(d / np.linalg.norm(d), jnp.float32)
    n, t = physics.orbital_plane(origin, direction)
    u, _ = physics.initial_conditions(origin, direction, n, t)
    pos = physics.reconstruct_position(jnp.float32(0.0), u, n, t)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(origin), rtol=1e-5)


def test_step_size_policy_consumes_remaining_angle():
    # (max_angle - phi) / (max_steps - i): lands exactly on max_angle
    # (frag:914).  Pure python mirror of the policy.
    max_angle = 4 * np.pi
    phi = 0.0
    for i in range(100):
        phi += (max_angle - phi) / (100 - i)
    assert np.isclose(phi, max_angle, rtol=1e-6)
