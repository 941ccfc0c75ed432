"""Unit tests: pose algebra against analytic results (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from starframe_tpu import math2d as m2


def test_rotate_analytic():
    v = jnp.array([1.0, 0.0])
    out = m2.rotate(jnp.pi / 2, v)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0], atol=1e-6)


def test_rotate_inverse_roundtrip(rng):
    v = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
    a = jnp.asarray(rng.uniform(-np.pi, np.pi, size=32), jnp.float32)
    out = m2.rotate_inv(a, m2.rotate(a, v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)


def test_transform_compose(rng):
    pa = jnp.asarray(rng.normal(size=2), jnp.float32)
    aa = 0.7
    pb = jnp.asarray(rng.normal(size=2), jnp.float32)
    ab = -1.2
    v = jnp.asarray(rng.normal(size=2), jnp.float32)
    # (a ∘ b)(v) == a(b(v))
    pc, ac = m2.compose(pa, aa, pb, ab)
    lhs = m2.transform(pc, ac, v)
    rhs = m2.transform(pa, aa, m2.transform(pb, ab, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_transform_inv_roundtrip(rng):
    p = jnp.asarray(rng.normal(size=2), jnp.float32)
    a = 2.1
    v = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    out = m2.transform_inv(p, a, m2.transform(p, a, v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)


def test_cross_and_perp():
    a = jnp.array([1.0, 2.0])
    b = jnp.array([3.0, 4.0])
    assert float(m2.cross2(a, b)) == -2.0
    np.testing.assert_allclose(np.asarray(m2.perp(a)), [-2.0, 1.0])
    np.testing.assert_allclose(np.asarray(m2.perp_cw(a)), [2.0, -1.0])
    # cross_sv(s, v) == s ẑ × v
    np.testing.assert_allclose(np.asarray(m2.cross_sv(2.0, a)), [-4.0, 2.0])


def test_angle_wrap():
    # boundary maps to ±pi (either is correct for the solver's use)
    np.testing.assert_allclose(abs(float(m2.angle_wrap(jnp.pi * 3))), np.pi, atol=1e-6)
    np.testing.assert_allclose(float(m2.angle_wrap(-jnp.pi * 2.5)), -np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(float(m2.angle_wrap(0.3)), 0.3, atol=1e-6)
    np.testing.assert_allclose(float(m2.angle_wrap(2 * jnp.pi + 0.3)), 0.3, atol=1e-5)


def test_normalize_zero_safe():
    unit, n = m2.normalize(jnp.zeros(2))
    assert float(n) == 0.0
    assert np.all(np.isfinite(np.asarray(unit)))


def test_pose_lerp_shortest_path():
    p, a = m2.pose_lerp(
        jnp.zeros(2), jnp.float32(3.0), jnp.ones(2), jnp.float32(-3.0), 0.5
    )
    # 3.0 -> -3.0 goes the short way through pi
    assert abs(abs(float(a)) - np.pi) < 0.15
