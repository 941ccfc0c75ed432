"""Unit tests: shape constructors + mass properties vs analytic formulas."""

import numpy as np
import pytest

from starframe_tpu.shapes import Shape


def test_circle_mass():
    s = Shape.circle(2.0)
    m, i = s.mass_properties(density=3.0)
    np.testing.assert_allclose(m, 3.0 * np.pi * 4.0, rtol=1e-6)
    np.testing.assert_allclose(i, m * 2.0, rtol=1e-6)  # 1/2 m r^2


def test_box_mass():
    s = Shape.box(1.5, 0.5)
    m, i = s.mass_properties(density=2.0)
    np.testing.assert_allclose(m, 2.0 * 3.0 * 1.0, rtol=1e-6)
    # I = m (w^2 + h^2) / 12 about center
    np.testing.assert_allclose(i, m * (3.0**2 + 1.0**2) / 12.0, rtol=1e-5)


def test_capsule_mass_matches_montecarlo(rng):
    hl, r = 1.0, 0.4
    s = Shape.capsule(hl, r)
    m, i = s.mass_properties(density=1.0)
    # Monte Carlo over the bounding box
    n = 200_000
    pts = rng.uniform([-hl - r, -r], [hl + r, r], size=(n, 2))
    x = np.clip(pts[:, 0], -hl, hl)
    inside = (pts[:, 0] - x) ** 2 + pts[:, 1] ** 2 <= r * r
    area_box = (2 * (hl + r)) * (2 * r)
    m_mc = inside.mean() * area_box
    i_mc = (np.where(inside, (pts**2).sum(1), 0.0)).mean() * area_box
    np.testing.assert_allclose(m, m_mc, rtol=0.01)
    np.testing.assert_allclose(i, i_mc, rtol=0.02)


def test_rounded_box_mass_matches_montecarlo(rng):
    s = Shape.box(1.0, 0.8, radius=0.3)
    m, i = s.mass_properties(density=1.0)
    n = 200_000
    pts = rng.uniform([-1.0, -0.8], [1.0, 0.8], size=(n, 2))
    cx, cy = 0.7, 0.5  # core half-extents
    qx = np.maximum(np.abs(pts[:, 0]) - cx, 0)
    qy = np.maximum(np.abs(pts[:, 1]) - cy, 0)
    inside = qx * qx + qy * qy <= 0.3**2
    area_box = 2.0 * 1.6
    m_mc = inside.mean() * area_box
    i_mc = (np.where(inside, (pts**2).sum(1), 0.0)).mean() * area_box
    np.testing.assert_allclose(m, m_mc, rtol=0.01)
    np.testing.assert_allclose(i, i_mc, rtol=0.02)


def test_hexagon_area():
    s = Shape.hexagon(1.0)
    m, _ = s.mass_properties(1.0)
    np.testing.assert_allclose(m, 3 * np.sqrt(3) / 2, rtol=1e-5)


def test_polygon_ccw_enforced():
    with pytest.raises(ValueError):
        Shape(verts=np.array([[0, 0], [0, 1], [1, 0]]))  # CW via Shape directly


def test_offset_collider_inertia_parallel_axis():
    """Inertia about origin for an offset circle follows parallel axis."""
    import starframe_tpu as sf

    b = sf.WorldBuilder()
    body = b.add_body(pos=(0, 0))
    b.add_collider(body, Shape.circle(0.5), offset=(2.0, 0.0), density=1.0)
    world, _ = b.build()
    m = np.pi * 0.25
    expected_i = m * (0.5**2 / 2 + 4.0)
    got_i = 1.0 / float(world.bodies.inv_inertia[body])
    np.testing.assert_allclose(got_i, expected_i, rtol=1e-5)


def test_aabb():
    s = Shape.capsule(1.0, 0.25)
    lo, hi = s.aabb()
    np.testing.assert_allclose(lo, [-1.25, -0.25])
    np.testing.assert_allclose(hi, [1.25, 0.25])
