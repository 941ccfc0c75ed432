"""Shape cast (SURVEY.md §2 row 12): analytic swept-shape cases."""

import numpy as np

import starframe_tpu as sf
from starframe_tpu.queries import shape_cast
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


def _world_with_box():
    b = WorldBuilder()
    g = b.add_static(pos=(5.0, 0.0))
    b.add_collider(g, Shape.box(1.0, 1.0))  # box spans x in [4, 6], y [-1, 1]
    return b.build()[0]


def test_swept_circle_hits_box_at_analytic_toi():
    world = _world_with_box()
    sh = Shape.circle(0.5)
    # sweep circle from (0,0) along +x by 10: surface meets box face x=4 when
    # center reaches 3.5 -> t = 0.35
    hit = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                     0.0, (0.0, 0.0), (10.0, 0.0))
    assert bool(hit.hit)
    np.testing.assert_allclose(float(hit.t), 0.35, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.normal), [1.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(hit.point)[0], 4.0, atol=5e-3)
    assert int(hit.collider) == 0


def test_swept_box_misses_when_offset():
    world = _world_with_box()
    sh = Shape.box(0.4, 0.4)
    hit = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                     0.0, (0.0, 3.0), (10.0, 0.0))  # passes above the box
    assert not bool(hit.hit)
    assert not np.isfinite(float(hit.t))


def test_swept_box_diagonal_corner_hit():
    world = _world_with_box()
    sh = Shape.box(0.5, 0.5)
    # sweep diagonally from below-left toward the box corner region
    hit = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                     0.0, (2.0, -4.0), (3.0, 4.0))
    assert bool(hit.hit)
    # contact must happen with surfaces just touching: re-check separation
    t = float(hit.t)
    assert 0.0 < t <= 1.0


def test_cast_starting_in_penetration_hits_at_zero():
    world = _world_with_box()
    sh = Shape.circle(0.5)
    hit = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                     0.0, (5.0, 0.0), (10.0, 0.0))  # starts inside the box
    assert bool(hit.hit)
    assert float(hit.t) == 0.0


def test_cast_ignores_sensors_and_respects_layers():
    b = WorldBuilder()
    g = b.add_static(pos=(3.0, 0.0))
    b.add_collider(g, Shape.box(0.5, 2.0), sensor=True)
    g2 = b.add_static(pos=(6.0, 0.0))
    b.add_collider(g2, Shape.box(0.5, 2.0), layer=3)
    world = b.build()[0]
    sh = Shape.circle(0.3)
    hit = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                     0.0, (0.0, 0.0), (10.0, 0.0))
    assert bool(hit.hit) and int(hit.collider) == 1  # sensor skipped
    hit2 = shape_cast(world, sh.verts, len(sh.verts), sh.radius,
                      0.0, (0.0, 0.0), (10.0, 0.0), mask=~(1 << 3))
    assert not bool(hit2.hit)  # layer 3 masked out
