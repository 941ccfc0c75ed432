"""Differential tests against Box2D as an independent physics oracle
(SURVEY.md §4.2): *qualitative* invariants only — both engines solve the
same Newtonian mechanics, so settled heights, stack survival, and energy
decay must agree within coarse tolerances; never bitwise.
"""

import numpy as np
import pytest

import starframe_tpu as sf
from starframe_tpu.shapes import Shape

b2 = pytest.importorskip("Box2D")


def _b2_world():
    return b2.b2World(gravity=(0, -9.81))


def _b2_step(world, frames, dt=1 / 60.0):
    for _ in range(frames):
        world.Step(dt, 10, 10)


def test_pyramid_settles_same_height():
    """5-row box pyramid: final stack height matches Box2D within 10%."""
    rows, half = 5, 0.4
    # --- box2d ---
    bw = _b2_world()
    ground = bw.CreateStaticBody(position=(0, -0.5))
    ground.CreatePolygonFixture(box=(20, 0.5), friction=0.6)
    tops_b2 = []
    for r in range(rows):
        for c in range(rows - r):
            x = (c - (rows - r - 1) / 2) * (2 * half * 1.05)
            y = half + r * 2 * half * 1.02
            body = bw.CreateDynamicBody(position=(x, y))
            body.CreatePolygonFixture(box=(half, half), density=1.0, friction=0.6)
            tops_b2.append(body)
    _b2_step(bw, 180)
    top_b2 = max(b.position.y for b in tops_b2)

    # --- ours ---
    sb = sf.WorldBuilder()
    g = sb.add_static(pos=(0, -0.5))
    sb.add_collider(g, Shape.box(20, 0.5), friction=0.6)
    keys = []
    for r in range(rows):
        for c in range(rows - r):
            x = (c - (rows - r - 1) / 2) * (2 * half * 1.05)
            y = half + r * 2 * half * 1.02
            k = sb.add_body(pos=(x, y))
            sb.add_collider(k, Shape.box(half, half), friction=0.6, density=1.0)
            keys.append(k)
    world, cap = sb.build()
    step = sf.make_step(sf.SolverConfig(), cap.max_pairs, donate=False)
    for _ in range(180):
        world = step(world)
    ys = np.asarray(world.bodies.pos)[keys, 1]
    top_ours = ys.max()

    expected_top = half + (rows - 1) * 2 * half * 1.02
    # the pyramid must still be standing in both engines
    np.testing.assert_allclose(top_b2, expected_top, rtol=0.1)
    np.testing.assert_allclose(top_ours, expected_top, rtol=0.1)
    np.testing.assert_allclose(top_ours, top_b2, rtol=0.1)


def test_ball_drop_energy_decay_envelope():
    """Restitution 0.5 ball: bounce peaks decay ~e² per bounce in both."""
    # box2d
    bw = _b2_world()
    ground = bw.CreateStaticBody(position=(0, -0.5))
    ground.CreatePolygonFixture(box=(20, 0.5), restitution=0.5)
    ball = bw.CreateDynamicBody(position=(0, 4.0))
    f = ball.CreateCircleFixture(radius=0.5, density=1.0, restitution=0.5)
    peaks_b2, prev_y, rising = [], 4.0, False
    for _ in range(600):
        bw.Step(1 / 60.0, 10, 10)
        y = ball.position.y
        if y < prev_y and rising:
            peaks_b2.append(prev_y)
        rising = y > prev_y
        prev_y = y

    # ours
    sb = sf.WorldBuilder()
    g = sb.add_static(pos=(0, -0.5))
    sb.add_collider(g, Shape.box(20, 0.5), restitution=0.5)
    k = sb.add_body(pos=(0, 4.0))
    sb.add_collider(k, Shape.circle(0.5), restitution=0.5, density=1.0)
    world, cap = sb.build()
    step = sf.make_step(sf.SolverConfig(restitution_threshold=0.2), cap.max_pairs, donate=False)
    peaks, prev_y, rising = [], 4.0, False
    for _ in range(600):
        world = step(world)
        y = float(world.bodies.pos[k, 1])
        if y < prev_y and rising:
            peaks.append(prev_y)
        rising = y > prev_y
        prev_y = y

    assert len(peaks) >= 2 and len(peaks_b2) >= 2
    # first rebound height within 20% of box2d's
    np.testing.assert_allclose(peaks[0], peaks_b2[0], rtol=0.2)
    # monotonic decay in both
    assert all(a > b for a, b in zip(peaks, peaks[1:]))


def test_slope_friction_threshold_agrees():
    """tan(20°)≈0.36: μ=0.2 slides, μ=0.6 sticks — in both engines."""
    import math

    angle = math.radians(20)

    def ours(mu):
        sb = sf.WorldBuilder()
        g = sb.add_static(pos=(0, 0), angle=angle)
        sb.add_collider(g, Shape.box(10, 0.5), friction=mu)
        k = sb.add_body(pos=(-0.35, 1.03), angle=angle)
        sb.add_collider(k, Shape.box(0.5, 0.5), friction=mu)
        world, cap = sb.build()
        step = sf.make_step(sf.SolverConfig(), cap.max_pairs, donate=False)
        x0 = float(world.bodies.pos[k, 0])
        for _ in range(90):
            world = step(world)
        return float(world.bodies.pos[k, 0]) - x0

    def theirs(mu):
        bw = _b2_world()
        g = bw.CreateStaticBody(position=(0, 0), angle=angle)
        g.CreatePolygonFixture(box=(10, 0.5), friction=mu)
        body = bw.CreateDynamicBody(position=(-0.35, 1.03), angle=angle)
        body.CreatePolygonFixture(box=(0.5, 0.5), density=1.0, friction=mu)
        x0 = body.position.x
        _b2_step(bw, 90)
        return body.position.x - x0

    for mu, slides in [(0.2, True), (0.6, False)]:
        d_ours, d_b2 = ours(mu), theirs(mu)
        if slides:
            assert d_ours < -0.5, f"ours should slide at mu={mu}: {d_ours}"
            assert d_b2 < -0.5, f"box2d should slide at mu={mu}: {d_b2}"
        else:
            assert abs(d_ours) < 0.08, f"ours should stick at mu={mu}: {d_ours}"
            assert abs(d_b2) < 0.08, f"box2d should stick at mu={mu}: {d_b2}"
