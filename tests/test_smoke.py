"""End-to-end smoke tests: the M1 slice (SURVEY.md §7.9)."""

import numpy as np
import pytest

import starframe_tpu as sf
from starframe_tpu.shapes import Shape


def test_import_and_empty_world():
    cap = sf.Capacity(max_bodies=4, max_colliders=4, max_pairs=16)
    from starframe_tpu.state import empty_world

    w = empty_world(cap)
    assert w.bodies.pos.shape == (4, 2)


def test_single_circle_falls_and_rests():
    b = sf.WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(10.0, 0.5), friction=0.5)
    ball = b.add_body(pos=(0.0, 3.0))
    b.add_collider(ball, Shape.circle(0.5), friction=0.5)
    world, cap = b.build()

    cfg = sf.SolverConfig()
    step = sf.make_step(cfg, cap.max_pairs, donate=False)
    for _ in range(180):  # 3 seconds
        world = step(world)
    y = float(world.bodies.pos[ball, 1])
    # resting on ground (top of ground at y=0) with center at radius
    assert abs(y - 0.5) < 0.02, f"ball rests at {y}, expected 0.5"
    v = np.asarray(world.bodies.vel[ball])
    assert np.linalg.norm(v) < 0.05


def test_box_rests_on_ground():
    b = sf.WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(10.0, 0.5), friction=0.5)
    box = b.add_body(pos=(0.1, 2.0), angle=0.0)
    b.add_collider(box, Shape.box(0.5, 0.5), friction=0.5)
    world, cap = b.build()

    cfg = sf.SolverConfig()
    step = sf.make_step(cfg, cap.max_pairs, donate=False)
    for _ in range(180):
        world = step(world)
    y = float(world.bodies.pos[box, 1])
    ang = float(world.bodies.angle[box])
    assert abs(y - 0.5) < 0.02, f"box rests at {y}"
    assert abs(np.sin(2 * ang)) < 0.05, f"box tilted by {ang}"


def test_determinism_bitexact():
    scene = sf.scenes.box_stack(n_columns=4, n_rows=3)
    step = scene.make_step(donate=False)

    def run():
        w = scene.world
        for _ in range(60):
            w = step(w)
        return np.asarray(w.bodies.pos), np.asarray(w.bodies.angle)

    p1, a1 = run()
    p2, a2 = run()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(a1, a2)


def test_no_overflow_and_finite():
    scene = sf.scenes.box_stack(n_columns=6, n_rows=5)
    step = scene.make_step(with_contacts=True, donate=False)
    w = scene.world
    for _ in range(120):
        w, contacts, diag = step(w)
    diag.assert_no_overflow()
    assert np.all(np.isfinite(np.asarray(w.bodies.pos)))
    assert np.all(np.isfinite(np.asarray(w.bodies.angle)))


def test_rollout_matches_stepwise():
    scene = sf.scenes.box_stack(n_columns=3, n_rows=2)
    step = scene.make_step(donate=False)
    w = scene.world
    for _ in range(30):
        w = step(w)

    final, traj, diags = scene.make_rollout(30)(scene.world)
    np.testing.assert_allclose(
        np.asarray(final.bodies.pos), np.asarray(w.bodies.pos), atol=1e-5
    )
    assert traj[0].shape[0] == 30
