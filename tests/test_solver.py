"""Solver tests: XPBD single-constraint analytic cases + invariants
(SURVEY.md §4.1, §4.4)."""

import numpy as np
import pytest

import starframe_tpu as sf
from starframe_tpu.shapes import Shape


def run(world, cap, cfg, frames):
    step = sf.make_step(cfg, cap.max_pairs, donate=False)
    for _ in range(frames):
        world = step(world)
    return world


def test_free_fall_matches_analytic():
    b = sf.WorldBuilder()
    ball = b.add_body(pos=(0.0, 100.0))
    b.add_collider(ball, Shape.circle(0.5))
    world, cap = b.build()
    cfg = sf.SolverConfig()
    world = run(world, cap, cfg, 60)  # 1 second, no contacts
    y = float(world.bodies.pos[ball, 1])
    v = float(world.bodies.vel[ball, 1])
    # semi-implicit Euler with substeps h: y = y0 - g*h^2*sum(k) ~ -g t^2/2 - g h t/2
    t, h = 1.0, cfg.h
    y_expected = 100.0 - 9.81 * (t * t / 2 + h * t / 2)
    # f32 position accumulation at magnitude ~100 over 600 substeps
    np.testing.assert_allclose(y, y_expected, atol=0.05)
    np.testing.assert_allclose(v, -9.81 * t, atol=5e-3)


def test_pendulum_period():
    """Point pendulum on a rigid distance constraint: T = 2 pi sqrt(L/g) for
    small angles. (A *pin* joint on a zero-inertia particle would freeze it —
    the anchor offset cannot rotate — so the rod is a distance joint, as in
    starframe's rope/distance constraints.)"""
    L = 2.0
    theta0 = 0.1
    b = sf.WorldBuilder()
    anchor = b.add_static(pos=(0.0, 0.0))
    bob = b.add_particle(pos=(L * np.sin(theta0), -L * np.cos(theta0)), mass=1.0)
    b.distance_joint(anchor, bob, rest=L)
    world, cap = b.build(sf.Capacity(max_bodies=2, max_colliders=1, max_pairs=4, max_joints=1))
    cfg = sf.SolverConfig(substeps=20)
    step = sf.make_step(cfg, cap.max_pairs, donate=False)

    xs = []
    for _ in range(600):  # 10 seconds (~3.5 periods)
        world = step(world)
        xs.append(float(world.bodies.pos[bob, 0]))
    xs = np.array(xs)
    # measure period via zero crossings (positive-going)
    sign = np.sign(xs)
    crossings = np.where((sign[:-1] < 0) & (sign[1:] >= 0))[0]
    assert len(crossings) >= 2, "pendulum did not oscillate"
    period = np.diff(crossings).mean() * cfg.dt
    t_expected = 2 * np.pi * np.sqrt(L / 9.81)
    np.testing.assert_allclose(period, t_expected, rtol=0.03)
    # rod length is preserved
    p = np.asarray(world.bodies.pos[bob])
    np.testing.assert_allclose(np.linalg.norm(p), L, rtol=0.01)


def test_momentum_conserved_frictionless_collision():
    """Two equal circles, head-on, e=1, no gravity: velocities exchange."""
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    b1 = b.add_body(pos=(-2.0, 0.0), vel=(2.0, 0.0))
    b.add_collider(b1, Shape.circle(0.5), friction=0.0, restitution=1.0)
    b2 = b.add_body(pos=(2.0, 0.0), vel=(0.0, 0.0))
    b.add_collider(b2, Shape.circle(0.5), friction=0.0, restitution=1.0)
    world, cap = b.build()
    cfg = sf.SolverConfig(restitution_threshold=0.01)
    world = run(world, cap, cfg, 180)
    v1 = np.asarray(world.bodies.vel[b1])
    v2 = np.asarray(world.bodies.vel[b2])
    # total momentum conserved
    np.testing.assert_allclose(v1[0] + v2[0], 2.0, atol=0.05)
    # elastic exchange: mover stops, target moves on
    assert v2[0] > 1.7, f"target got {v2}"
    assert abs(v1[0]) < 0.3, f"mover kept {v1}"


def test_two_circles_resting_stack():
    b = sf.WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(5.0, 0.5), friction=0.8)
    c1 = b.add_body(pos=(0.0, 0.5))
    b.add_collider(c1, Shape.circle(0.5), friction=0.8)
    # perfectly aligned: any offset makes a circle-on-circle stack roll off
    # (unstable equilibrium — correct physics, verified vs box2d intuition)
    c2 = b.add_body(pos=(0.0, 1.5))
    b.add_collider(c2, Shape.circle(0.5), friction=0.8)
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 240)
    y1 = float(world.bodies.pos[c1, 1])
    y2 = float(world.bodies.pos[c2, 1])
    np.testing.assert_allclose(y1, 0.5, atol=0.03)
    np.testing.assert_allclose(y2, 1.5, atol=0.06)


def test_distance_joint_holds_length():
    b = sf.WorldBuilder()
    anchor = b.add_static(pos=(0.0, 5.0))
    ball = b.add_body(pos=(1.5, 5.0))
    b.add_collider(ball, Shape.circle(0.3))
    b.distance_joint(anchor, ball, rest=1.5)
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 120)
    p = np.asarray(world.bodies.pos[ball]) - [0.0, 5.0]
    np.testing.assert_allclose(np.linalg.norm(p), 1.5, rtol=0.02)


def test_distance_limits_only_constrain_outside():
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    anchor = b.add_static(pos=(0.0, 0.0))
    ball = b.add_body(pos=(1.0, 0.0), vel=(3.0, 0.0))
    b.add_collider(ball, Shape.circle(0.2))
    b.distance_joint(anchor, ball, limits=(0.5, 2.0))
    world, cap = b.build()
    step = sf.make_step(sf.SolverConfig(), cap.max_pairs, donate=False)
    max_d = 0.0
    for _ in range(90):
        world = step(world)
        max_d = max(max_d, float(np.linalg.norm(np.asarray(world.bodies.pos[ball]))))
    assert max_d < 2.1, f"limit overshot: {max_d}"


def test_angular_motor_spins_wheel():
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    hub = b.add_static(pos=(0.0, 0.0))
    wheel = b.add_body(pos=(0.0, 0.0))
    b.add_collider(wheel, Shape.circle(1.0))
    b.pin_joint(hub, wheel, world_point=(0.0, 0.0))
    b.angular_motor(hub, wheel, speed=3.0, max_torque=100.0)
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 120)
    w = float(world.bodies.ang_vel[wheel])
    np.testing.assert_allclose(w, 3.0, rtol=0.05)


def test_motor_torque_budget_respected():
    """A weak motor cannot hold a heavy pendulum horizontal."""
    b = sf.WorldBuilder()
    hub = b.add_static(pos=(0.0, 0.0))
    arm = b.add_body(pos=(1.0, 0.0))
    b.add_collider(arm, Shape.box(1.0, 0.1))
    b.pin_joint(hub, arm, world_point=(0.0, 0.0))
    b.angular_motor(hub, arm, speed=0.0, max_torque=0.01)  # ~zero budget
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 120)
    p = np.asarray(world.bodies.pos[arm])
    assert p[1] < -0.5, f"weak motor should not hold the arm up, pos={p}"


def test_weld_locks_relative_angle():
    b = sf.WorldBuilder()
    base = b.add_body(pos=(0.0, 5.0), angle=0.3)
    b.add_collider(base, Shape.box(0.5, 0.5))
    top = b.add_body(pos=(0.0, 6.0), angle=0.3)
    b.add_collider(top, Shape.box(0.3, 0.3))
    b.weld_joint(base, top, world_point=(0.0, 5.5))
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 90)
    rel = float(world.bodies.angle[top] - world.bodies.angle[base])
    np.testing.assert_allclose(rel, 0.0, atol=0.02)


def test_rope_preserves_length():
    b = sf.WorldBuilder()
    anchor = b.add_static(pos=(0.0, 10.0))
    rope = sf.attach_rope(b, start=(0.0, 10.0), end=(4.0, 10.0), n_particles=10,
                          body_start=anchor, collide=False, damping=4.0)
    world, cap = b.build()
    # joint damping kills relative motion; global linear damping kills the
    # collective pendulum swing so the rope actually settles
    world = run(world, cap, sf.SolverConfig(substeps=15, linear_damping=1.5), 360)
    pts = np.asarray(world.bodies.pos)[list(rope.particles)]
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    np.testing.assert_allclose(seg, rope.spacing, rtol=0.03)
    # settles hanging (roughly) straight down from the anchor
    total_drop = 10.0 - pts[-1, 1]
    np.testing.assert_allclose(total_drop, rope.spacing * 9, rtol=0.1)
    np.testing.assert_allclose(pts[-1, 0], 0.0, atol=0.5)


def test_kinematic_body_moves_and_pushes():
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    plat = b.add_body(pos=(0.0, 0.0), vel=(1.0, 0.0), body_type="kinematic")
    b.add_collider(plat, Shape.box(1.0, 0.2))
    box = b.add_body(pos=(1.6, 0.0))
    b.add_collider(box, Shape.box(0.4, 0.4))
    world, cap = b.build()
    world = run(world, cap, sf.SolverConfig(), 60)
    # kinematic platform moved exactly v*t
    np.testing.assert_allclose(float(world.bodies.pos[plat, 0]), 1.0, atol=1e-4)
    # and pushed the box ahead of it
    assert float(world.bodies.pos[box, 0]) > 2.3
    # platform velocity unchanged by the collision
    np.testing.assert_allclose(float(world.bodies.vel[plat, 0]), 1.0, atol=1e-5)


def test_sensor_detects_but_does_not_collide():
    b = sf.WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -3.0))
    b.add_collider(g, Shape.box(10.0, 0.5))
    zone = b.add_static(pos=(0.0, 0.0))
    b.add_collider(zone, Shape.box(1.0, 1.0), sensor=True)
    ball = b.add_body(pos=(0.0, 3.0))
    b.add_collider(ball, Shape.circle(0.3))
    world, cap = b.build()
    step = sf.make_step(sf.SolverConfig(), cap.max_pairs, with_contacts=True, donate=False)
    seen = False
    for _ in range(120):
        world, contacts, diag = step(world)
        t = np.asarray(contacts.touching)
        ca = np.asarray(contacts.collider_a)
        cb = np.asarray(contacts.collider_b)
        if any(t[i] and (1 in (ca[i], cb[i])) for i in range(len(t))):
            seen = True
    assert seen, "sensor never reported contact"
    # ball fell through the sensor to the ground below
    assert float(world.bodies.pos[ball, 1]) < -2.0
