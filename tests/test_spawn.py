"""Runtime spawn/despawn (SURVEY.md §2 row 2: starframe's spawn APIs work
mid-game): activating pre-allocated rows must not recompile the jitted step,
spawned bodies must participate in collision immediately, and the mouse-grab
flow (SURVEY.md §3.3) must visibly drag a body via a runtime joint."""

import numpy as np

import starframe_tpu as sf
from starframe_tpu.config import Capacity, SolverConfig
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


def _base_world():
    b = WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(20.0, 0.5), friction=0.6)
    ball = b.add_body(pos=(0.0, 1.0))
    b.add_collider(ball, Shape.circle(0.5), friction=0.4)
    world, cap = b.build(reserve_bodies=4, reserve_colliders=4, reserve_joints=2)
    return world, cap, ball


def test_spawn_body_mid_run_no_recompile():
    world, cap, _ = _base_world()
    cfg = SolverConfig(substeps=4)
    step = sf.make_step(cfg, cap.max_pairs, donate=False)

    for _ in range(5):
        world = step(world)
    assert step._cache_size() == 1

    world, key = sf.spawn_body(world, pos=(0.3, 4.0))
    world, _ = sf.spawn_collider(world, key, Shape.circle(0.4), friction=0.4)
    y0 = float(np.asarray(world.bodies.pos)[key, 1])
    for _ in range(90):
        world = step(world)
    # same compiled program served the spawned world (shapes unchanged)
    assert step._cache_size() == 1, "spawn must not trigger recompilation"

    y = float(np.asarray(world.bodies.pos)[key, 1])
    assert y < y0 - 2.0, "spawned body did not fall"
    assert y > 0.3, "spawned body fell through the ground"


def test_spawn_collider_accumulates_mass():
    world, cap, _ = _base_world()
    world, key = sf.spawn_body(world, pos=(5.0, 3.0))
    assert float(np.asarray(world.bodies.inv_mass)[key]) == 0.0  # massless yet
    world, _ = sf.spawn_collider(world, key, Shape.circle(0.5), density=2.0)
    m1 = 1.0 / float(np.asarray(world.bodies.inv_mass)[key])
    world, _ = sf.spawn_collider(world, key, Shape.circle(0.5), density=2.0,
                                 offset=(0.6, 0.0))
    m2 = 1.0 / float(np.asarray(world.bodies.inv_mass)[key])
    np.testing.assert_allclose(m2, 2 * m1, rtol=1e-5)


def test_grab_flow_drags_body_and_releases():
    """Pick -> kinematic cursor + runtime pin joint -> drag -> release."""
    world, cap, ball = _base_world()
    cfg = SolverConfig(substeps=6)
    step = sf.make_step(cfg, cap.max_pairs, donate=False)

    # settle the ball on the ground first
    for _ in range(30):
        world = step(world)
    picked = sf.queries.pick_body(world, (0.0, 0.4))
    assert picked == ball

    # cursor body + soft drag joint (compliance for spring feel, damping to
    # kill oscillation) — the runtime equivalent of starframe's mouse grab
    world, cursor = sf.spawn_body(world, pos=(0.0, 0.5), body_type="kinematic")
    world, grab = sf.spawn_joint(
        world, sf.JOINT_PIN, cursor, picked,
        anchor_a=(0.0, 0.0), anchor_b=(0.0, 0.0),
        compliance=2e-4, damping=20.0,
    )

    # drag the cursor to the right and up over a second
    target = np.array([3.0, 2.5], np.float32)
    for f in range(60):
        t = (f + 1) / 60.0
        cur = np.array([0.0, 0.5], np.float32) * (1 - t) + target * t
        world = sf.set_body_pose(world, cursor, pos=cur, vel=(target - cur) / ((1 - t) * 1 / 60 + 1e-6) * 0)
        world = step(world)
    pos = np.asarray(world.bodies.pos)[picked]
    assert np.linalg.norm(pos - target) < 0.6, f"grab did not drag body: {pos}"

    # release: despawn the joint; ball falls back to the ground
    world = sf.despawn_joint(world, grab)
    world = sf.despawn_body(world, cursor)
    for _ in range(120):
        world = step(world)
    y = float(np.asarray(world.bodies.pos)[picked, 1])
    assert abs(y - 0.5) < 0.1, f"released ball should rest on ground, y={y}"


def test_spawn_joint_recolors():
    b = WorldBuilder()
    g = b.add_static(pos=(0.0, 0.0))
    b.add_collider(g, Shape.box(1.0, 0.5))
    b1 = b.add_body(pos=(1.0, 0.0), mass=1.0, inertia=1.0)
    b2 = b.add_body(pos=(2.0, 0.0), mass=1.0, inertia=1.0)
    b.pin_joint(b1, b2, anchor_a=(0.5, 0), anchor_b=(-0.5, 0))
    world, cap = b.build(reserve_joints=2)
    # a second joint sharing b2 must land in a different color batch
    world, j2 = sf.spawn_joint(world, sf.JOINT_DISTANCE, b2, b1,
                               rest=1.0, lo=1.0, hi=1.0)
    colors = np.asarray(world.joints.color)
    jt = np.asarray(world.joints.jtype)
    live = np.nonzero(jt != 0)[0]
    assert len(live) == 2
    assert colors[live[0]] != colors[live[1]]
