"""Island-aware sleeping (SURVEY.md §2 row 11): settled bodies freeze
exactly, a fully-asleep world skips the pipeline, and contact with an awake
body wakes sleepers (temporal sleep propagation replaces explicit islands).
"""

import dataclasses

import numpy as np

import starframe_tpu as sf
from starframe_tpu.config import SolverConfig
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


def _stack_world():
    b = WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(20.0, 0.5), friction=0.6)
    for i in range(3):
        body = b.add_body(pos=(0.0, 0.45 + i * 0.92))
        b.add_collider(body, Shape.box(0.45, 0.45), friction=0.6)
    return b.build(reserve_bodies=1, reserve_colliders=1)


def test_settled_world_sleeps_and_freezes():
    world, cap = _stack_world()
    cfg = SolverConfig(substeps=6, sleep_velocity=0.05, sleep_frames=20)
    step = sf.make_step(cfg, cap.max_pairs, donate=False)

    for _ in range(120):
        world = step(world)
    counts = np.asarray(world.bodies.sleep_count)
    dyn = np.asarray(world.bodies.inv_mass) > 0
    assert (counts[dyn] >= cfg.sleep_frames).all(), counts[dyn]

    # fully asleep: the skip branch must hold poses BITWISE across frames
    pos0 = np.asarray(world.bodies.pos)
    for _ in range(30):
        world = step(world)
    np.testing.assert_array_equal(pos0, np.asarray(world.bodies.pos))
    assert np.all(np.asarray(world.bodies.vel) == 0.0)


def test_impact_wakes_sleeping_stack():
    world, cap = _stack_world()
    cfg = SolverConfig(substeps=6, sleep_velocity=0.05, sleep_frames=20)
    step = sf.make_step(cfg, cap.max_pairs, donate=False)
    for _ in range(120):
        world = step(world)
    assert (np.asarray(world.bodies.sleep_count)[1:4] >= cfg.sleep_frames).all()

    # drop a ball onto the stack: sleepers must wake on contact
    world, ball = sf.spawn_body(world, pos=(0.0, 5.0))
    world, _ = sf.spawn_collider(world, ball, Shape.circle(0.3),
                                 friction=0.5, restitution=0.1)
    woke = False
    for _ in range(90):
        world = step(world)
        counts = np.asarray(world.bodies.sleep_count)
        if (counts[1:4] < cfg.sleep_frames).any():
            woke = True
            break
    assert woke, "impact did not wake the sleeping stack"
    # and the stack still ends up settled again (no explosion)
    for _ in range(240):
        world = step(world)
    pos = np.asarray(world.bodies.pos)
    assert pos[1:4, 1].max() < 3.5
    assert (np.asarray(world.bodies.sleep_count)[1:4] >= cfg.sleep_frames).all()


def test_sleep_trajectory_matches_no_sleep_while_awake():
    """Until anything falls asleep, sleeping must not perturb trajectories."""
    world, cap = _stack_world()
    cfg_on = SolverConfig(substeps=6, sleep_velocity=0.05, sleep_frames=10_000)
    cfg_off = SolverConfig(substeps=6)
    s_on = sf.make_step(cfg_on, cap.max_pairs, donate=False)
    s_off = sf.make_step(cfg_off, cap.max_pairs, donate=False)
    w1, w2 = world, world
    for _ in range(60):
        w1 = s_on(w1)
        w2 = s_off(w2)
    np.testing.assert_allclose(np.asarray(w1.bodies.pos),
                               np.asarray(w2.bodies.pos), atol=1e-5)
