"""Capability-surface tests: spatial queries (SURVEY.md §2 row 12), the
headless observer (row 17), and the fixed-timestep game shell (rows 13-14)."""

import os

import numpy as np

import starframe_tpu as sf
from starframe_tpu.shapes import Shape


def _scene():
    b = sf.WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(10.0, 0.5))
    ball = b.add_body(pos=(0.0, 2.0))
    b.add_collider(ball, Shape.circle(0.5))
    box = b.add_body(pos=(3.0, 1.0), angle=0.3)
    b.add_collider(box, Shape.box(0.6, 0.4))
    cap = b.add_body(pos=(-3.0, 1.0))
    b.add_collider(cap, Shape.capsule(0.8, 0.25))
    world, capacity = b.build()
    return world, capacity, (g, ball, box, cap)


def test_raycast_hits_each_shape():
    world, _, (g, ball, box, cap) = _scene()
    # straight down onto the ball
    hit = sf.raycast(world, origin=(0.0, 5.0), direction=(0.0, -1.0))
    assert bool(hit.hit) and int(hit.body) == ball
    np.testing.assert_allclose(float(hit.point[1]), 2.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.normal), [0.0, 1.0], atol=1e-3)
    # down onto the capsule body
    hit = sf.raycast(world, origin=(-3.0, 5.0), direction=(0.0, -1.0))
    assert bool(hit.hit) and int(hit.body) == cap
    # miss entirely
    hit = sf.raycast(world, origin=(0.0, 5.0), direction=(0.0, 1.0))
    assert not bool(hit.hit)
    # max_t cuts the hit off
    hit = sf.raycast(world, origin=(0.0, 5.0), direction=(0.0, -1.0), max_t=1.0)
    assert not bool(hit.hit)


def test_query_point_and_pick_body():
    world, _, (g, ball, box, cap) = _scene()
    mask = np.asarray(sf.query_point(world, (0.0, 2.0)))
    assert mask[1]  # ball collider
    assert not mask[2]
    assert sf.queries.pick_body(world, (0.0, 2.0)) == ball
    assert sf.queries.pick_body(world, (50.0, 50.0)) == -1
    # rotated box containment
    assert sf.queries.pick_body(world, (3.0, 1.0)) == box


def test_query_aabb():
    world, _, (g, ball, box, cap) = _scene()
    mask = np.asarray(sf.query_aabb(world, (-0.6, 1.4), (0.6, 2.6)))
    assert mask[1] and not mask[2] and not mask[3]


def test_observer_svg_and_png(tmp_path):
    world, capacity, _ = _scene()
    step = sf.make_step(sf.SolverConfig(), capacity.max_pairs, with_contacts=True,
                        donate=False)
    world, contacts, diag = step(world)
    p = sf.observer.render_svg(world, str(tmp_path / "scene.svg"), contacts=contacts)
    data = open(p).read()
    assert "<svg" in data and "polyline" in data
    assert os.path.getsize(p) > 500
    p2 = sf.observer.render_png(world, str(tmp_path / "scene.png"))
    assert os.path.exists(p2)


def test_game_fixed_timestep_and_interpolation():
    world, capacity, (g, ball, *_ ) = _scene()
    game = sf.Game(world, sf.SolverConfig(), capacity.max_pairs)

    class S:
        ticks = 0

        def tick(self, game):
            self.ticks += 1

        def draw(self, game, alpha):
            assert 0.0 <= alpha <= 1.0

    s = S()
    game.run_ticks(s, 10)
    assert s.ticks == 10
    assert int(game.world.step_count) == 10
    # interpolated poses lie between prev and current
    pos, ang = game.interpolated_poses(0.5)
    prev = np.asarray(game.world.bodies.prev_pos[ball, 1])
    cur = np.asarray(game.world.bodies.pos[ball, 1])
    mid = float(np.asarray(pos)[ball, 1])
    lo, hi = min(prev, cur), max(prev, cur)
    assert lo - 1e-6 <= mid <= hi + 1e-6

    # wall-clock accumulator: two frames 1/30s apart -> 2 ticks each
    ft = sf.FixedTimestep(dt=1 / 60)
    ft.advance(now=0.0)
    ticks, alpha = ft.advance(now=1 / 30)
    assert ticks == 2

    # input cache
    game.input.feed_down("space")
    assert game.input.just_pressed("space") and game.input.is_down("space")
    game.input.end_frame()
    assert not game.input.just_pressed("space") and game.input.is_down("space")


def test_despawn_body():
    from starframe_tpu.state import despawn_body

    world, capacity, (g, ball, box, cap) = _scene()
    world = despawn_body(world, ball)
    assert not bool(world.bodies.active[ball])
    step = sf.make_step(sf.SolverConfig(), capacity.max_pairs, donate=False)
    w = world
    for _ in range(30):
        w = step(w)
    # despawned ball no longer simulates or collides
    np.testing.assert_allclose(
        np.asarray(w.bodies.pos[ball]), np.asarray(world.bodies.pos[ball]), atol=1e-6
    )
    hit = sf.raycast(w, origin=(0.0, 5.0), direction=(0.0, -1.0))
    assert int(hit.body) != ball
