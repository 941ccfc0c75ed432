"""Property tests (SURVEY.md §4.4): no tunneling for bounded velocity,
momentum conservation for frictionless collisions. Hypothesis drives values
only — shapes/capacities are fixed so every example reuses one compiled step
(one CPU core + slow XLA compiles make compile-sharing mandatory here).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

import starframe_tpu as sf
from starframe_tpu.shapes import Shape

_MOMENTUM = {}


def _momentum_setup():
    if _MOMENTUM:
        return _MOMENTUM["world"], _MOMENTUM["step"]
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    b1 = b.add_body(pos=(-2.0, 0.0))
    b.add_collider(b1, Shape.circle(0.5), friction=0.0, restitution=1.0)
    b2 = b.add_body(pos=(2.0, 0.0))
    b.add_collider(b2, Shape.circle(0.5), friction=0.0, restitution=1.0)
    world, cap = b.build()
    step = sf.make_step(sf.SolverConfig(restitution_threshold=0.01),
                        cap.max_pairs, donate=False)
    _MOMENTUM.update(world=world, step=step)
    return world, step


@settings(max_examples=8, deadline=None)
@given(
    v1=st.floats(0.5, 6.0),
    v2=st.floats(-6.0, 0.5),
    offset=st.floats(-0.3, 0.3),
)
def test_momentum_conserved_in_frictionless_collision(v1, v2, offset):
    world, step = _momentum_setup()
    vel = world.bodies.vel.at[0].set(jnp.asarray([v1, 0.0]))
    vel = vel.at[1].set(jnp.asarray([v2, 0.0]))
    pos = world.bodies.pos.at[1, 1].set(offset)
    w = dataclasses.replace(
        world, bodies=dataclasses.replace(world.bodies, vel=vel, pos=pos)
    )
    p0 = float(w.bodies.vel[0, 0] + w.bodies.vel[1, 0])
    for _ in range(90):
        w = step(w)
    p1 = float(w.bodies.vel[0, 0] + w.bodies.vel[1, 0])
    # equal masses: x-momentum conserved through the collision
    np.testing.assert_allclose(p1, p0, atol=0.08 * max(1.0, abs(p0)))


_TUNNEL = {}


def _tunnel_setup():
    if _TUNNEL:
        return _TUNNEL["world"], _TUNNEL["step"]
    b = sf.WorldBuilder(gravity=(0.0, 0.0))
    g = b.add_static(pos=(0.0, 0.0))
    b.add_collider(g, Shape.box(10.0, 1.0), friction=0.2)
    ball = b.add_body(pos=(0.0, 5.0))
    b.add_collider(ball, Shape.circle(0.3), friction=0.2)
    world, cap = b.build()
    step = sf.make_step(sf.SolverConfig(), cap.max_pairs, donate=False)
    _TUNNEL.update(world=world, step=step)
    return world, step


@settings(max_examples=8, deadline=None)
@given(speed=st.floats(1.0, 55.0), vx=st.floats(-5.0, 5.0))
def test_no_tunneling_for_bounded_velocity(speed, vx):
    """A ball moving <= ~55 u/s (< margin-covered sweep at 60 Hz with
    speculative AABB expansion) must never pass through a 2-unit-thick slab."""
    world, step = _tunnel_setup()
    vel = world.bodies.vel.at[1].set(jnp.asarray([vx, -speed]))
    w = dataclasses.replace(world, bodies=dataclasses.replace(world.bodies, vel=vel))
    for _ in range(40):
        w = step(w)
        y = float(w.bodies.pos[1, 1])
        assert y > 0.9, f"tunneled through slab: y={y} at speed={speed}"
