"""Continuous collision detection (bullet bodies).

Reference surface: starframe/Box2D bullet semantics (SURVEY.md §2 row 6's
CCD deferral closed in r3): a body flagged ``bullet=True`` must not tunnel
through thin geometry at ANY speed. TPU-native realization: no per-pair TOI
root-finding loop — the frame's speculative manifolds already carry
frame-start normals + anchors, so the clamp is one fused P-last pass
(kernels.bullet_advance_scale) + a scatter-min, inside the same jitted
substep.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from starframe_tpu.config import SolverConfig
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder
from starframe_tpu.step import step_world

CFG = SolverConfig(dt=1 / 60, substeps=10, ccd=True)
WALL_FACE = -0.15  # wall half-width 0.1 + bullet radius 0.05


def _bullet_world(speed, restitution=0.0, bullet=True, target="static"):
    wb = WorldBuilder()
    wb.gravity = (0.0, 0.0)
    wall = wb.add_body(pos=(0.0, 0.0), body_type=target)
    wb.add_collider(wall, Shape.box(0.1, 2.0), restitution=restitution)
    b = wb.add_body(pos=(-3.0, 0.0), vel=(speed, 0.0), bullet=bullet)
    wb.add_collider(b, Shape.circle(0.05), restitution=restitution)
    return wb.build()


def _run(w, cfg, frames=30):
    stepj = jax.jit(lambda w: step_world(w, cfg, max_pairs=16))
    for _ in range(frames):
        w = stepj(w)
    return w


@pytest.mark.parametrize("speed", [200.0, 1000.0, 10000.0])
def test_bullet_never_tunnels(speed):
    w, _ = _bullet_world(speed)
    w = _run(w, CFG)
    x = float(w.bodies.pos[1, 0])
    # stopped ON the near face (within contact margin + ccd slop)
    assert WALL_FACE - 0.06 < x <= WALL_FACE + 0.01, x


def test_without_ccd_fast_bullet_crosses():
    """Pins the failure mode the feature exists for: at 1000 m/s one substep
    jumps the whole wall and the rate-capped discrete solve extrudes the
    body out the FAR side."""
    w, _ = _bullet_world(1000.0, bullet=False)
    w = _run(w, dataclasses.replace(CFG, ccd=False))
    assert float(w.bodies.pos[1, 0]) > 0.0


def test_bullet_restitution_sees_true_approach_speed():
    """The TOI clamp scales positions, not velocities: the velocity pass
    must see the full 1000 m/s approach and reflect ~e * v."""
    w, _ = _bullet_world(1000.0, restitution=0.9)
    w = _run(w, CFG, frames=10)
    vx = float(w.bodies.vel[1, 0])
    assert -950.0 < vx < -820.0, vx


def test_bullet_into_dynamic_target_transfers_momentum():
    w, _ = _bullet_world(500.0, target="dynamic")
    w = _run(w, CFG)
    # no tunnel: bullet stays behind the (now moving) wall body
    assert float(w.bodies.pos[1, 0]) < float(w.bodies.pos[0, 0])
    # momentum went somewhere real: the wall picked up forward speed
    assert float(w.bodies.vel[0, 0]) > 0.1


def test_ccd_inert_for_unflagged_scenes():
    """ccd=True must not perturb ordinary scenes: no body is flagged, so
    trajectories match the ccd=False run bitwise."""
    def build():
        wb = WorldBuilder()
        wb.gravity = (0.0, -10.0)
        g = wb.add_body(pos=(0.0, -0.5), body_type="static")
        wb.add_collider(g, Shape.box(5.0, 0.5))
        b = wb.add_body(pos=(0.1, 2.0), vel=(1.0, 0.0))
        wb.add_collider(b, Shape.box(0.2, 0.2), restitution=0.4)
        return wb.build()

    w_on, _ = build()
    w_off, _ = build()
    w_on = _run(w_on, CFG, frames=60)
    w_off = _run(w_off, dataclasses.replace(CFG, ccd=False), frames=60)
    assert jnp.array_equal(w_on.bodies.pos, w_off.bodies.pos)
    assert jnp.array_equal(w_on.bodies.angle, w_off.bodies.angle)


def test_ccd_requires_frame_manifolds():
    w, _ = _bullet_world(100.0)
    bad = dataclasses.replace(CFG, manifold_refresh="substep")
    with pytest.raises(ValueError, match="manifold_refresh"):
        step_world(w, bad, max_pairs=16)
