"""Ropes: particle chains with XPBD stretch/bend constraints.

Rebuild of starframe's rope system (SURVEY.md §2 row 10; BASELINE.json:5,9
"particle ropes", "rope bridge … attachment constraints"): particles are
ordinary point-mass bodies (zero inverse inertia) in the body arrays; stretch
constraints between consecutive particles and optional bend constraints
(distance between second neighbors) are rows of the shared joint table, so
the solver needs no rope-specific code path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .shapes import Shape
from .state import BodyKey, WorldBuilder


@dataclasses.dataclass(frozen=True)
class Rope:
    """Handle to a spawned rope: its particle body keys and joint keys."""

    particles: tuple
    stretch_joints: tuple
    bend_joints: tuple
    spacing: float
    thickness: float


def attach_rope(
    builder: WorldBuilder,
    start,
    end,
    n_particles: int,
    thickness: float = 0.05,
    density: float = 1.0,
    compliance: float = 0.0,
    bend_compliance: float = -1.0,
    damping: float = 0.0,
    collide: bool = True,
    friction: float = 0.3,
    layer: int = 0,
    mask: int = -1,
    body_start: int | None = None,
    body_end: int | None = None,
) -> Rope:
    """Spawn a rope of ``n_particles`` point masses between two world points.

    ``body_start``/``body_end``: optionally pin the rope ends to existing
    rigid bodies via attachment (pin) constraints (SURVEY.md §3.4). With
    ``collide=True`` each particle gets a small circle collider so the rope
    collides with bodies (self-collision excluded via adjacent layers is the
    caller's concern; neighboring particles overlap by construction and rely
    on the same-body exclusion not applying — use ``mask`` to tune).
    """
    start = np.asarray(start, np.float32)
    end = np.asarray(end, np.float32)
    seg = (end - start) / max(n_particles - 1, 1)
    spacing = float(np.linalg.norm(seg))
    mass = density * spacing * thickness if spacing > 0 else density * thickness**2

    particles = []
    for i in range(n_particles):
        p = start + seg * i
        key = builder.add_particle(pos=p, mass=mass)
        particles.append(key)
        if collide:
            builder.add_collider(
                key,
                Shape.circle(thickness / 2),
                friction=friction,
                density=0.0,
                layer=layer,
                mask=mask,
            )

    stretch = []
    for a, b in zip(particles[:-1], particles[1:]):
        stretch.append(
            builder.distance_joint(a, b, rest=spacing, compliance=compliance, damping=damping)
        )
    bends = []
    if bend_compliance >= 0.0 and n_particles >= 3:
        for a, b in zip(particles[:-2], particles[2:]):
            bends.append(
                builder.distance_joint(a, b, rest=2 * spacing, compliance=bend_compliance)
            )

    if body_start is not None:
        builder.pin_joint(BodyKey(body_start), particles[0], world_point=start)
    if body_end is not None:
        builder.pin_joint(BodyKey(body_end), particles[-1], world_point=end)

    return Rope(
        particles=tuple(particles),
        stretch_joints=tuple(stretch),
        bend_joints=tuple(bends),
        spacing=spacing,
        thickness=thickness,
    )
