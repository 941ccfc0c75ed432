"""Scene container shared by all builders."""

from __future__ import annotations

import dataclasses

from ..config import Capacity, SolverConfig
from ..state import World
from ..step import make_step, make_rollout


@dataclasses.dataclass
class Scene:
    name: str
    world: World
    capacity: Capacity
    config: SolverConfig

    @property
    def n_bodies(self) -> int:
        import numpy as np

        return int(np.asarray(self.world.bodies.active.sum()))

    def make_step(self, with_contacts: bool = False, donate: bool = True):
        return make_step(self.config, self.capacity.max_pairs, with_contacts, donate)

    def make_rollout(self, n_frames: int, record=None):
        return make_rollout(self.config, self.capacity.max_pairs, n_frames, record)


def add_ground(builder, half_width: float = 100.0, y: float = 0.0,
               thickness: float = 1.0, friction: float = 0.6):
    """Static ground slab centered at (0, y - thickness/2)."""
    from ..shapes import Shape

    g = builder.add_static(pos=(0.0, y - thickness / 2))
    builder.add_collider(g, Shape.box(half_width, thickness / 2), friction=friction)
    return g
