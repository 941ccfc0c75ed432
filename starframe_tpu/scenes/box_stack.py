"""Bench config 1 (BASELINE.json:7): sandbox box-stack drop — ~100 mixed
circle/box bodies on static ground, 60 Hz, 10 XPBD substeps."""

from __future__ import annotations

import numpy as np

from ..config import Capacity, SolverConfig
from ..shapes import Shape
from ..state import WorldBuilder
from .base import Scene, add_ground


def box_stack(
    n_columns: int = 10,
    n_rows: int = 10,
    box_half: float = 0.5,
    spacing: float = 1.2,
    drop_height: float = 0.6,
    circle_fraction: float = 0.5,
    friction: float = 0.6,
    seed: int = 0,
    substeps: int = 10,
) -> Scene:
    """Grid of alternating boxes/circles dropped onto the ground."""
    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    add_ground(b, half_width=max(40.0, n_columns * spacing), friction=friction)

    x0 = -(n_columns - 1) * spacing / 2
    for row in range(n_rows):
        for col in range(n_columns):
            x = x0 + col * spacing + rng.uniform(-0.02, 0.02)
            y = drop_height + box_half + row * spacing * 1.05
            body = b.add_body(pos=(x, y))
            if rng.uniform() < circle_fraction:
                b.add_collider(body, Shape.circle(box_half), friction=friction)
            else:
                b.add_collider(body, Shape.box(box_half, box_half), friction=friction)

    cap = Capacity(
        max_bodies=n_columns * n_rows + 1,
        max_colliders=n_columns * n_rows + 1,
        max_pairs=max(8 * n_columns * n_rows, 256),
        max_joints=0,
        max_verts=4,
    )
    world, cap = b.build(cap)
    cfg = SolverConfig(dt=1 / 60, substeps=substeps)
    return Scene("box_stack", world, cap, cfg)
