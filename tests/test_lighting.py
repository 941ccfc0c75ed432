"""Radiance-cascades GI (SURVEY.md §2 row 18): light falls off with
distance, occluders cast shadows, emitters glow."""

import numpy as np

import starframe_tpu as sf
from starframe_tpu.lighting import Light, illuminate
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


def _world_with_wall():
    b = WorldBuilder()
    w = b.add_static(pos=(0.0, 0.0))
    b.add_collider(w, Shape.box(0.3, 2.0))  # vertical wall at x=0
    return b.build()[0]


def test_gi_shadowing_and_falloff():
    world = _world_with_wall()
    light = Light(pos=(-4.0, 0.0), color=(1.0, 0.9, 0.7), radius=0.4,
                  intensity=3.0)
    img = np.asarray(illuminate(world, [light], lo=(-8, -8), hi=(8, 8),
                                res=128, n_cascades=4, ambient=0.0))
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()

    def lum(x, y):  # world -> pixel (flipud applied in illuminate)
        px = int((x + 8) / 16 * 128)
        py = 127 - int((y + 8) / 16 * 128)
        return img[py, px].sum()

    near = lum(-3.0, 0.0)   # beside the light
    lit = lum(-1.0, 0.0)    # light side of the wall
    shadow = lum(1.5, 0.0)  # directly behind the wall
    open_far = lum(-4.0, 4.0)  # same distance, no occluder
    assert near > lit > 0, (near, lit)
    assert shadow < 0.35 * lit, f"wall casts no shadow: lit={lit} shadow={shadow}"
    assert open_far > shadow, (open_far, shadow)


def test_gi_body_attached_light_moves():
    b = WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(10.0, 0.5))
    ball = b.add_body(pos=(3.0, 2.0))
    b.add_collider(ball, Shape.circle(0.3))
    world = b.build()[0]
    light = Light(pos=(0.0, 0.0), body=ball, intensity=2.0, radius=0.5)
    img = np.asarray(illuminate(world, [light], lo=(-6, -2), hi=(6, 6),
                                res=64, n_cascades=3, ambient=0.0))
    # brightest region should be near the ball (x=3, y=2)
    iy, ix = np.unravel_index(np.argmax(img.sum(-1)), img.shape[:2])
    wx = -6 + (ix + 0.5) / 64 * 12
    wy = 6 - (iy + 0.5) / 64 * 8
    assert abs(wx - 3.0) < 1.0 and abs(wy - 2.0) < 1.0, (wx, wy)
