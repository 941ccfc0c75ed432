"""Game loop / app shell: fixed timestep with accumulator + interpolation.

Host-side rebuild of starframe's ``Game::run`` / ``GameState`` trait
(SURVEY.md §2 row 13, §3.1 [K-high]): a fixed-dt accumulator loop pumping the
jitted physics step, with render interpolation between the last two physics
poses. Headless N-step rollouts should instead use
:func:`starframe_tpu.step.rollout` (on-device ``lax.scan``).

Also includes the thin :class:`Input` state tracker standing in for
starframe's winit-fed input cache (SURVEY.md §2 row 14 — out of metric
scope; programmatic event feed instead of a window system).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Protocol

import numpy as np

from . import math2d as m2
from .config import SolverConfig
from .state import World
from .step import make_step


class GameState(Protocol):
    """The user-facing loop hooks (starframe's GameState trait analogue)."""

    def tick(self, game: "Game") -> Optional[World]:
        """Called once per fixed timestep. May return a modified world."""
        ...

    def draw(self, game: "Game", alpha: float) -> None:
        """Called once per frame with interpolation factor ``alpha``."""
        ...


class Input:
    """Pressed/held/released tracking for programmatic events."""

    def __init__(self):
        self._down: set = set()
        self._pressed: set = set()
        self._released: set = set()
        self.pointer = np.zeros(2, np.float32)

    def feed_down(self, key):
        if key not in self._down:
            self._pressed.add(key)
        self._down.add(key)

    def feed_up(self, key):
        if key in self._down:
            self._released.add(key)
        self._down.discard(key)

    def feed_pointer(self, xy):
        self.pointer = np.asarray(xy, np.float32)

    def is_down(self, key) -> bool:
        return key in self._down

    def just_pressed(self, key) -> bool:
        return key in self._pressed

    def just_released(self, key) -> bool:
        return key in self._released

    def end_frame(self):
        self._pressed.clear()
        self._released.clear()


class FixedTimestep:
    """Accumulator producing 0..max_ticks_per_frame physics ticks per frame
    plus the render interpolation factor (starframe's signature loop)."""

    def __init__(self, dt: float, max_ticks_per_frame: int = 5):
        self.dt = dt
        self.max_ticks = max_ticks_per_frame
        self._acc = 0.0
        self._last: Optional[float] = None

    def advance(self, now: Optional[float] = None) -> tuple[int, float]:
        now = time.perf_counter() if now is None else now
        if self._last is None:
            self._last = now
        self._acc += now - self._last
        self._last = now
        ticks = min(int(self._acc / self.dt), self.max_ticks)
        self._acc -= ticks * self.dt
        self._acc = min(self._acc, self.dt)  # drop backlog beyond one tick
        return ticks, self._acc / self.dt


class Game:
    """Owns the world + jitted step and pumps a GameState.

    ``run(state, frames=...)`` drives a wall-clock loop;
    ``run_ticks(state, n)`` advances exactly n fixed ticks (deterministic,
    test-friendly).
    """

    def __init__(self, world: World, cfg: SolverConfig, max_pairs: int):
        self.world = world
        self.cfg = cfg
        self.input = Input()
        self._step = make_step(cfg, max_pairs, donate=False)
        self.timestep = FixedTimestep(cfg.dt)
        self.frame = 0

    def tick_once(self, state: Optional[GameState] = None):
        if state is not None:
            out = state.tick(self)
            if out is not None:
                self.world = out
        self.world = self._step(self.world)
        self.input.end_frame()
        self.frame += 1

    def run_ticks(self, state: Optional[GameState], n: int):
        for _ in range(n):
            self.tick_once(state)
        return self.world

    def run(self, state: GameState, frames: int, now_fn: Callable[[], float] = time.perf_counter):
        for _ in range(frames):
            ticks, alpha = self.timestep.advance(now_fn())
            for _ in range(ticks):
                self.tick_once(state)
            state.draw(self, alpha)
        return self.world

    def interpolated_poses(self, alpha: float):
        """Render-interpolated body poses (SURVEY.md §3.1)."""
        b = self.world.bodies
        return m2.pose_lerp(b.prev_pos, b.prev_angle, b.pos, b.angle, alpha)
