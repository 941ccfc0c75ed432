"""Sorted-sweep tile engine (pallas/tiles.py) vs the XLA path.

The tile engine's project/apply split makes each substep a synchronous
Jacobi step with the same math as solver.substep (manifold_refresh='frame'),
so trajectories must agree to float-accumulation tolerance. Runs in Pallas
interpret mode on any backend; the compiled path is exercised on TPU."""

import numpy as np
import pytest

import jax

import starframe_tpu as sf
from starframe_tpu.config import Capacity, SolverConfig
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder
from starframe_tpu.tiled import tiled_step


def _tiled_scene(n=1024, seed=5):
    """Ground + walls + (n-3) mixed bodies spread widely in x so tiles are
    meaningful; exactly n bodies == n colliders (the tiled requirement)."""
    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(400.0, 0.5), friction=0.5)
    wl_ = b.add_static(pos=(-390.0, 10.0))
    b.add_collider(wl_, Shape.box(0.5, 12.0), friction=0.5)
    wr = b.add_static(pos=(390.0, 10.0))
    b.add_collider(wr, Shape.box(0.5, 12.0), friction=0.5)
    n_dyn = n - 3
    cols = n_dyn // 4
    for i in range(n_dyn):
        row, col = divmod(i, cols)
        x = -(cols - 1) * 0.75 + col * 1.5 + rng.uniform(-0.1, 0.1)
        y = 0.7 + row * 1.2
        body = b.add_body(pos=(x, y), vel=rng.normal(scale=0.2, size=2),
                          ang_vel=float(rng.normal(scale=0.1)))
        kind = i % 3
        if kind == 0:
            b.add_collider(body, Shape.circle(0.45), friction=0.5,
                           restitution=0.1)
        elif kind == 1:
            b.add_collider(body, Shape.box(0.4, 0.35), friction=0.5)
        else:
            b.add_collider(body, Shape.hexagon(0.42), friction=0.5)
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=6)
    return b.build(cap)


def _run_both(n_frames=2, interpret=True):
    from starframe_tpu.step import step

    world, cap = _tiled_scene()
    cfg = SolverConfig(substeps=4, iterations=1, manifold_refresh="frame",
                       slot_capacity=8, broadphase="grid",
                       grid_cell_capacity=10)

    w_t = world
    diag = None
    for _ in range(n_frames):
        w_t, diag = tiled_step(w_t, cfg, interpret=interpret)

    w_x = world
    stepj = jax.jit(lambda w: step(w, cfg, cap.max_pairs, allow_tiled=False)[0])
    for _ in range(n_frames):
        w_x = stepj(w_x)
    return w_t, w_x, diag


def test_tiled_matches_xla_path():
    w_t, w_x, diag = _run_both()
    assert int(np.asarray(diag["slot_overflow"])) == 0
    assert int(np.asarray(diag["window_overflow"])) == 0
    assert int(np.asarray(diag["large_overflow"])) == 0
    np.testing.assert_allclose(
        np.asarray(w_t.bodies.pos), np.asarray(w_x.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_t.bodies.vel), np.asarray(w_x.bodies.vel), atol=3e-2)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_tiled_compiled_matches_xla_on_tpu():
    w_t, w_x, diag = _run_both(interpret=False)
    assert int(np.asarray(diag["slot_overflow"])) == 0
    np.testing.assert_allclose(
        np.asarray(w_t.bodies.pos), np.asarray(w_x.bodies.pos), atol=1e-3)


def test_tiled_rollout_matches_stepwise():
    """tiled_rollout keeps state in tile layout and re-sorts every K frames
    (guard-forced earlier when needed) — trajectories must match the
    sort-every-frame tiled_step path to float-accumulation tolerance."""
    from starframe_tpu.tiled import tiled_rollout

    world, cap = _tiled_scene()
    cfg = SolverConfig(substeps=4, iterations=1, manifold_refresh="frame",
                       slot_capacity=8, broadphase="grid",
                       grid_cell_capacity=10, frames_per_broadphase=4)

    w_r, diag = jax.jit(
        lambda w: tiled_rollout(w, cfg, 3, interpret=True))(world)
    assert int(np.asarray(diag["slot_overflow"])) == 0
    assert int(np.asarray(diag["window_overflow"])) == 0

    w_s = world
    for _ in range(3):
        w_s, _ = tiled_step(w_s, cfg, interpret=True)

    np.testing.assert_allclose(
        np.asarray(w_r.bodies.pos), np.asarray(w_s.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_r.bodies.vel), np.asarray(w_s.bodies.vel), atol=3e-2)
    # prev pose carried for render interpolation, step_count advanced
    assert int(np.asarray(w_r.step_count)) == 3
    assert np.isfinite(np.asarray(w_r.bodies.prev_pos)).all()


def test_tiled_touch_keys_match_xla_contacts():
    """VERDICT r2 item 8: the tile engine now surfaces pair-level contact
    keys (touched slots -> canonical collider pairs) — the set must match
    the XLA path's touching contacts for the same frame."""
    from starframe_tpu.events import keys_to_set, touching_keys
    from starframe_tpu.step import step

    world, cap = _tiled_scene()
    cfg = SolverConfig(substeps=4, iterations=1, manifold_refresh="frame",
                       slot_capacity=8, broadphase="grid",
                       grid_cell_capacity=10)
    M = world.colliders.m

    w_t = world
    for _ in range(2):
        w_t, diag = tiled_step(w_t, cfg, interpret=True)
    tset = keys_to_set(np.asarray(diag["touch_keys"]), M)

    import jax.numpy as jnp
    w_x = world
    stepj = jax.jit(lambda w: step(w, cfg, cap.max_pairs, allow_tiled=False,
                                   )[:2])
    for _ in range(2):
        w_x, contacts = stepj(w_x)
    ck, touching = touching_keys(contacts, M)
    xset = keys_to_set(np.asarray(jnp.where(touching, ck, -1)), M)
    assert tset == xset


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_mega_compiled_bitwise_on_tpu():
    """Compiled (Mosaic) megakernel vs compiled per-substep pair: bitwise.

    The megakernel runs ONLY compiled (tiled.py gates ``fuse`` off in
    interpret mode — the interpreter copies every VMEM-resident block per
    grid step, which makes the whole-frame grid pathologically slow), so
    this TPU-gated test is its parity pin; the shared
    _project_math/_apply_math/_ccd_math bodies are additionally covered on
    every backend through the per-substep interpret tests above."""
    world, cap = _tiled_scene()
    cfg = SolverConfig(substeps=4, iterations=1, manifold_refresh="frame",
                       slot_capacity=8, broadphase="grid",
                       grid_cell_capacity=10)
    w_f = world
    w_p = world
    for _ in range(3):
        w_f, d_f = tiled_step(w_f, cfg, fuse=True)
        w_p, d_p = tiled_step(w_p, cfg, fuse=False)
    np.testing.assert_array_equal(np.asarray(w_f.bodies.pos),
                                  np.asarray(w_p.bodies.pos))
    np.testing.assert_array_equal(np.asarray(w_f.bodies.vel),
                                  np.asarray(w_p.bodies.vel))
    assert int(np.asarray(d_f["slot_overflow"])) == 0


def test_tiled_rollout_event_keys_match_stepwise():
    """tiled_rollout(with_events=True) emits per-frame canonical touch keys
    compacted IN the manifold kernel (key_sel — no per-frame XLA gather);
    as sets they must match the per-frame touch_keys of the sort-every-frame
    tiled_step path."""
    from starframe_tpu.events import keys_to_set
    from starframe_tpu.tiled import tiled_rollout

    world, cap = _tiled_scene()
    cfg = SolverConfig(substeps=4, iterations=1, manifold_refresh="frame",
                       slot_capacity=8, broadphase="grid",
                       grid_cell_capacity=10, frames_per_broadphase=4)
    M = world.colliders.m

    _, diag, keys = jax.jit(lambda w: tiled_rollout(
        w, cfg, 3, interpret=True, with_events=True))(world)
    assert int(np.asarray(diag["slot_overflow"])) == 0

    w_s = world
    for f in range(3):
        w_s, d = tiled_step(w_s, cfg, interpret=True)
        rset = keys_to_set(np.asarray(keys[f]), M)
        sset = keys_to_set(np.asarray(d["touch_keys"]), M)
        assert rset == sset, f"frame {f}: touch-key sets differ"
