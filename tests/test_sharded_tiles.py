"""Tile-AXIS sharding (tiled.sharded_tiled_rollout): the scale-out path for
single worlds too big for one chip (FUTURE.md's last unsharded axis).

Parity contract: the sharded rollout runs the SAME kernels as the unsharded
tile engine, with window reads served from halo-exchanged edge tiles
(pallas.tiles._halo_ext) instead of in-array neighbors, and global
resort/staleness decisions psum-replicated. The only semantic difference is
at the global boundary tiles: the single-device engine gives them a clamped
full 3-tile window (tile 0 sees tiles 0-2) while the halo mode's uniform
window gives them an inert zero pad (tile 0 sees pad, 0, 1) — identical
physics unless a pair spans >1 tile at the global edge, which the
window-completeness guard would flag either way. Runs in Pallas interpret
mode on the 8-virtual-CPU-device mesh (conftest)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from starframe_tpu.config import SolverConfig
from starframe_tpu.tiled import sharded_tiled_rollout, tiled_rollout

from test_tiles import _tiled_scene


def _mesh(d):
    return Mesh(np.array(jax.devices("cpu")[:d]), ("tiles",))


def _cfg(**kw):
    base = dict(substeps=4, iterations=1, manifold_refresh="frame",
                slot_capacity=8, broadphase="grid", grid_cell_capacity=10,
                frames_per_broadphase=4)
    base.update(kw)
    return SolverConfig(**base)


@pytest.mark.skipif(len(jax.devices("cpu")) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("d", [2, 4])
def test_sharded_tiles_match_unsharded(d):
    """2- and 4-shard rollouts match the single-device tile engine; the
    4-shard case runs ONE tile per shard, so every window read crosses a
    shard boundary."""
    world, cap = _tiled_scene()  # 1024 bodies = 4 tiles of T=256
    cfg = _cfg()

    w_u, diag_u = jax.jit(
        lambda w: tiled_rollout(w, cfg, 3, interpret=True))(world)
    mesh = _mesh(d)
    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 3, mesh, interpret=True)
    )(world)

    for k in ("slot_overflow", "solve_overflow", "window_overflow",
              "large_overflow"):
        assert int(np.asarray(diag_s[k])) == 0, (k, diag_s[k])
        assert int(np.asarray(diag_u[k])) == 0, (k, diag_u[k])
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.pos), np.asarray(w_u.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.vel), np.asarray(w_u.bodies.vel), atol=3e-2)
    assert int(np.asarray(w_s.step_count)) == 3


@pytest.mark.skipif(len(jax.devices("cpu")) < 2, reason="needs >= 2 devices")
def test_sharded_tiles_resort_and_guard():
    """A longer rollout that crosses scheduled-resort boundaries (K=2 over
    5 frames) exercises the all-gather global resort; trajectories must
    still match the unsharded engine."""
    world, cap = _tiled_scene(seed=9)
    cfg = _cfg(frames_per_broadphase=2)

    w_u, _ = jax.jit(
        lambda w: tiled_rollout(w, cfg, 5, interpret=True))(world)
    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 5, _mesh(2), interpret=True)
    )(world)
    assert int(np.asarray(diag_s["slot_overflow"])) == 0
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.pos), np.asarray(w_u.bodies.pos), atol=1e-3)


@pytest.mark.skipif(len(jax.devices("cpu")) < 2, reason="needs >= 2 devices")
def test_sharded_tiles_rejects_joints_and_bad_split():
    from starframe_tpu.shapes import Shape
    from starframe_tpu.state import WorldBuilder
    from starframe_tpu.config import Capacity

    world, cap = _tiled_scene()
    with pytest.raises(ValueError, match="divide"):
        sharded_tiled_rollout(world, _cfg(), 1, _mesh(3), interpret=True)

    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(400.0, 0.5))
    prev = g
    for i in range(1023):
        body = b.add_body(pos=(float(i) * 0.9, 1.0))
        b.add_collider(body, Shape.circle(0.4))
        if i == 0:
            b.distance_joint(prev, body, rest=1.0)
    wj, _ = b.build(Capacity(max_bodies=1024, max_colliders=1024,
                             max_pairs=4096, max_joints=4, max_verts=6))
    with pytest.raises(NotImplementedError, match="joints"):
        sharded_tiled_rollout(wj, _cfg(), 1, _mesh(2), interpret=True)
