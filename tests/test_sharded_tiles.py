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
def test_sharded_tiles_rejects_bad_split():
    world, cap = _tiled_scene()
    with pytest.raises(ValueError, match="divide"):
        sharded_tiled_rollout(world, _cfg(), 1, _mesh(3), interpret=True)


@pytest.mark.skipif(len(jax.devices("cpu")) < 2, reason="needs >= 2 devices")
@pytest.mark.parametrize("d", [2, 4])
def test_sharded_tiles_joints_match_unsharded(d):
    """Jointed worlds on the sharded tile axis (r5): each joint solves on
    its row_a owner shard with halo-fold correction return — trajectories
    match the unsharded engine, dumbbells hold their rest length, and the
    halo-reach counter stays 0 (x-adjacent endpoints)."""
    from test_tiled_joints import _jointed_world

    world, cap, joints, welds = _jointed_world()
    cfg = _cfg(max_joint_colors=2)

    w_u, diag_u = jax.jit(
        lambda w: tiled_rollout(w, cfg, 3, interpret=True))(world)
    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 3, _mesh(d), interpret=True)
    )(world)

    assert int(np.asarray(diag_s["joint_shard_overflow"])) == 0
    assert int(np.asarray(diag_s["slot_overflow"])) == 0
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.pos), np.asarray(w_u.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.vel), np.asarray(w_u.bodies.vel), atol=3e-2)
    pos = np.asarray(w_s.bodies.pos)
    for a, c in joints[:6]:
        d_ = np.linalg.norm(pos[a] - pos[c])
        assert abs(d_ - 1.3416) < 0.3, (a, c, d_)  # rest = |(1.2, 0.6)|


@pytest.mark.skipif(len(jax.devices("cpu")) < 2, reason="needs >= 2 devices")
def test_sharded_tiles_events_match_unsharded():
    """Contact events on the sharded tile axis (r5): per-frame canonical
    touch keys from the in-kernel key compute over halo'd id rows must
    equal the unsharded rollout's keys as SETS per frame (slot order is
    layout-dependent)."""
    world, cap = _tiled_scene(seed=3)
    cfg = _cfg()

    w_u, _, keys_u = jax.jit(lambda w: tiled_rollout(
        w, cfg, 3, interpret=True, with_events=True))(world)
    w_s, diag_s, keys_s = jax.jit(lambda w: sharded_tiled_rollout(
        w, cfg, 3, _mesh(2), interpret=True, with_events=True))(world)

    assert int(np.asarray(diag_s["slot_overflow"])) == 0
    ku = np.asarray(keys_u)
    ks = np.asarray(keys_s)
    assert ku.shape == ks.shape  # [frames, Nt, Csol, T]
    for f in range(ku.shape[0]):
        su = set(ku[f][ku[f] >= 0].tolist())
        ss = set(ks[f][ks[f] >= 0].tolist())
        assert su == ss, f"frame {f}: key sets differ"
    np.testing.assert_allclose(
        np.asarray(w_s.bodies.pos), np.asarray(w_u.bodies.pos), atol=5e-4)


def _wide_scene(n=16384, seed=11):
    """16k mixed bodies over a ground slab wide enough for the spread
    (_tiled_scene's +-390 walls would START 16k bodies interpenetrated)."""
    from starframe_tpu.config import Capacity
    from starframe_tpu.shapes import Shape
    from starframe_tpu.state import WorldBuilder

    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(7000.0, 0.5), friction=0.5)
    n_dyn = n - 1
    cols = n_dyn // 4
    for i in range(n_dyn):
        row, col = divmod(i, cols)
        x = -(cols - 1) * 0.75 + col * 1.5 + rng.uniform(-0.1, 0.1)
        body = b.add_body(pos=(x, 0.7 + row * 1.2),
                          vel=rng.normal(scale=0.2, size=2))
        if i % 2 == 0:
            b.add_collider(body, Shape.circle(0.45), friction=0.5)
        else:
            b.add_collider(body, Shape.hexagon(0.42), friction=0.5)
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=6)
    return b.build(cap)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 devices")
def test_sharded_tiles_design_point_smoke():
    """Design-point smoke (VERDICT r4 weak #4): >= 64 tiles (16k bodies)
    over 8 shards, 2 frames crossing one scheduled resort — counters
    silent, trajectories finite and matching the unsharded engine."""
    world, cap = _wide_scene()
    cfg = _cfg(substeps=2, frames_per_broadphase=2)

    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 2, _mesh(8), interpret=True)
    )(world)
    assert int(np.asarray(diag_s["slot_overflow"])) == 0
    assert int(np.asarray(diag_s["window_overflow"])) == 0
    pos = np.asarray(w_s.bodies.pos)
    assert np.isfinite(pos).all()
    w_u, _ = jax.jit(
        lambda w: tiled_rollout(w, cfg, 2, interpret=True))(world)
    np.testing.assert_allclose(
        pos, np.asarray(w_u.bodies.pos), atol=5e-4)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic halo path needs a TPU",
)
def test_sharded_tiles_compiled_1shard_bitwise_on_tpu():
    """Compiled (Mosaic) halo path on the real TPU: a 1-shard mesh runs the
    halo=True BlockSpecs + ppermute plumbing (self-halos at the array ends)
    and must be BITWISE equal to the unsharded compiled engine — pinning
    FUTURE.md's r4 claim in the suite (VERDICT r4 weak #4: a Mosaic
    regression in the halo specs would previously ship silently)."""
    world, cap = _tiled_scene()
    cfg = _cfg()
    mesh = Mesh(np.array(jax.devices()[:1]), ("tiles",))

    w_u, _ = jax.jit(lambda w: tiled_rollout(w, cfg, 3))(world)
    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 3, mesh))(world)

    assert int(np.asarray(diag_s["slot_overflow"])) == 0
    np.testing.assert_array_equal(np.asarray(w_s.bodies.pos),
                                  np.asarray(w_u.bodies.pos))
    np.testing.assert_array_equal(np.asarray(w_s.bodies.vel),
                                  np.asarray(w_u.bodies.vel))


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic halo path needs a TPU",
)
def test_sharded_tiles_joints_compiled_1shard_on_tpu():
    """Compiled halo path with JOINTS: the halo-local joint pass (fold +
    re-extend ppermutes on a 1-shard mesh are self-exchanges) must be
    bitwise equal to the unsharded engine's joint pass."""
    from test_tiled_joints import _jointed_world

    world, cap, joints, welds = _jointed_world()
    cfg = _cfg(max_joint_colors=2)
    mesh = Mesh(np.array(jax.devices()[:1]), ("tiles",))

    w_u, _ = jax.jit(lambda w: tiled_rollout(w, cfg, 3))(world)
    w_s, diag_s = jax.jit(
        lambda w: sharded_tiled_rollout(w, cfg, 3, mesh))(world)

    assert int(np.asarray(diag_s["joint_shard_overflow"])) == 0
    np.testing.assert_array_equal(np.asarray(w_s.bodies.pos),
                                  np.asarray(w_u.bodies.pos))
