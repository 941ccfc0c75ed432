"""Batched and sharded worlds: vmap over a leading world axis, sharded over a
TPU ICI mesh.

The reference is a single-process engine; its TPU-native scaling analogue
(SURVEY.md §2.9) is (a) thousands of independent worlds batched with ``vmap``
(BASELINE.json:11 — 4096 × 256-body worlds on one chip) and (b) the world
axis sharded over devices with ``jax.sharding`` on a 1-D mesh, where XLA
inserts zero cross-chip traffic on the hot path (worlds are independent) and
``psum``-style collectives appear only in aggregate metrics.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import SolverConfig
from .state import World
from .step import step


def batch_worlds(worlds: Sequence[World]) -> World:
    """Stack identical-capacity worlds along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *worlds)


def replicate_world(world: World, n: int) -> World:
    """Broadcast one world into an ``n``-way batch."""
    return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), world)


def world_slice(batched: World, i: int) -> World:
    return jax.tree.map(lambda x: x[i], batched)


def batched_step(worlds: World, cfg: SolverConfig, max_pairs: int) -> World:
    """Frame step over the leading world axis (un-jitted).

    Contact-only world batches on TPU take the whole-frame Pallas kernel
    directly (grid over worlds, G worlds per program — see pallas/frame.py);
    everything else is vmap(step).
    """
    from .step import use_pallas_frame

    if use_pallas_frame(worlds, max_pairs, cfg):
        return _batched_step_pallas(worlds, cfg, max_pairs)
    return jax.vmap(lambda w: step(w, cfg, max_pairs)[0])(worlds)


def _batched_step_pallas(worlds: World, cfg: SolverConfig, max_pairs: int) -> World:
    import dataclasses

    from .pallas import run_frame_batched
    from .step import frame_prep, pallas_frame_kwargs

    pairs, pd = jax.vmap(
        lambda w: frame_prep(w, cfg, max_pairs, skip_onehot=True)
    )(worlds)
    b = worlds.bodies
    pos, angle, vel, ang_vel = run_frame_batched(
        b.pos, b.angle, b.vel, b.ang_vel, b.inv_mass, b.inv_inertia, b.flags,
        pd.verts_ax, pd.verts_ay, pd.verts_bx, pd.verts_by,
        pd.nverts_a, pd.nverts_b, pd.radius_a, pd.radius_b,
        pd.friction, pd.restitution,
        pd.inv_mass_a, pd.inv_mass_b, pd.inv_inertia_a, pd.inv_inertia_b,
        pd.valid & jnp.logical_not(pd.sensor), pd.valid,
        pd.body_a, pd.body_b, worlds.gravity,
        **pallas_frame_kwargs(cfg),
    )

    sleep_count = b.sleep_count
    if cfg.sleep_velocity > 0.0:
        slow = (jnp.sum(vel**2, axis=-1) + ang_vel**2) < cfg.sleep_velocity**2
        sleep_count = jnp.where(slow, sleep_count + 1, 0)
        asleep = (sleep_count >= cfg.sleep_frames) & (b.inv_mass > 0)
        vel = jnp.where(asleep[..., None], 0.0, vel)
        ang_vel = jnp.where(asleep, 0.0, ang_vel)

    new_bodies = dataclasses.replace(
        b, pos=pos, angle=angle, vel=vel, ang_vel=ang_vel,
        prev_pos=b.pos, prev_angle=b.angle, sleep_count=sleep_count,
    )
    return dataclasses.replace(
        worlds, bodies=new_bodies, step_count=worlds.step_count + 1
    )


def make_batched_step(cfg: SolverConfig, max_pairs: int, donate: bool = True):
    """Jitted ``worlds -> worlds`` over a leading world axis."""
    fn = partial(batched_step, cfg=cfg, max_pairs=max_pairs)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def batched_rollout(worlds: World, cfg: SolverConfig, max_pairs: int,
                    n_frames: int, record=None):
    """On-device N-frame rollout of a world batch via ``lax.scan`` — the
    RL-workload shape (BASELINE.json:11): one host round trip for the whole
    trajectory. ``record(worlds) -> pytree`` picks what to stack per frame
    (default: poses)."""
    if record is None:
        record = lambda w: (w.bodies.pos, w.bodies.angle)

    def body(w, _):
        w2 = batched_step(w, cfg, max_pairs)
        return w2, record(w2)

    final, traj = jax.lax.scan(body, worlds, None, length=n_frames)
    return final, traj


def make_batched_rollout(cfg: SolverConfig, max_pairs: int, n_frames: int,
                         record=None):
    return jax.jit(partial(batched_rollout, cfg=cfg, max_pairs=max_pairs,
                           n_frames=n_frames, record=record))


def make_mesh(devices=None, axis: str = "worlds") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def world_sharding(mesh: Mesh, world: World, axis: str = "worlds"):
    """NamedSharding pytree: every leaf sharded along its leading world axis."""
    spec = P(axis)
    return jax.tree.map(lambda _: NamedSharding(mesh, spec), world)


def shard_world(batched: World, mesh: Mesh, axis: str = "worlds") -> World:
    return jax.device_put(batched, world_sharding(mesh, batched, axis))


def make_sharded_step(
    cfg: SolverConfig,
    max_pairs: int,
    mesh: Optional[Mesh] = None,
    axis: str = "worlds",
    donate: bool = True,
):
    """Jitted step over a world batch sharded across ``mesh`` on ICI.

    Worlds are embarrassingly parallel (BASELINE.json:11), so XLA emits no
    cross-chip communication inside the step; place the input with
    :func:`shard_world` and the output sharding is preserved.
    """
    mesh = make_mesh() if mesh is None else mesh

    # the whole-frame Pallas kernel only lowers on TPU; a CPU mesh (e.g. the
    # 8-virtual-device test mesh) must take the XLA path
    mesh_dev = next(iter(mesh.devices.flat))
    if not (mesh_dev.platform == "tpu" or "TPU" in getattr(mesh_dev, "device_kind", "")):
        import dataclasses

        cfg = dataclasses.replace(cfg, use_pallas=False)

    def fn(worlds: World) -> World:
        return batched_step(worlds, cfg, max_pairs)

    # constrain output sharding; input sharding comes from operand placement
    def sharded(worlds: World) -> World:
        out = fn(worlds)
        return jax.lax.with_sharding_constraint(out, world_sharding(mesh, out, axis))

    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def global_metrics(worlds: World) -> dict:
    """Cross-shard aggregate diagnostics — the only place a collective
    appears (an all-reduce XLA inserts for the jnp.sum over the sharded
    axis; SURVEY.md §5.8)."""
    b = worlds.bodies
    mass = jnp.where(b.inv_mass > 0, 1.0 / jnp.maximum(b.inv_mass, 1e-12), 0.0)
    ke = 0.5 * jnp.sum(mass * jnp.sum(b.vel**2, axis=-1))
    return {
        "total_kinetic_energy": ke,
        "mean_speed": jnp.mean(jnp.linalg.norm(b.vel, axis=-1)),
        "n_worlds": b.pos.shape[0],
    }
