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


def use_pallas_frame2(worlds: World, cfg: SolverConfig) -> bool:
    """Static decision: run the batched slot kernel (pallas/frame2.py)?

    All conditions are shape/config-static so the choice is stable under
    jit. The kernel's collider->body reduction uses world 0's topology for
    the whole batch — ``cfg.batch_uniform_topology`` is the user's promise
    that worlds share it (true for ``replicate_world``/same-built scenes).
    """
    if cfg.use_pallas is False or not cfg.batch_uniform_topology:
        return False
    # jointed batches ride the kernel's fused-Jacobi joint tier; graph-colored
    # Gauss-Seidel joints (the default, stiffer for long chains) stay on the
    # XLA path — opt batched jointed worlds in with joint_solver='jacobi'
    if worlds.joints.j != 0 and cfg.joint_solver != "jacobi":
        return False
    n, m = worlds.bodies.n, worlds.colliders.m
    w = worlds.bodies.pos.shape[0]
    # lane gathers need 128-multiples; the dense [M, M] slot mask needs to
    # stay VMEM-resident (big single worlds take the XLA grid path instead)
    if n % 128 != 0 or m % 128 != 0 or m > 1024 or w % 8 != 0:
        return False
    if worlds.joints.j > 1024:
        return False
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def _frame2_arrays(worlds: World, cfg: SolverConfig):
    """XLA-side prep for the two Pallas kernels: flat f32/i32 [W, ...] views."""
    b, c = worlds.bodies, worlds.colliders
    from .state import BODY_KINEMATIC, COL_ACTIVE, COL_SENSOR

    f32 = jnp.float32
    responds = ((b.inv_mass > 0) | (b.inv_inertia > 0)).astype(f32)
    kin = ((b.flags & BODY_KINEMATIC) != 0).astype(f32)
    moves = jnp.maximum(responds, kin)
    body = dict(
        posx=b.pos[..., 0], posy=b.pos[..., 1], ang=b.angle,
        velx=b.vel[..., 0], vely=b.vel[..., 1], angvel=b.ang_vel,
        invm=b.inv_mass, invi=b.inv_inertia,
        dyn=(b.inv_mass > 0).astype(f32), kin=kin,
        responds=responds, moves=moves,
    )
    col = dict(
        cbody=c.body_idx,
        vlx=jnp.swapaxes(c.verts[..., 0], -1, -2),  # [W, V, M]
        vly=jnp.swapaxes(c.verts[..., 1], -1, -2),
        nverts=c.nverts, radius=c.radius,
        fric=c.friction, rest=c.restitution,
        layer=c.layer, lmask=c.mask,
        active=((c.flags & COL_ACTIVE) != 0).astype(f32),
        sensor=((c.flags & COL_SENSOR) != 0).astype(f32),
    )
    return body, col


def frame2_tables(worlds: World, cfg: SolverConfig, frames: int = 1,
                  interpret: bool = False):
    """Slot-table broadphase for a world batch. With ``frames > 1`` the
    swept AABBs are inflated to stay a valid candidate superset for that
    many frames (per-body velocity sweep over ``frames * dt`` plus the
    velocity gravity can add over the window), so rollouts can amortize
    this kernel across frames (FUTURE.md broadphase-reuse lever). Returns
    (partner, slot_act, count)."""
    body, col = _frame2_arrays(worlds, cfg)
    vx, vy = body["velx"], body["vely"]
    if frames > 1:
        # conservative speed bound over the window: |v| + |g| * K * dt
        g = jnp.abs(worlds.gravity)
        dv = frames * cfg.dt
        vx = jnp.abs(vx) + g[..., 0:1] * dv * body["dyn"]
        vy = jnp.abs(vy) + g[..., 1:2] * dv * body["dyn"]
    from .pallas.slots import build_slot_tables

    return build_slot_tables(
        body["posx"], body["posy"], body["ang"], vx, vy,
        body["responds"], body["moves"],
        col["cbody"], col["vlx"], col["vly"], col["radius"],
        col["layer"], col["lmask"], col["active"], col["sensor"],
        C=cfg.slot_capacity, margin=cfg.contact_margin,
        dt=cfg.dt * frames, interpret=interpret,
    )


def frame2_step(worlds: World, cfg: SolverConfig, interpret: bool = False,
                tables=None):
    """One batched frame through the slot kernels. Returns
    ``(new_worlds, touched [W, C, M], partner [W, C, M], count [W, M])`` —
    the slot tables back the batched contact-event API and the overflow
    diagnostic (sum(max(count - C, 0)) must be 0 for trustworthy physics).
    Pass ``tables`` (from :func:`frame2_tables`) to reuse a broadphase
    across frames."""
    import dataclasses

    from .pallas.frame2 import run_frame2
    from .pallas.slots import build_joint_slots

    body, col = _frame2_arrays(worlds, cfg)
    C = cfg.slot_capacity
    if tables is None:
        tables = frame2_tables(worlds, cfg, interpret=interpret)
    partner, slot_act, count = tables

    joints = None
    JC = 0
    if worlds.joints.j > 0:
        from .state import JOINT_OFF

        j = worlds.joints
        JC = cfg.joint_slot_capacity
        Jp = -(-j.j // 128) * 128  # pad the joint axis to a lane multiple

        def padj(x, fill=0):
            return jnp.pad(x, ((0, 0), (0, Jp - j.j)), constant_values=fill)

        jactive = padj((j.jtype != JOINT_OFF).astype(jnp.float32))
        jslot, jside, jact, jcount = build_joint_slots(
            padj(j.body_a), padj(j.body_b), jactive,
            n_bodies=worlds.bodies.n, JC=JC, interpret=interpret,
        )
        joints = dict(
            jtype=padj(j.jtype), jba=padj(j.body_a), jbb=padj(j.body_b),
            jaax=padj(j.anchor_a[..., 0]), jaay=padj(j.anchor_a[..., 1]),
            jabx=padj(j.anchor_b[..., 0]), jaby=padj(j.anchor_b[..., 1]),
            jrest=padj(j.rest), jlo=padj(j.lo), jhi=padj(j.hi),
            jcomp=padj(j.compliance), jdamp=padj(j.damping),
            jms=padj(j.motor_speed),
            jmm=padj(jnp.nan_to_num(j.motor_max, posinf=3.4e38)),
            jslot=jslot, jside=jside, jact=jact,
        )

    gravity = jnp.broadcast_to(worlds.gravity, (body["posx"].shape[0], 2))
    posx, posy, ang, velx, vely, angvel, touched = run_frame2(
        body["posx"], body["posy"], body["ang"],
        body["velx"], body["vely"], body["angvel"],
        body["invm"], body["invi"], body["dyn"], body["kin"],
        col["cbody"], col["vlx"], col["vly"], col["nverts"], col["radius"],
        col["fric"], col["rest"], col["sensor"],
        partner, slot_act, joints, gravity,
        C=C, JC=JC, substeps=cfg.substeps, iterations=cfg.iterations,
        h=cfg.dt / cfg.substeps, dt=cfg.dt, margin=cfg.contact_margin,
        compliance=cfg.contact_compliance, relaxation=cfg.relaxation,
        max_dpos=cfg.max_dpos, rest_threshold=cfg.restitution_threshold,
        lin_damp=cfg.linear_damping, ang_damp=cfg.angular_damping,
        interpret=interpret,
    )

    b = worlds.bodies
    pos = jnp.stack([posx, posy], axis=-1)
    vel = jnp.stack([velx, vely], axis=-1)
    sleep_count = b.sleep_count
    if cfg.sleep_velocity > 0.0:
        slow = (jnp.sum(vel**2, axis=-1) + angvel**2) < cfg.sleep_velocity**2
        sleep_count = jnp.where(slow, sleep_count + 1, 0)
        asleep = (sleep_count >= cfg.sleep_frames) & (b.inv_mass > 0)
        vel = jnp.where(asleep[..., None], 0.0, vel)
        angvel = jnp.where(asleep, 0.0, angvel)

    new_bodies = dataclasses.replace(
        b, pos=pos, angle=ang, vel=vel, ang_vel=angvel,
        prev_pos=b.pos, prev_angle=b.angle, sleep_count=sleep_count,
    )
    new_worlds = dataclasses.replace(
        worlds, bodies=new_bodies, step_count=worlds.step_count + 1
    )
    return new_worlds, touched, partner, count


def batched_step(worlds: World, cfg: SolverConfig, max_pairs: int) -> World:
    """Frame step over the leading world axis (un-jitted).

    Contact-only world batches on TPU take the slot-table Pallas kernels
    (pallas/slots.py + pallas/frame2.py); everything else is vmap(step).
    """
    if use_pallas_frame2(worlds, cfg):
        return frame2_step(worlds, cfg)[0]
    return jax.vmap(lambda w: step(w, cfg, max_pairs)[0])(worlds)


def make_batched_step(cfg: SolverConfig, max_pairs: int, donate: bool = True):
    """Jitted ``worlds -> worlds`` over a leading world axis."""
    fn = partial(batched_step, cfg=cfg, max_pairs=max_pairs)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def batched_rollout(worlds: World, cfg: SolverConfig, max_pairs: int,
                    n_frames: int, record=None):
    """On-device N-frame rollout of a world batch via ``lax.scan`` — the
    RL-workload shape (BASELINE.json:11): one host round trip for the whole
    trajectory. ``record(worlds) -> pytree`` picks what to stack per frame
    (default: poses).

    On the slot-kernel path with ``cfg.frames_per_broadphase = K > 1``, the
    slot tables are rebuilt every K-th frame with K-frame-inflated sweeps
    (a candidate SUPERSET, so solved contacts — which require actual
    proximity — are unchanged; only slot pressure rises) and carried through
    the scan — amortizing the broadphase kernel K-fold.
    """
    if record is None:
        record = lambda w: (w.bodies.pos, w.bodies.angle)

    K = cfg.frames_per_broadphase
    if K > 1 and use_pallas_frame2(worlds, cfg):
        def body(carry, _):
            w, tables, age = carry
            tables = jax.lax.cond(
                age == 0,
                lambda op: frame2_tables(op[0], cfg, frames=K),
                lambda op: op[1],
                (w, tables),
            )
            w2, *_ = frame2_step(w, cfg, tables=tables)
            return (w2, tables, (age + 1) % K), record(w2)

        tables0 = frame2_tables(worlds, cfg, frames=K)
        (final, _, _), traj = jax.lax.scan(
            body, (worlds, tables0, jnp.int32(1)), None, length=n_frames)
        return final, traj

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
