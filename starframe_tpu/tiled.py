"""XLA-side glue for the sorted-sweep tile engine (pallas/tiles.py): the
per-frame sort/permute/pad, large-set extraction, kernel invocation, and
inverse permutation back to canonical body order.

This is the 10k-pile fast path (BASELINE.json:2). Requirements are gated in
:func:`use_tiled` — notably one collider per body in slot order
(``body_idx == iota``), which the pile scene satisfies by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import SolverConfig
from .state import BODY_KINEMATIC, COL_ACTIVE, COL_SENSOR, World

f32 = jnp.float32
i32 = jnp.int32

_BIG = jnp.float32(1e30)


def use_tiled(world: World, cfg: SolverConfig) -> bool:
    """Static gate for the tiled single-world path."""
    from .pallas.tiles import L, T

    if cfg.use_pallas is False or cfg.iterations != 1:
        return False
    if cfg.manifold_refresh != "frame":
        return False
    if world.joints.j != 0:
        return False
    n, m = world.bodies.n, world.colliders.m
    if n != m or n < 4 * T:  # small worlds: the XLA path is fine
        return False
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def tiled_step(world: World, cfg: SolverConfig, gravity=None,
               interpret: bool = False):
    """One frame via the tile engine. Returns (new_world, diag_dict)."""
    from .pallas.tiles import L, T, run_tiled_frame

    b, c = world.bodies, world.colliders
    g = world.gravity if gravity is None else gravity
    M = c.m
    n_tiles = -(-M // T)
    if n_tiles < 3:
        raise ValueError("tiled path needs >= 3 tiles")
    Mp = n_tiles * T

    responds = ((b.inv_mass > 0) | (b.inv_inertia > 0)).astype(f32)
    kin = ((b.flags & BODY_KINEMATIC) != 0).astype(f32)
    moves = jnp.maximum(responds, kin)
    col_active = ((c.flags & COL_ACTIVE) != 0).astype(f32)
    sensor = ((c.flags & COL_SENSOR) != 0).astype(f32)

    # ---- sort moving colliders by x; statics/inactive to the tail ---------
    cx = b.pos[:, 0]
    key = jnp.where((col_active > 0) & (moves > 0), cx,
                    jnp.where(col_active > 0, _BIG, 2 * _BIG))
    key = jnp.concatenate([key, jnp.full((Mp - M,), 3 * _BIG, f32)])
    perm = jnp.argsort(key)  # [Mp] (stable)
    inv_perm = jnp.argsort(perm)

    def srt(x, fill=0.0):
        xp = jnp.concatenate(
            [x, jnp.full((Mp - M,) + x.shape[1:], fill, x.dtype)])
        return xp[perm]

    def tile2(x):  # [Mp] -> [Nt, 1, T] (middle singleton for Mosaic blocks)
        return x.reshape(n_tiles, 1, T)

    state = dict(
        px=tile2(srt(b.pos[:, 0])), py=tile2(srt(b.pos[:, 1])),
        an=tile2(srt(b.angle)), vx=tile2(srt(b.vel[:, 0])),
        vy=tile2(srt(b.vel[:, 1])), om=tile2(srt(b.ang_vel)),
    )
    vlx = srt(c.verts[..., 0])  # [Mp, V]
    vly = srt(c.verts[..., 1])
    V = vlx.shape[1]
    consts = dict(
        rad=tile2(srt(c.radius)),
        nv=tile2(srt(c.nverts)),
        fric=tile2(srt(c.friction)),
        rst=tile2(srt(c.restitution)),
        sen=tile2(srt(sensor)),
        act=tile2(srt(col_active)),
        mov=tile2(srt(moves)),
        invm=tile2(srt(b.inv_mass)),
        invi=tile2(srt(b.inv_inertia)),
        lay=tile2(srt(c.layer)),
        msk=tile2(srt(c.mask)),
        responds=tile2(srt(responds)),
        dynb=tile2(srt((b.inv_mass > 0).astype(f32))),
        kin=tile2(srt(kin)),
        vlx=vlx.reshape(n_tiles, T, V).transpose(0, 2, 1),
        vly=vly.reshape(n_tiles, T, V).transpose(0, 2, 1),
    )

    # ---- window-miss edge bounds (conservative; SURVEY.md §4.6) -----------
    sorted_key = key[perm]  # [Mp]
    # the miss bound only covers colliders a window can fail to see: MOVING
    # ones beyond it (statics ride the broadcast large channel regardless)
    ext_bound = jnp.max(jnp.where(
        (col_active > 0) & (moves > 0),
        jnp.max(jnp.sqrt(c.verts[..., 0] ** 2 + c.verts[..., 1] ** 2), axis=1)
        + c.radius + 0.5 * cfg.contact_margin
        + jnp.abs(b.vel).max(-1) * cfg.dt,
        0.0))
    t_idx = jnp.arange(n_tiles)
    start = jnp.clip(t_idx - 1, 0, n_tiles - 3)
    after = (start + 3) * T  # first sorted index past the window
    before = start * T - 1
    key_after = jnp.where(after < Mp, sorted_key[jnp.minimum(after, Mp - 1)],
                          _BIG)
    key_before = jnp.where(before >= 0, sorted_key[jnp.maximum(before, 0)],
                           -_BIG)
    # beyond-window keys >= _BIG are statics/padding (large channel) — no miss
    edge_hi = jnp.where(key_after >= _BIG, _BIG, key_after - ext_bound)
    edge_lo = key_before + ext_bound
    consts["edge_lo"] = jnp.broadcast_to(edge_lo[:, None, None], (n_tiles, 1, T))
    consts["edge_hi"] = jnp.broadcast_to(edge_hi[:, None, None], (n_tiles, 1, T))

    # ---- large set: static active colliders, broadcast to every tile ------
    lkey = jnp.where((col_active > 0) & (moves == 0),
                     jnp.arange(M, dtype=i32), jnp.int32(2**30))
    lsort = jnp.sort(lkey)[:L]
    n_large = jnp.sum(lkey < 2**30)
    l_valid = jnp.arange(L) < jnp.minimum(n_large, L)
    lidx = jnp.where(l_valid, lsort, 0)
    large = dict(
        px=b.pos[lidx, 0][None], py=b.pos[lidx, 1][None],
        an=b.angle[lidx][None],
        vlx=c.verts[lidx, :, 0].T[None], vly=c.verts[lidx, :, 1].T[None],
        rad=c.radius[lidx][None], nv=c.nverts[lidx][None],
        fric=c.friction[lidx][None], rst=c.restitution[lidx][None],
        sen=sensor[lidx][None],
        act=jnp.where(l_valid, col_active[lidx], 0.0)[None],
        lay=c.layer[lidx][None], msk=c.mask[lidx][None],
    )
    large_overflow = jnp.maximum(n_large - L, 0)

    # ---- run the frame ------------------------------------------------------
    state, touched, count, winover = run_tiled_frame(
        state, consts, large, jnp.asarray(g, f32)[None],
        C=cfg.slot_capacity, V=V, substeps=cfg.substeps,
        h=cfg.dt / cfg.substeps, dt=cfg.dt, margin=cfg.contact_margin,
        compliance=cfg.contact_compliance, relaxation=cfg.relaxation,
        max_dpos=cfg.max_dpos, rest_threshold=cfg.restitution_threshold,
        lin_damp=cfg.linear_damping, ang_damp=cfg.angular_damping,
        interpret=interpret,
    )

    # ---- back to canonical order -------------------------------------------
    def unsort(x):
        return x.reshape(Mp)[inv_perm][:M]

    pos = jnp.stack([unsort(state["px"]), unsort(state["py"])], axis=-1)
    angle = unsort(state["an"])
    vel = jnp.stack([unsort(state["vx"]), unsort(state["vy"])], axis=-1)
    ang_vel = unsort(state["om"])

    sleep_count = b.sleep_count
    if cfg.sleep_velocity > 0.0:
        slow = (jnp.sum(vel**2, axis=-1) + ang_vel**2) < cfg.sleep_velocity**2
        sleep_count = jnp.where(slow, sleep_count + 1, 0)
        asleep = (sleep_count >= cfg.sleep_frames) & (b.inv_mass > 0)
        vel = jnp.where(asleep[:, None], 0.0, vel)
        ang_vel = jnp.where(asleep, 0.0, ang_vel)

    new_bodies = dataclasses.replace(
        b, pos=pos, angle=angle, vel=vel, ang_vel=ang_vel,
        prev_pos=b.pos, prev_angle=b.angle, sleep_count=sleep_count,
    )
    new_world = dataclasses.replace(
        world, bodies=new_bodies, step_count=world.step_count + 1)
    diag = dict(
        slot_count=count,
        slot_overflow=jnp.sum(jnp.maximum(count - cfg.slot_capacity, 0)),
        window_overflow=jnp.sum(winover),
        large_overflow=large_overflow,
        touched=touched,
    )
    return new_world, diag
