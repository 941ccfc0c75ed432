"""Spatial queries: raycast, point query, AABB query.

Rebuild of starframe's query API used by the sandbox mouse-grab
(SURVEY.md §2 row 12, §3.3): vmapped ray/point tests against the unified
rounded-convex-polygon shapes. All results are fixed-capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import math2d as m2
from .narrowphase import world_verts
from .state import World


def _dataclass_pytree(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_dataclass_pytree
class RayHit:
    hit: jax.Array  # bool — anything hit
    t: jax.Array  # f32 — ray parameter of nearest hit (inf if none)
    point: jax.Array  # [2] f32
    normal: jax.Array  # [2] f32 surface normal at hit
    collider: jax.Array  # i32 collider index (-1 if none)
    body: jax.Array  # i32 body index (-1 if none)


def _ray_circle(o, d, c, r):
    """Ray o + t d vs circle (c, r): smallest t >= 0 or inf."""
    oc = o - c
    b = m2.dot2(oc, d)
    cc = m2.dot2(oc, oc) - r * r
    disc = b * b - cc
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, jnp.where(cc < 0, 0.0, t1), jnp.inf))
    return jnp.where(ok, t, jnp.inf)


def _ray_segment(o, d, a, b):
    """Ray vs segment [a, b]: t (inf if miss)."""
    v = b - a
    denom = m2.cross2(d, v)
    ok = jnp.abs(denom) > 1e-12
    denom_s = jnp.where(ok, denom, 1.0)
    t = m2.cross2(a - o, v) / denom_s
    u = m2.cross2(a - o, d) / denom_s
    hit = ok & (t >= 0) & (u >= 0) & (u <= 1)
    return jnp.where(hit, t, jnp.inf)


def _ray_shape(o, d, verts, nv, r):
    """Ray vs one rounded convex polygon (world verts). Returns (t, normal)."""
    V = verts.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where(idx + 1 < nv, idx + 1, 0)
    v0 = verts
    v1 = verts[nxt]
    e = v1 - v0
    elen = m2.norm(e)
    edge_valid = (idx < nv) & (nv >= 2) & (elen > 1e-9)
    n_out = m2.perp_cw(e) / jnp.maximum(elen, 1e-12)[..., None]

    # offset edge surfaces (only the edge facing the ray matters; test all)
    t_edges = jax.vmap(
        lambda a, b, m: jnp.where(m, _ray_segment(o, d, a, b), jnp.inf)
    )(v0 + n_out * r, v1 + n_out * r, edge_valid)
    # vertex arcs: circles of radius r at each valid vertex
    vert_valid = idx < nv
    t_verts = jax.vmap(lambda c, m: jnp.where(m & (r > 0), _ray_circle(o, d, c, r), jnp.inf))(
        v0, vert_valid
    )

    t_e = jnp.min(t_edges)
    i_e = jnp.argmin(t_edges)
    t_v = jnp.min(t_verts)
    i_v = jnp.argmin(t_verts)
    use_edge = t_e <= t_v
    t = jnp.minimum(t_e, t_v)
    p = o + d * t
    n_edge = n_out[i_e]
    n_vert, _ = m2.normalize(p - v0[i_v])
    normal = jnp.where(use_edge, n_edge, n_vert)
    return t, normal


@partial(jax.jit, static_argnames=())
def raycast(world: World, origin, direction, max_t=jnp.inf) -> RayHit:
    """Nearest collider hit by the ray ``origin + t * direction`` (t <= max_t)."""
    o = jnp.asarray(origin, jnp.float32)
    d, _ = m2.normalize(jnp.asarray(direction, jnp.float32))
    wverts = world_verts(world)
    c = world.colliders

    ts, normals = jax.vmap(lambda v, nv, r: _ray_shape(o, d, v, nv, r))(
        wverts, c.nverts, c.radius
    )
    ts = jnp.where(c.active & (ts <= max_t), ts, jnp.inf)
    i = jnp.argmin(ts)
    t = ts[i]
    hit = jnp.isfinite(t)
    return RayHit(
        hit=hit,
        t=t,
        point=o + d * jnp.where(hit, t, 0.0),
        normal=jnp.where(hit, normals[i], jnp.zeros(2)),
        collider=jnp.where(hit, i, -1).astype(jnp.int32),
        body=jnp.where(hit, c.body_idx[i], -1).astype(jnp.int32),
    )


def _point_in_shape(p, verts, nv, r):
    """Distance-based containment for a rounded convex polygon."""
    V = verts.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where(idx + 1 < nv, idx + 1, 0)
    v0, v1 = verts, verts[nxt]
    e = v1 - v0
    elen2 = m2.dot2(e, e)
    tt = jnp.clip(_safe(m2.dot2(p - v0, e), elen2), 0.0, 1.0)
    closest = v0 + e * tt[..., None]
    d_edges = m2.norm(p - closest)
    edge_valid = (idx < nv) & (nv >= 2)
    d_boundary = jnp.min(jnp.where(edge_valid, d_edges, jnp.inf))
    d_vert = jnp.min(jnp.where(idx < nv, m2.norm(p - verts), jnp.inf))
    d_boundary = jnp.minimum(d_boundary, d_vert)

    n_out = m2.perp_cw(e) / jnp.maximum(jnp.sqrt(elen2), 1e-12)[..., None]
    plane_d = m2.dot2(p - v0, n_out)
    inside_core = (nv >= 3) & jnp.all(jnp.where(edge_valid, plane_d <= 0, True))
    dist = jnp.where(inside_core, -d_boundary, d_boundary)
    return dist <= r


def _safe(num, den):
    return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 0.0)


@jax.jit
def query_point(world: World, point) -> jax.Array:
    """Boolean mask [M]: which active colliders contain the world point
    (the sandbox mouse-grab primitive — SURVEY.md §3.3)."""
    p = jnp.asarray(point, jnp.float32)
    wverts = world_verts(world)
    c = world.colliders
    inside = jax.vmap(lambda v, nv, r: _point_in_shape(p, v, nv, r))(
        wverts, c.nverts, c.radius
    )
    return inside & c.active


@jax.jit
def query_aabb(world: World, lo, hi) -> jax.Array:
    """Boolean mask [M]: active colliders whose AABB overlaps [lo, hi]."""
    wverts = world_verts(world)
    c = world.colliders
    r = c.radius[:, None]
    clo = jnp.min(wverts, axis=1) - r
    chi = jnp.max(wverts, axis=1) + r
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    return c.active & jnp.all(clo <= hi, axis=-1) & jnp.all(lo <= chi, axis=-1)


@_dataclass_pytree
class ShapeCastHit:
    hit: jax.Array  # bool — anything hit within max_t
    t: jax.Array  # f32 — sweep fraction in [0, 1] of earliest hit (inf if none)
    point: jax.Array  # [2] f32 — contact point on the hit collider
    normal: jax.Array  # [2] f32 — contact normal (cast shape -> collider)
    collider: jax.Array  # i32 collider index (-1 if none)
    body: jax.Array  # i32 body index (-1 if none)


_CA_ITERS = 24
_CA_TOL = 1e-4


@partial(jax.jit, static_argnames=())
def shape_cast(world: World, verts, nverts, radius, angle, origin,
               translation, mask: int = -1) -> ShapeCastHit:
    """Swept-shape query (SURVEY.md §2 row 12 "shape cast"): sweep a rounded
    convex polygon from ``origin`` (at ``angle``) along ``translation`` and
    return the earliest time of impact against the world's colliders.

    Conservative advancement on the narrowphase's closest-point manifolds:
    each iteration advances the sweep by ``separation / approach_speed``,
    which can never overshoot a convex obstacle; ~24 fixed iterations bring
    the surface gap under 1e-4 world units. Rotation is not swept (the shape
    keeps ``angle`` throughout, like a character/projectile sweep).

    ``verts [V, 2]`` are shape-local; pass a :class:`~starframe_tpu.shapes.
    Shape`'s fields. ``t`` is the fraction of ``translation`` (0..1).
    """
    from .narrowphase import manifold_pair

    verts = jnp.asarray(verts, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(translation, jnp.float32)
    c = world.colliders
    wverts = world_verts(world)  # [M, V, 2]
    d_len = m2.norm(d)

    base = m2.transform(origin, angle, verts)  # cast verts at t=0 [V, 2]

    def per_collider(vm, nv, r):
        def body_fn(carry, _):
            t, done, sep_p, n_p = carry
            va = base + t * d[None, :]
            n, wa, wb, sep, pmask = manifold_pair(va, nverts, radius,
                                                  vm, nv, r, 1e9)
            s = jnp.min(sep)
            speed = m2.dot2(d, n)  # closing speed along the contact normal
            hit_now = s <= _CA_TOL
            stuck = speed <= 1e-9  # separating or parallel: can never hit
            dt = jnp.where(stuck, jnp.inf, s / jnp.maximum(speed, 1e-9))
            t_new = jnp.where(done | hit_now, t, jnp.minimum(t + dt, 1.0 + 1e-3))
            done_new = done | hit_now | stuck | (t_new > 1.0)
            return (t_new, done_new, s, n), None

        (t, done, s, n), _ = jax.lax.scan(
            body_fn, (jnp.float32(0.0), jnp.asarray(False), jnp.float32(jnp.inf),
                      jnp.zeros(2, jnp.float32)),
            None, length=_CA_ITERS)
        hit = (s <= _CA_TOL) & (t <= 1.0)
        return jnp.where(hit, t, jnp.inf), n

    t_all, n_all = jax.vmap(per_collider)(wverts, c.nverts, c.radius)
    layer_ok = ((jnp.int32(mask) >> c.layer) & 1) != 0
    eligible = c.active & jnp.logical_not(c.is_sensor) & layer_ok
    t_all = jnp.where(eligible, t_all, jnp.inf)
    idx = jnp.argmin(t_all)
    t_min = t_all[idx]
    hit = jnp.isfinite(t_min)
    n = n_all[idx]
    # contact point: support of the cast shape at t_min along n. On a miss
    # t_min is inf — clamp before the lerp (inf * 0 is NaN, and the miss
    # fields below must stay NaN-free so jax_debug_nans sessions run clean;
    # misses report point=inf, not NaN).
    t_pt = jnp.where(hit, t_min, 0.0)
    va = base + t_pt * d[None, :]
    proj = (va * n[None, :]).sum(-1)
    vmax = jnp.argmax(jnp.where(jnp.arange(va.shape[0]) < nverts, proj, -jnp.inf))
    point = va[vmax] + n * radius
    return ShapeCastHit(
        hit=hit,
        t=jnp.where(hit, t_min, jnp.inf),
        point=jnp.where(hit, point, jnp.full(2, jnp.inf)),
        normal=jnp.where(hit, n, jnp.zeros(2)),
        collider=jnp.where(hit, idx, -1).astype(jnp.int32),
        body=jnp.where(hit, c.body_idx[idx], -1).astype(jnp.int32),
    )


def body_local_point(world: World, body: int, point):
    """Host helper: express a world point in ``body``'s local frame (the
    grab anchor for a runtime drag joint)."""
    import numpy as np

    pos = np.asarray(world.bodies.pos)[body]
    ang = float(np.asarray(world.bodies.angle)[body])
    d = np.asarray(point, np.float32) - pos
    c, s = np.cos(-ang), np.sin(-ang)
    return np.array([c * d[0] - s * d[1], s * d[0] + c * d[1]], np.float32)


def pick_body(world: World, point) -> int:
    """Host helper: body index under the point, or -1 (mouse-grab flow)."""
    import numpy as np

    mask = np.asarray(query_point(world, point))
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return -1
    return int(np.asarray(world.colliders.body_idx)[idx[0]])
