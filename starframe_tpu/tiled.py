"""XLA-side glue for the sorted-sweep tile engine (pallas/tiles.py): the
sort/permute/pad, large-set extraction, kernel invocation, and inverse
permutation back to canonical body order.

This is the 10k-pile fast path (BASELINE.json:2). Requirements are gated in
:func:`use_tiled`. Rows are COLLIDERS: for one-collider-per-body worlds
(``body_idx == iota`` — the pile) rows coincide with bodies; compound
worlds (``n != m``) keep each body's collider rows contiguous and reduce
per-row corrections to per-body sums with masked shifts
(``pallas.tiles._owner_shift_reduce``) — see :func:`_enter_tiles`.

Two entry points:

- :func:`tiled_step` — one frame: sort in, run, unsort out (the World-API
  shape; the sort+permute glue costs ~2.4 ms at 10k bodies, comparable to
  the whole frame kernel, so rollouts should NOT take this path per frame).
- :func:`tiled_rollout` — N frames with state KEPT IN TILE LAYOUT: sort
  once, re-sort only every ``cfg.frames_per_broadphase`` frames or when the
  staleness guard fires. The window-completeness check is computed from
  actual per-tile x-extrema (not assumed sortedness), so a stale sort is
  SAFE: any body whose swept AABB could reach beyond its 3-tile window
  forces a re-sort before the frame runs (and the in-kernel
  ``window_overflow`` counter remains as the residual diagnostic for
  vertical-slab configurations no sort can fix).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import SolverConfig
from .state import BODY_BULLET, BODY_KINEMATIC, COL_ACTIVE, COL_SENSOR, World

f32 = jnp.float32
i32 = jnp.int32

_BIG = jnp.float32(1e30)


def use_tiled(world: World, cfg: SolverConfig) -> bool:
    """Static gate for the tiled single-world path."""
    from .pallas.tiles import L, T

    if cfg.use_pallas is False or cfg.iterations != 1:
        return False
    if cfg.manifold_refresh != "frame":
        return False  # (also what cfg.ccd requires — step.py raises on it)
    n, m = world.bodies.n, world.colliders.m
    if m < 4 * T:  # small worlds: the XLA path is fine
        return False
    # n == m assumes one collider per body in slot order (body_idx == iota —
    # the pile satisfies it by construction); n != m is the COMPOUND path
    # (collider rows + owner shift-reductions). Compound worlds with joints
    # ride the XLA tier (the joint pass addresses bodies by primary row,
    # not implemented on compound rows), as do compound worlds with moving
    # bodies that have no active collider (no row -> no integration), with
    # inactive colliders on moving bodies (their rows would fall into the
    # frozen tail), or with sibling blocks wider than the owner-reduction
    # span ``cfg.max_colliders_per_body``.
    if n != m:
        if world.joints.j > 0:
            return False
        # Value checks in PURE numpy on the RAW leaves: inside a jit trace,
        # any jnp op would be staged into a tracer (omnistaging) and the
        # np conversion would throw even for closure-constant worlds — so
        # convert FIRST, then do numpy-only math. Worlds that are genuinely
        # traced (step() jitted over the world) skip the value checks and
        # pass structurally; the runtime HARD counter ``owner_overflow``
        # (tiled_rollout/tiled_step diag, _owner_width_overflow) catches
        # every compound-contract violation those checks would have.
        try:
            import numpy as np

            cb = np.asarray(world.colliders.body_idx)
            act = (np.asarray(world.colliders.flags) & COL_ACTIVE) != 0
            moves = ((np.asarray(world.bodies.inv_mass) > 0)
                     | (np.asarray(world.bodies.inv_inertia) > 0)
                     | ((np.asarray(world.bodies.flags)
                         & BODY_KINEMATIC) != 0))
            has_row = np.zeros(n, bool)
            has_row[cb[act]] = True
            if (moves & ~has_row).any() or ((~act) & moves[cb]).any():
                return False
            if np.bincount(cb, minlength=n).max() > cfg.max_colliders_per_body:
                return False
        except jax.errors.TracerArrayConversionError:
            pass  # traced world: structural pass, counters backstop
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def _solve_cap(cfg: SolverConfig) -> int:
    """Per-frame solve-slot width (config.tile_solve_capacity): rounded up
    to a sublane group and clamped to the table capacity; <= 0 disables
    compaction (solve width = table width)."""
    Cs = -(-cfg.slot_capacity // 8) * 8
    if cfg.tile_solve_capacity <= 0:
        return Cs
    return min(-(-cfg.tile_solve_capacity // 8) * 8, Cs)


# ---------------------------------------------------------------------------
# tile-layout entry/exit + re-sort
# ---------------------------------------------------------------------------


def _enter_tiles(world: World, cfg: SolverConfig):
    """Canonical world -> (state, consts, large, body_id, large_overflow).

    ``state``/``consts`` are [Nt, 1, T]-tiled ([Nt, V, T] for verts) in
    x-sorted order; ``body_id [Mp]`` maps tile row -> canonical COLLIDER
    index (padding rows get ids >= M so an argsort of body_id restores
    canonical order). The static large set never changes and is extracted
    once.

    Rows are COLLIDERS carrying their owner body's replicated pose/velocity
    and mass properties (collider offsets are baked into the body-local
    verts, so a compound's rows all share the owner pose exactly). For the
    one-collider-per-body case (``n == m``, ``body_idx == iota`` — the pile)
    the owner gather is the identity and nothing changes. For compound
    worlds (``n != m``) the sibling rows are kept CONTIGUOUS in the layout:
    the sort key is the OWNER's origin coordinate (bit-identical across
    siblings) over a first stable grouping by owner id, and every re-sort /
    partition preserves the blocks by stability — the contiguity is what
    makes the per-substep owner reduction a handful of masked shifts
    (``pallas.tiles._owner_shift_reduce``). ``consts['obody']`` carries the
    canonical owner
    id per row. Moving bodies with NO active collider have no row and stay
    frozen on this path (the XLA tier integrates them; documented gate)."""
    from .pallas.tiles import L, T

    b, c = world.bodies, world.colliders
    M = c.m
    n_tiles = -(-M // T)
    if n_tiles < 3:
        raise ValueError("tiled path needs >= 3 tiles")
    Mp = n_tiles * T
    cb = c.body_idx.astype(i32)  # [M] canonical owner body per collider

    responds = ((b.inv_mass[cb] > 0) | (b.inv_inertia[cb] > 0)).astype(f32)
    kin = ((b.flags[cb] & BODY_KINEMATIC) != 0).astype(f32)
    moves = jnp.maximum(responds, kin)
    col_active = ((c.flags & COL_ACTIVE) != 0).astype(f32)
    sensor = ((c.flags & COL_SENSOR) != 0).astype(f32)

    # sort moving colliders along cfg.tile_sort_axis by their OWNER's origin
    # (identical across siblings), statics/inactive/padding to the tail; the
    # pre-grouping by owner id + stability keeps sibling rows contiguous
    # whatever order the builder interleaved them in
    cx = b.pos[cb, 0 if cfg.tile_sort_axis == "x" else 1]
    key = jnp.where((col_active > 0) & (moves > 0), cx,
                    jnp.where(col_active > 0, _BIG, 2 * _BIG))
    if world.bodies.n != M:
        grp = jnp.argsort(cb)  # stable: group siblings
        perm = grp[jnp.argsort(key[grp])]  # stable: blocks stay contiguous
    else:
        perm = jnp.argsort(key)  # [Mp] (stable)
    perm = jnp.concatenate([perm, jnp.arange(M, Mp, dtype=perm.dtype)])
    body_id = jnp.concatenate([jnp.arange(M, dtype=i32),
                               jnp.arange(M, Mp, dtype=i32)])[perm]

    def srt(x, fill=0.0):
        xp = jnp.concatenate(
            [x, jnp.full((Mp - M,) + x.shape[1:], fill, x.dtype)])
        return xp[perm]

    def tile2(x):  # [Mp] -> [Nt, 1, T] (middle singleton for Mosaic blocks)
        return x.reshape(n_tiles, 1, T)

    state = dict(
        px=tile2(srt(b.pos[cb, 0])), py=tile2(srt(b.pos[cb, 1])),
        an=tile2(srt(b.angle[cb])), vx=tile2(srt(b.vel[cb, 0])),
        vy=tile2(srt(b.vel[cb, 1])), om=tile2(srt(b.ang_vel[cb])),
    )
    vlx = srt(c.verts[..., 0])  # [Mp, V]
    vly = srt(c.verts[..., 1])
    V = vlx.shape[1]
    # conservative per-collider x-extent for the staleness guard: max vert
    # norm + dilation radius + the narrowphase margin pad
    ext = (jnp.max(jnp.sqrt(c.verts[..., 0] ** 2 + c.verts[..., 1] ** 2),
                   axis=1) + c.radius + 0.5 * cfg.contact_margin)
    consts = dict(
        rad=tile2(srt(c.radius)),
        nv=tile2(srt(c.nverts)),
        fric=tile2(srt(c.friction)),
        rst=tile2(srt(c.restitution)),
        sen=tile2(srt(sensor)),
        act=tile2(srt(col_active)),
        mov=tile2(srt(moves)),
        invm=tile2(srt(b.inv_mass[cb])),
        invi=tile2(srt(b.inv_inertia[cb])),
        lay=tile2(srt(c.layer)),
        msk=tile2(srt(c.mask)),
        responds=tile2(srt(responds)),
        dynb=tile2(srt((b.inv_mass[cb] > 0).astype(f32))),
        kin=tile2(srt(kin)),
        ext=tile2(srt(ext)),
        sleep=tile2(srt(b.sleep_count[cb])),
        blt=tile2(srt(((b.flags[cb] & BODY_BULLET) != 0).astype(f32))),
        # canonical owner body id per row (padding: an out-of-range id per
        # ROW, so padding rows never alias a real body's sibling block)
        obody=tile2(jnp.concatenate(
            [cb, jnp.arange(M, Mp, dtype=i32) + world.bodies.n])[perm]),
        # awake-prefix compaction flag (cfg.tile_awake_compaction): 1 while
        # the row is in the live prefix (or the layout is un-partitioned);
        # only _partition ever clears it. Gates the window-completeness
        # machinery (_edge_rows / winover) to the live partition.
        kept=tile2(jnp.ones((Mp,), f32)),
        vlx=vlx.reshape(n_tiles, T, V).transpose(0, 2, 1),
        vly=vly.reshape(n_tiles, T, V).transpose(0, 2, 1),
    )

    # large set: static active colliders, broadcast to every tile
    lkey = jnp.where((col_active > 0) & (moves == 0),
                     jnp.arange(M, dtype=i32), jnp.int32(2**30))
    lsort = jnp.sort(lkey)[:L]
    n_large = jnp.sum(lkey < 2**30)
    l_valid = jnp.arange(L) < jnp.minimum(n_large, L)
    lidx = jnp.where(l_valid, lsort, 0)
    lb = cb[lidx]  # owner bodies of the large slots
    large = dict(
        px=b.pos[lb, 0][None], py=b.pos[lb, 1][None],
        an=b.angle[lb][None],
        vlx=c.verts[lidx, :, 0].T[None], vly=c.verts[lidx, :, 1].T[None],
        rad=c.radius[lidx][None], nv=c.nverts[lidx][None],
        fric=c.friction[lidx][None], rst=c.restitution[lidx][None],
        sen=sensor[lidx][None],
        act=jnp.where(l_valid, col_active[lidx], 0.0)[None],
        lay=c.layer[lidx][None], msk=c.mask[lidx][None],
    )
    large_overflow = jnp.maximum(n_large - L, 0)
    large = dict(large, cols=lidx)  # canonical collider ids (event keys)
    return state, consts, large, body_id, large_overflow


_RESORT_KEYS = ("rad", "nv", "fric", "rst", "sen", "act", "mov", "invm",
                "invi", "lay", "msk", "responds", "dynb", "kin", "ext",
                "sleep", "blt", "kept", "obody")


def _resort(state: dict, consts: dict, body_id, axis_key: str = "px",
            shard_axis: str | None = None):
    """Re-sort the tile layout by the current sort-axis position
    (statics/padding keep the tail).

    With ``shard_axis`` the sort is GLOBAL across the sharded tile axis:
    each shard all-gathers the [Mp] sort keys (tiny), computes the global
    permutation, and gathers its own Mp_loc rows from all-gathered source
    arrays. The ~25 [Mp]-row all-gathers make this the expensive step of
    the sharded rollout — which is exactly why the rollout amortizes
    resorts over ``frames_per_broadphase`` and skips them while asleep."""
    Nt, _, T = state["px"].shape
    Mp = Nt * T

    def flat(x):
        return x.reshape(Mp, *x.shape[3:])

    act = flat(consts["act"])
    mov = flat(consts["mov"])
    px = flat(state[axis_key])
    key = jnp.where((act > 0) & (mov > 0), px,
                    jnp.where(act > 0, _BIG, 2 * _BIG))
    if shard_axis is not None:
        key_g = jax.lax.all_gather(key, shard_axis, tiled=True)  # [Mp_glob]
        perm_g = jnp.argsort(key_g)
        s = jax.lax.axis_index(shard_axis)
        perm = jax.lax.dynamic_slice(perm_g, (s * Mp,), (Mp,))

        def permuted(x):  # local [Mp, ...] -> my slice of the global sort
            xg = jax.lax.all_gather(x, shard_axis, tiled=True)
            return xg[perm]
    else:
        perm = jnp.argsort(key)

        def permuted(x):
            return x[perm]

    return _apply_perm(state, consts, body_id, permuted)


def _apply_perm(state, consts, body_id, permuted):
    """Apply a row permutation (a ``[Mp, ...] -> [Mp, ...]`` gather closure)
    to the whole tile layout — shared by :func:`_resort` and
    :func:`_partition`."""
    Nt, _, T = state["px"].shape
    Mp = Nt * T

    def flat(x):
        return x.reshape(Mp, *x.shape[3:])

    def tile2(x):
        return x.reshape(Nt, 1, T)

    state = {k: tile2(permuted(flat(v))) for k, v in state.items()}
    new_consts = {k: tile2(permuted(flat(consts[k]))) for k in _RESORT_KEYS}
    # verts are [Nt, V, T]: flatten lane-major, permute rows, retile
    V = consts["vlx"].shape[1]
    for k in ("vlx", "vly"):
        v = permuted(consts[k].transpose(0, 2, 1).reshape(Mp, V))
        new_consts[k] = v.reshape(Nt, T, V).transpose(0, 2, 1)
    return state, new_consts, permuted(body_id)


def _keep_boxes(state, consts, cfg: SolverConfig, gravity):
    """Per-row swept AABBs + flags for the keep computation, [Mp] each,
    LAYOUT-FREE (no window reads — safe to compute in any row order).

    The boxes mirror ``pallas.tiles._tables_kernel``'s inflation (margin pad
    + the K-frame speed sweep with the same slack/floor/cap), minus the
    layer/sensor eligibility filters — a conservative superset, so the keep
    set can only grow: every pair the later table build (and the positional
    guard horizon) can admit is covered by an overlap of these boxes."""
    Nt, _, T = state["px"].shape
    Mp = Nt * T

    def flat(x):
        return x.reshape(Mp, *x.shape[3:])

    px = flat(state["px"])
    py = flat(state["py"])
    an = flat(state["an"])
    vx = flat(state["vx"])
    vy = flat(state["vy"])
    vlx = consts["vlx"].transpose(0, 2, 1).reshape(Mp, -1)  # [Mp, V]
    vly = consts["vly"].transpose(0, 2, 1).reshape(Mp, -1)
    rad = flat(consts["rad"])
    mova = (flat(consts["mov"]) > 0) & (flat(consts["act"]) > 0)
    ca = jnp.cos(an)[:, None]
    sa = jnp.sin(an)[:, None]
    wx = px[:, None] + ca * vlx - sa * vly
    wy = py[:, None] + sa * vlx + ca * vly
    ext = jnp.max(jnp.sqrt(vlx**2 + vly**2), axis=1) + rad
    pad = rad + 0.5 * cfg.contact_margin
    K = max(cfg.frames_per_broadphase, 1)
    if K > 1:
        g = jnp.asarray(gravity, f32)
        gmag = jnp.sqrt(jnp.sum(g * g))
        spd = jnp.sqrt(vx * vx + vy * vy)
        sw = jnp.minimum(
            (spd + gmag * cfg.dt + cfg.broadphase_speed_slack) * (K * cfg.dt)
            + cfg.tile_sweep_floor * ext,
            cfg.tile_sweep_cap * ext) * mova
    else:
        sw = jnp.maximum(jnp.abs(vx), jnp.abs(vy)) * cfg.dt * mova
    grow = pad + sw
    boxes = (jnp.min(wx, axis=1) - grow, jnp.max(wx, axis=1) + grow,
             jnp.min(wy, axis=1) - grow, jnp.max(wy, axis=1) + grow)
    asleep = ((flat(consts["sleep"]) >= cfg.sleep_frames)
              & (flat(consts["invm"]) > 0))
    return boxes, mova, mova & ~asleep


def _keep_hop(boxes, flag, Nt, T):
    """One neighborhood hop on an X-SORTED layout: rows whose box overlaps
    any flagged box in their 3-tile window (dense [Nt, 3T, T] test — the
    window invariant of the x-sort makes it exhaustive)."""
    lox, hix, loy, hiy = (b.reshape(Nt, T) for b in boxes)
    start = jnp.clip(jnp.arange(Nt) - 1, 0, Nt - 3)

    def win(a):  # [Nt, T] -> [Nt, 3T]
        return jnp.concatenate([a[start], a[start + 1], a[start + 2]], axis=1)

    fl = win(flag.reshape(Nt, T))[:, :, None]
    ov = ((win(lox)[:, :, None] <= hix[:, None, :])
          & (lox[:, None, :] <= win(hix)[:, :, None])
          & (win(loy)[:, :, None] <= hiy[:, None, :])
          & (loy[:, None, :] <= win(hiy)[:, :, None]))
    return jnp.any(ov & fl, axis=1).reshape(Nt * T)


def _partition_perm(key_x, boxes_x, mova_x, awake_x, Nt, T,
                    ob_x=None, kc: int = 1, jedges=None):
    """The awake-prefix keep set + partition permutation, all computed in
    X-SORTED row order (``*_x``). kept = awake bodies, plus every row whose
    swept box an awake box overlaps (1 hop — the soundness-critical set:
    contacts and wake signals awake bodies can cause within the guard
    horizon), plus one more hop (so a woken boundary sleeper's own resting
    partners are already in the prefix and the wake front propagates without
    waiting for the next re-sort). Returns ``(perm_p [Mp] into x-order,
    kept_x [Mp] bool)``; the partition is a stable sort, so both sides stay
    x-ordered."""
    kept = awake_x
    # 1st hop is the soundness-critical set; the extra hops buffer wake
    # AVALANCHES: a woken boundary sleeper pushes its own neighbors before
    # the next re-sort can extend the prefix, and each missing layer costs
    # a penetration pop bounded by the (asleep-tightened) guard budget —
    # three layers deep absorbs a front advancing ~1 layer per guard cycle
    for _ in range(3):
        kept = kept | (mova_x & _keep_hop(boxes_x, kept, Nt, T))
        if jedges is not None:
            # joint-edge closure: a kept endpoint keeps its partner (frozen
            # partners must stay ADDRESSABLE in the bucket-sliced joint
            # pass; interleaved with the hops so chains propagate alongside
            # contact avalanches)
            ra, rb, jact = jedges
            ke = ((kept[ra] | kept[rb]) & jact).astype(i32)
            k32 = kept.astype(i32).at[ra].max(ke).at[rb].max(ke)
            kept = k32 > 0
    kept = jnp.where(mova_x, kept, True)
    if ob_x is not None:
        # compound rows: the keep decision is a BODY property — one kept
        # sibling keeps the whole block, so the stable class partition
        # below never splits a sibling block across the prefix boundary
        from .pallas.tiles import _owner_shift_reduce

        kept = _owner_shift_reduce(kept, ob_x, kc, jnp.logical_or,
                                   jnp.bool_(False))
    # same tail classes as _resort's key: movers (partitioned), then
    # statics, then inactive/padding — key_x already encodes the classes
    pclass = jnp.where(mova_x, jnp.where(kept, 0.0, 1.0),
                       jnp.where(key_x >= 2 * _BIG, 3.0, 2.0))
    return jnp.argsort(pclass), kept


def _owner_width_overflow(world: World, cfg: SolverConfig):
    """Compound-contract violations (i32 scalar, HARD counter):

    - colliders beyond the owner-reduction span on any body (the shift
      reduction spans ``cfg.max_colliders_per_body`` rows; a wider sibling
      block drops its overflowing rows' corrections),
    - moving bodies with NO active collider (no row -> never integrated on
      the collider-row layout),
    - inactive colliders on moving bodies (their rows land in the frozen
      tail while active siblings integrate).

    ``use_tiled`` rejects all three when the world is concrete; this
    counter is the runtime backstop for traced worlds (jit'd ``step``)
    and direct ``tiled_rollout`` calls past the gate."""
    b, c = world.bodies, world.colliders
    cb = c.body_idx.astype(i32)
    act = ((c.flags & COL_ACTIVE) != 0).astype(i32)
    moves = ((b.inv_mass > 0) | (b.inv_inertia > 0)
             | ((b.flags & BODY_KINEMATIC) != 0))
    cnt = jnp.zeros((b.n,), i32).at[cb].add(1)
    width = jnp.sum(jnp.maximum(cnt - cfg.max_colliders_per_body, 0))
    act_rows = jnp.zeros((b.n,), i32).at[cb].max(act)
    no_row = jnp.sum((moves & (act_rows == 0)).astype(i32))
    inact = jnp.sum(((act == 0) & moves[cb]).astype(i32))
    return width + no_row + inact


def _joint_rows(joints, body_id, n_tiles: int, shard_axis: str | None = None):
    """Row-indexed joint pytree for the tile engine's XLA joint pass
    (pallas.tiles._tile_joint_pass): canonical endpoint ids mapped through
    the current sort permutation (``body_id`` row -> canonical inverts to
    canonical -> row with one scatter), plus the frame-static joint params.
    Rebuilt whenever ``body_id`` may have changed (resorts); the effective
    (sleep-frozen) inverse masses are filled per frame by _run_frame.
    Returns ``(jrows, joint_shard_overflow)``.

    With ``shard_axis`` (tile axis sharded; ``body_id`` is the shard-local
    slice) rows are HALO-LOCAL: each joint is assigned to the shard owning
    ``row_a``; a partner within the one-tile halo reach is addressable (the
    joint pass folds its corrections back over the halo exchange), and a
    partner beyond it is masked inactive and counted in the replicated HARD
    counter ``joint_shard_overflow`` — on an x-sorted layout joint
    endpoints are spatially adjacent, so reach misses mean the sort put
    >1 tile of rows between jointed bodies (raise tiles per shard or keep
    such scenes on fewer shards). ``srow_a/srow_b/sact`` are OWN-space
    endpoint rows for the sleep closure, masked to fully-local joints
    (cross-shard pairs fall back to per-body sleep)."""
    from .pallas.tiles import T

    j = joints
    Mp = n_tiles * T
    if shard_axis is None:
        take = jnp.zeros((Mp,), i32).at[body_id].set(
            jnp.arange(Mp, dtype=i32))
        row_a, row_b = take[j.body_a], take[j.body_b]
        active = j.active
        extra = dict(srow_a=row_a, srow_b=row_b, sact=active)
        jovf = jnp.int32(0)
    else:
        bid_g = jax.lax.all_gather(body_id, shard_axis, tiled=True)
        Mg = bid_g.shape[0]
        take = jnp.zeros((Mg,), i32).at[bid_g].set(jnp.arange(Mg, dtype=i32))
        ga, gb = take[j.body_a], take[j.body_b]
        base = jax.lax.axis_index(shard_axis) * Mp
        la = ga - base + T
        lb = gb - base + T
        Mh = Mp + 2 * T
        mine = (ga >= base) & (ga < base + Mp)
        reach = (lb >= 0) & (lb < Mh)
        active = j.active & mine & reach
        jovf = jax.lax.psum(
            jnp.sum((mine & j.active & jnp.logical_not(reach)).astype(i32)),
            shard_axis)
        row_a = jnp.clip(la, 0, Mh - 1)
        row_b = jnp.clip(lb, 0, Mh - 1)
        both_own = ((la >= T) & (la < T + Mp) & (lb >= T) & (lb < T + Mp))
        extra = dict(srow_a=jnp.clip(la - T, 0, Mp - 1),
                     srow_b=jnp.clip(lb - T, 0, Mp - 1),
                     sact=active & both_own)
    return dict(
        row_a=row_a, row_b=row_b,
        jtype=j.jtype, anchor_a=j.anchor_a, anchor_b=j.anchor_b,
        rest=j.rest, lo=j.lo, hi=j.hi, compliance=j.compliance,
        damping=j.damping, motor_speed=j.motor_speed,
        motor_max=jnp.nan_to_num(j.motor_max, posinf=3.4e38),
        color=j.color, active=active, **extra,
    ), jovf


def _edge_rows(state: dict, consts: dict, cfg: SolverConfig,
               shard_axis: str | None = None):
    """Window-completeness bounds from ACTUAL per-tile x-extrema — valid for
    any (possibly stale) ordering. Returns (edge_lo, edge_hi) [Nt, 1, T]
    rows for the setup kernel and the tile-level staleness flag: True when
    some live body's swept reach escapes its 3-tile window's coverage.

    With ``shard_axis`` (tile axis sharded under ``shard_map``) the per-tile
    extrema are all-gathered (one [Nt]-float row each way — tiny) so the
    prefix/suffix scans see the GLOBAL tile sequence; the window coverage is
    the halo mode's uniform (t-1, t, t+1), and ``stale`` is psum-replicated
    so every shard takes the same resort branch."""
    Nt, _, T = state["px"].shape
    if cfg.tile_sort_axis == "x":
        px = state["px"].reshape(Nt, T)
        vx = state["vx"].reshape(Nt, T)
    else:
        px = state["py"].reshape(Nt, T)
        vx = state["vy"].reshape(Nt, T)
    ext = consts["ext"].reshape(Nt, T)
    # the completeness invariant is scoped to the live partition: tail rows
    # (kept == 0) are sleepers no awake body can reach within the current
    # table window — their x-extents interleave the prefix's by design, and
    # counting them here would flag a (provably absent) miss every frame
    live = ((consts["act"].reshape(Nt, T) > 0)
            & (consts["mov"].reshape(Nt, T) > 0)
            & (consts["kept"].reshape(Nt, T) > 0))
    reach = ext + jnp.abs(vx) * cfg.dt
    hi = jnp.where(live, px + reach, -_BIG)
    lo = jnp.where(live, px - reach, _BIG)
    tile_hi = jnp.max(hi, axis=1)  # [Nt] (local tiles)
    tile_lo = jnp.min(lo, axis=1)
    if shard_axis is not None:
        hi_g = jax.lax.all_gather(tile_hi, shard_axis, tiled=True)  # [Ntg]
        lo_g = jax.lax.all_gather(tile_lo, shard_axis, tiled=True)
        Ntg = hi_g.shape[0]
        premax = jax.lax.cummax(hi_g)
        sufmin = jax.lax.cummin(lo_g[::-1])[::-1]
        s = jax.lax.axis_index(shard_axis)
        t = s * Nt + jnp.arange(Nt)  # global tile ids of my local tiles
        right = t + 2  # first tile past the uniform (t-1, t, t+1) window
        left = t - 2
        edge_hi_t = jnp.where(right <= Ntg - 1,
                              sufmin[jnp.minimum(right, Ntg - 1)], _BIG)
        edge_lo_t = jnp.where(left >= 0, premax[jnp.maximum(left, 0)], -_BIG)
        stale_l = jnp.any((tile_hi > edge_hi_t) | (tile_lo < edge_lo_t))
        stale = jax.lax.psum(stale_l.astype(i32), shard_axis) > 0
    else:
        premax = jax.lax.cummax(tile_hi)  # prefix max of tile highs
        sufmin = jax.lax.cummin(tile_lo[::-1])[::-1]  # suffix min of lows

        t = jnp.arange(Nt)
        start = jnp.clip(t - 1, 0, Nt - 3)
        right = start + 3  # first tile past the window
        left = start - 1  # last tile before the window
        edge_hi_t = jnp.where(right <= Nt - 1,
                              sufmin[jnp.minimum(right, Nt - 1)], _BIG)
        edge_lo_t = jnp.where(left >= 0, premax[jnp.maximum(left, 0)], -_BIG)
        stale = jnp.any((tile_hi > edge_hi_t) | (tile_lo < edge_lo_t))
    edge_lo = jnp.broadcast_to(edge_lo_t[:, None, None], (Nt, 1, T))
    edge_hi = jnp.broadcast_to(edge_hi_t[:, None, None], (Nt, 1, T))
    return edge_lo, edge_hi, stale


def _bucket_sizes(n_tiles: int):
    """Precompiled grid-size buckets for the awake-prefix fast path:
    descending tile counts the kernels are compiled at (each a separate
    Mosaic compile; the smallest bucket >= the live prefix runs)."""
    fracs = (1.0, 0.75, 0.5, 0.3, 0.15)
    sizes = sorted({max(3, -(-int(n_tiles * f) // 1)) for f in fracs})
    return [s for s in sizes if s <= n_tiles] or [n_tiles]


def _run_frame(state, consts, large, cfg: SolverConfig, gravity,
               interpret: bool = False, tables=None, jrows=None,
               shard_axis: str | None = None, fuse: bool | None = None,
               n_live_t=None, event_ids=None, n_colliders: int = 0,
               compound: bool = False, edges=None):
    """One frame on tile-layout state. Returns (state', consts', diag_frame).
    ``tables=(pidx, act)`` reuses a K-frame broadphase built by
    :func:`starframe_tpu.pallas.tiles.build_tile_tables` (the rollout's
    amortization lever); None builds per-frame tables in-kernel.

    Sleep semantics (unified with the XLA path, VERDICT r2 item 7): sleepers
    are frozen EXACTLY for the frame (effective inverse masses zeroed, so
    awake neighbors solve against them as static) and wake the frame after
    a touching FAST dynamic partner is detected in-kernel. Tiles whose whole
    3-tile window is asleep skip all kernel compute (``tile_live`` — the
    island-granular work saving of SURVEY.md §2 row 11, at spatial-slab
    granularity).

    ``n_live_t`` (traced scalar, awake-prefix compaction): number of leading
    tiles holding kept rows. The kernels then run on the smallest
    precompiled tile-count bucket covering the prefix (measured r5: the
    per-tile ``tile_live`` skip saves only ~60% of a dead tile's cost —
    grid-step overhead and zero-fill stores remain — so the grid itself must
    shrink); the tail passes through frozen. Sound because the keep set
    guarantees no prefix-tail interaction and tail rows can neither move nor
    wake (their windows hold no awake body)."""
    from .pallas.tiles import run_tiled_frame

    if edges is None:
        edge_lo, edge_hi, _ = _edge_rows(state, consts, cfg, shard_axis)
    else:
        edge_lo, edge_hi = edges
    Nt, _, T = state["px"].shape
    kc = dict(consts, edge_lo=edge_lo, edge_hi=edge_hi)
    if cfg.sleep_velocity > 0.0:
        asleep = (consts["sleep"] >= cfg.sleep_frames) & (consts["invm"] > 0)
        awake_f = 1.0 - asleep.astype(f32)
        kc = dict(kc, invm=consts["invm"] * awake_f,
                  invi=consts["invi"] * awake_f,
                  dynb=consts["dynb"] * awake_f)
        awake_body = (consts["mov"] > 0) & (consts["act"] > 0) & ~asleep
        any_awake_t = jnp.any(awake_body.reshape(Nt, T), axis=1)
        if shard_axis is not None:
            # the liveness window crosses shard edges: gather the [Ntg]
            # per-tile awake bits (tiny) and index the uniform window
            aw_g = jax.lax.all_gather(any_awake_t, shard_axis, tiled=True)
            Ntg = aw_g.shape[0]
            t = jax.lax.axis_index(shard_axis) * Nt + jnp.arange(Nt)

            def get(i):
                return jnp.where((i >= 0) & (i <= Ntg - 1),
                                 aw_g[jnp.clip(i, 0, Ntg - 1)], False)

            win_any = get(t - 1) | get(t) | get(t + 1)
        else:
            t = jnp.arange(Nt)
            start = jnp.clip(t - 1, 0, Nt - 3)
            win_any = (any_awake_t[start] | any_awake_t[start + 1]
                       | any_awake_t[start + 2])
        tile_live = jnp.broadcast_to(
            win_any.astype(f32)[:, None, None], (Nt, 1, T))
    else:
        tile_live = jnp.ones((Nt, 1, T), f32)
    kc = dict(kc, tile_live=tile_live)

    V = consts["vlx"].shape[1]
    Cs = -(-cfg.slot_capacity // 8) * 8
    Csol = _solve_cap(cfg)
    if jrows is not None:
        # effective (sleep-frozen) inverse masses for the joint pass — same
        # freeze the contact kernels see this frame
        Mp = Nt * T
        jrows = dict(jrows, invm=kc["invm"].reshape(Mp),
                     invi=kc["invi"].reshape(Mp))
    def invoke(nb: int):
        """Run the frame kernels on the leading ``nb`` tiles, outputs padded
        back to the full Nt shapes (tail rows: frozen state passthrough,
        zeroed diagnostics)."""

        def sl(x):
            return x if nb == Nt else x[:nb]

        st_b = {k: sl(state[k]) for k in ("px", "py", "an", "vx", "vy", "om")}
        kc_b = {k: (v if not (hasattr(v, "shape") and v.ndim >= 1
                              and v.shape[:1] == (Nt,)) else sl(v))
                for k, v in kc.items()}
        tb_b = None if tables is None else tuple(sl(t) for t in tables)
        ev_b = (None if event_ids is None
                else (sl(event_ids[0]), event_ids[1]))
        jr_b = jrows
        if jrows is not None and nb != Nt:
            # awake-prefix bucket with joints: the partition's joint-edge
            # closure guarantees any joint with a KEPT endpoint has BOTH
            # endpoints in the prefix — rows past the bucket belong to
            # all-frozen (inert) joints, masked out and clamped in-range
            Mb = nb * T
            in_b = (jrows["row_a"] < Mb) & (jrows["row_b"] < Mb)
            jr_b = dict(jrows,
                        row_a=jnp.minimum(jrows["row_a"], Mb - 1),
                        row_b=jnp.minimum(jrows["row_b"], Mb - 1),
                        active=jnp.where(in_b, jrows["active"], 0),
                        invm=jrows["invm"][:Mb], invi=jrows["invi"][:Mb])
        out = run_tiled_frame(
            st_b, kc_b, large, jnp.asarray(gravity, f32)[None], tb_b, jr_b,
            C=Cs, Cs=Csol, V=V, substeps=cfg.substeps,
            h=cfg.dt / cfg.substeps, dt=cfg.dt, margin=cfg.contact_margin,
            compliance=cfg.contact_compliance, relaxation=cfg.relaxation,
            max_dpos=cfg.max_dpos_eff,
            rest_threshold=cfg.restitution_threshold,
            lin_damp=cfg.linear_damping, ang_damp=cfg.angular_damping,
            # the kernels use this ONLY as the wake-on-fast-contact
            # threshold (sleep ENTRY is the XLA-side counter update below,
            # at the raw sleep_velocity) — the factored wake threshold
            sleep_velocity=cfg.sleep_velocity * cfg.wake_velocity_factor,
            sort_axis=0 if cfg.tile_sort_axis == "x" else 1,
            ccd=cfg.ccd, ccd_slop=cfg.ccd_slop,
            joint_colors=cfg.max_joint_colors, max_dpos_joint=cfg.max_dpos,
            shard_axis=shard_axis,
            # compiled: whole-frame megakernel; interpret: per-substep
            # kernels (same shared math — the interpreter copies resident
            # blocks per grid step, making the fused grid pathologically
            # slow)
            fuse=(not interpret) if fuse is None else fuse,
            interpret=interpret, event_ids=ev_b, n_colliders=n_colliders,
            compound=compound, owner_kc=cfg.max_colliders_per_body,
        )
        if nb == Nt:
            return out
        ns_b, rest = out[0], out[1:]

        def padz(x):  # zero-pad a [nb, ...] diag array back to [Nt, ...]
            return jnp.concatenate(
                [x, jnp.zeros((Nt - nb,) + x.shape[1:], x.dtype)])

        ns = {k: jnp.concatenate([ns_b[k], state[k][nb:]]) for k in ns_b}
        return (ns,) + jax.tree.map(padz, rest)

    if (n_live_t is not None and shard_axis is None
            and tables is not None and not interpret):
        sizes = _bucket_sizes(Nt)
        sz = jnp.asarray(sizes, i32)
        idx = jnp.sum(n_live_t > sz)  # smallest bucket >= prefix
        out = jax.lax.switch(
            jnp.minimum(idx, len(sizes) - 1),
            [functools.partial(lambda nb, _: invoke(nb), nb)
             for nb in sizes], 0)
    else:
        out = invoke(Nt)
    new_state, touched, (count, count_touch, count_close), winover, wake, \
        pen, pidx, pidx_c, act, npts, src, nact, key_sel = out
    if compound:
        # the wake signal is a body-level event: one touched sibling wakes
        # the whole compound (keeps sibling sleep counters bit-identical)
        from .pallas.tiles import _owner_max3

        wake = _owner_max3(wake, consts["obody"].reshape(-1),
                           cfg.max_colliders_per_body)
    consts2 = dict(consts)
    if cfg.sleep_velocity > 0.0:
        slow = (new_state["vx"] ** 2 + new_state["vy"] ** 2
                + new_state["om"] ** 2) < cfg.sleep_velocity ** 2
        wakef = wake > 0
        if jrows is not None:
            # island-style joint coupling, unified with the XLA tier
            # (step._joint_slow_closure): joint-connected bodies sleep and
            # wake together — a dumbbell never ends up half frozen with the
            # awake half yanking against it (measured r5: that instability
            # kept the jointed 10k pile in wake avalanches + resort storms)
            from types import SimpleNamespace

            from .step import _joint_slow_closure, _joint_wake_closure

            # srow/sact: OWN-space rows (== row space unsharded; under a
            # sharded tile axis, halo-reach rows remapped with cross-shard
            # pairs masked — those fall back to per-body sleep)
            je = SimpleNamespace(body_a=jrows["srow_a"],
                                 body_b=jrows["srow_b"],
                                 active=jrows["sact"])
            sh = slow.shape
            slow = _joint_slow_closure(slow.reshape(-1), je).reshape(sh)
            wakef = _joint_wake_closure(wakef.reshape(-1), je).reshape(sh)
        sleep = jnp.where(slow, consts["sleep"] + 1, 0)
        # wake-on-fast-contact resets the counter the frame after detection
        sleep = jnp.where(wakef, 0, sleep)
        asleep2 = (sleep >= cfg.sleep_frames) & (consts["invm"] > 0)
        new_state = dict(
            new_state,
            vx=jnp.where(asleep2, 0.0, new_state["vx"]),
            vy=jnp.where(asleep2, 0.0, new_state["vy"]),
            om=jnp.where(asleep2, 0.0, new_state["om"]),
        )
        consts2 = dict(consts2, sleep=sleep)
    # unified cross-tier Diagnostics scalars (VERDICT r3 item 8): UNDIRECTED
    # counts comparable with the XLA tier's compute_diagnostics — window
    # (dyn-dyn) table entries appear in both rows (weight 0.5), large-set
    # (static) partners once (weight 1); npts is weighted in-kernel
    from .pallas.tiles import T as _T, WIN

    und_w = jnp.where(pidx < WIN * _T, 0.5, 1.0)  # table slots [Nt, C, T]
    und_ws = jnp.where(pidx_c < WIN * _T, 0.5, 1.0)  # solve slots
    # compaction counters (config.tile_solve_capacity): solve slots keep
    # the Csol CLOSEST active manifolds, so a hard drop means an imminent
    # manifold (sep < margin) was cut; overflow of merely pmask-active
    # (velocity-expanded margin) candidates is a one-frame-staleness soft
    # drop, re-admitted at the next frame's manifold pass
    hard_over = jnp.maximum(nact[:, 1:2] - Csol, 0)
    soft_over = jnp.maximum(nact[:, 0:1] - Csol, 0) - hard_over
    diag = dict(
        slot_count=count,
        slot_overflow=jnp.sum(jnp.maximum(count_touch - Cs, 0)),
        solve_overflow=jnp.sum(hard_over),
        solve_dropped=jnp.sum(soft_over),
        margin_dropped=jnp.sum(jnp.maximum(count_close - Cs, 0)),
        spec_dropped=jnp.sum(jnp.maximum(count - Cs, 0)),
        window_overflow=jnp.sum(winover),
        max_penetration=jnp.max(pen),
        touched=touched,
        pidx=pidx_c,
        slot_src=src,
        pair_und=jnp.sum(act * und_w),
        touching_und=jnp.sum((touched > 0) * und_ws),
        contact_und=jnp.sum(npts),
    )
    if event_ids is not None:
        # in-kernel canonical event keys (computed from the slot gathers and
        # compacted alongside slot_src — no XLA gathers at all; VERDICT r4
        # weak #2)
        diag["key_sel"] = key_sel
    return new_state, consts2, diag


def _exit_tiles(world: World, state: dict, consts: dict, prev: dict,
                body_id, n_frames) -> World:
    """Tile-layout state -> canonical World (inverse of the entry sort).

    ``body_id`` maps tile row -> canonical COLLIDER index. For the
    one-collider-per-body layout (``body_idx == iota``) collider order IS
    body order; for compound worlds every sibling row carries the identical
    owner state, so each body reads back through its FIRST collider's row
    (bodies with no collider keep their canonical values — they never had a
    row; ``use_tiled`` guarantees no such body moves)."""
    b = world.bodies
    M = world.colliders.m
    Mp = body_id.shape[0]
    take = jnp.argsort(body_id)  # canonical collider -> tile row
    if b.n != M:
        cb = world.colliders.body_idx.astype(i32)
        first = jnp.full((b.n,), M, i32).at[cb].min(
            jnp.arange(M, dtype=i32))  # body -> its first collider
        has_row = first < M
        take = take[jnp.where(has_row, first, 0)]

        def unsort(x, orig):
            return jnp.where(has_row, x.reshape(Mp)[take], orig)
    else:

        def unsort(x, orig):
            return x.reshape(Mp)[take][:M]

    pos = jnp.stack([unsort(state["px"], b.pos[:, 0]),
                     unsort(state["py"], b.pos[:, 1])], axis=-1)
    vel = jnp.stack([unsort(state["vx"], b.vel[:, 0]),
                     unsort(state["vy"], b.vel[:, 1])], axis=-1)
    new_bodies = dataclasses.replace(
        b, pos=pos, angle=unsort(state["an"], b.angle), vel=vel,
        ang_vel=unsort(state["om"], b.ang_vel),
        prev_pos=jnp.stack([unsort(prev["px"], b.prev_pos[:, 0]),
                            unsort(prev["py"], b.prev_pos[:, 1])], axis=-1),
        prev_angle=unsort(prev["an"], b.prev_angle),
        sleep_count=unsort(consts["sleep"], b.sleep_count),
    )
    return dataclasses.replace(
        world, bodies=new_bodies, step_count=world.step_count + n_frames)


def slot_pair_keys(pidx, body_id, large_cols, n_colliders: int):
    """Canonical pair key per slot CANDIDATE [Nt, C, T] i32 (``min*M+max``).

    Depends only on the slot tables and the sort permutation — both change
    only at (amortized) rebuild time, never per frame — so rollouts compute
    this once per build and per-frame event keys reduce to one ``where``
    against ``touched`` (the XLA gathers here cost ~3.6 ms/frame at 10k if
    run per frame, measured r3)."""
    from .pallas.tiles import T, WIN

    Nt, C, _ = pidx.shape
    Mp = body_id.shape[0]
    start = jnp.clip(jnp.arange(Nt) - 1, 0, Nt - WIN)  # [Nt]
    in_win = pidx < WIN * T
    row = start[:, None, None] * T + jnp.minimum(pidx, WIN * T - 1)
    win_col = body_id[jnp.clip(row, 0, Mp - 1)]
    lrg_col = large_cols[jnp.clip(pidx - WIN * T, 0, large_cols.shape[0] - 1)]
    partner_col = jnp.where(in_win, win_col, lrg_col)
    own_row = (jnp.arange(Nt)[:, None, None] * T
               + jnp.arange(T)[None, None, :])
    own_col = body_id[jnp.broadcast_to(own_row, pidx.shape)]
    a = jnp.minimum(own_col, partner_col)
    b = jnp.maximum(own_col, partner_col)
    return a * jnp.int32(n_colliders) + b


def touch_keys(touched, pidx, body_id, large_cols, n_colliders: int,
               pair_keys=None):
    """Canonical contact-pair keys from the tile engine's touch tables
    (VERDICT r2 item 8: events on the fast paths).

    ``touched``/``pidx`` are the frame outputs [Nt, C, T]; ``pidx`` is the
    candidate-local partner index (< 3T: window tile row; >= 3T: large-set
    slot). Returns int32 keys ``min*M + max`` of the same shape, -1 where
    not touching — feed to :func:`starframe_tpu.events.key_event_masks` or
    compare as sets (a dynamic-dynamic pair appears in both rows with the
    same canonical key). Pass ``pair_keys`` (from :func:`slot_pair_keys`,
    computed once per table build) to skip the per-frame gathers."""
    if pair_keys is None:
        pair_keys = slot_pair_keys(pidx, body_id, large_cols, n_colliders)
    return jnp.where(touched > 0, pair_keys, -1)


def tiled_step(world: World, cfg: SolverConfig, gravity=None,
               interpret: bool = False, fuse: bool | None = None):
    """One frame via the tile engine. Returns (new_world, diag_dict).

    Sorts in and out every call — rollouts should use :func:`tiled_rollout`,
    which keeps state tiled and amortizes the sort.
    """
    g = world.gravity if gravity is None else gravity
    compound = world.colliders.m != world.bodies.n
    state, consts, large, body_id, large_ovf = _enter_tiles(world, cfg)
    prev = {k: state[k] for k in ("px", "py", "an")}
    jrows = (_joint_rows(world.joints, body_id, state["px"].shape[0])[0]
             if world.joints.j > 0 else None)
    new_state, consts, diag = _run_frame(state, consts, large, cfg, g,
                                         interpret=interpret, jrows=jrows,
                                         fuse=fuse, compound=compound)
    diag["large_overflow"] = large_ovf
    if compound:
        diag["owner_overflow"] = _owner_width_overflow(world, cfg)
    diag["touch_keys"] = touch_keys(diag["touched"], diag.pop("pidx"),
                                    body_id, large["cols"], world.colliders.m)
    new_world = _exit_tiles(world, new_state, consts, prev, body_id, 1)
    return new_world, diag


def _rollout_core(state, consts, large, body_id, joints, gravity,
                  *, cfg: SolverConfig, n_frames: int, n_colliders: int,
                  with_events: bool, interpret: bool,
                  shard_axis: str | None = None, compound: bool = False):
    """The tile-layout rollout build+scan, shared by :func:`tiled_rollout`
    (whole arrays, ``shard_axis=None``) and :func:`sharded_tiled_rollout`
    (shard-local arrays inside ``shard_map``; resorts/guards ride
    all-gathers and window reads ride halo exchanges — see
    ``pallas.tiles._halo_ext``). Returns ``(state, consts, body_id,
    prev_last, counters, keys)``; with ``shard_axis`` the counters are
    psum-replicated and ``joints``/``with_events`` must be absent."""
    g = gravity
    K = max(cfg.frames_per_broadphase, 1)
    Cs = -(-cfg.slot_capacity // 8) * 8
    Csol = _solve_cap(cfg)
    gmag = jnp.sqrt(jnp.sum(jnp.asarray(g, f32) ** 2))

    ak = "px" if cfg.tile_sort_axis == "x" else "py"

    from .pallas.tiles import build_tile_tables

    def build(state, consts, body_id, edges=None):
        """K-frame slot tables + the positional-guard budget (pos0, sweep).

        The sweep cap bounds slot pressure during fast phases (a falling
        body would otherwise inflate its AABB by speed x window and overflow
        its C slots); the guard simply rebuilds sooner — any cap is sound.
        ``edges`` reuses an (edge_lo, edge_hi) pair already computed for
        THIS layout (the rollout's per-frame staleness probe — recompute
        after any permutation)."""
        V = consts["vlx"].shape[1]
        if edges is None:
            edge_lo, edge_hi, _ = _edge_rows(state, consts, cfg, shard_axis)
        else:
            edge_lo, edge_hi = edges
        kc = dict(consts, edge_lo=edge_lo, edge_hi=edge_hi)
        (pidx, act, count, count_touch, count_close, winover,
         sweep) = build_tile_tables(
            {k: state[k] for k in ("px", "py", "an", "vx", "vy", "om")},
            kc, large, jnp.asarray(g, f32)[None],
            C=Cs, V=V, margin=cfg.contact_margin, dt=cfg.dt,
            sort_axis=0 if cfg.tile_sort_axis == "x" else 1,
            sweep_frames=K, sweep_slack=cfg.broadphase_speed_slack,
            # budget floor/cap trade rebuild frequency against speculative
            # slot pressure (the guard keeps ANY values sound) — tunable per
            # scene via SolverConfig (r3 sweep study in its docstring)
            sweep_floor=cfg.tile_sweep_floor, sweep_cap=cfg.tile_sweep_cap,
            shard_axis=shard_axis, interpret=interpret)
        pos0 = {"px": state["px"], "py": state["py"]}
        if cfg.sleep_velocity > 0.0:
            # sleepers don't jitter (they are frozen), so they don't need
            # the settle-jitter displacement floor — and a WOKEN body on a
            # tight budget escapes its guard within a frame or two, forcing
            # the re-sort that extends the awake prefix before it can
            # penetrate un-tabled neighbors deeply (the wake-avalanche pop
            # is bounded by this allowance)
            asleep_r = ((consts["sleep"] >= cfg.sleep_frames)
                        & (consts["invm"] > 0))
            sweep = jnp.where(asleep_r, 0.1 * consts["ext"], sweep)
        bovf = jnp.sum(jnp.maximum(count_touch - Cs, 0))
        bmarg = jnp.sum(jnp.maximum(count_close - Cs, 0))
        bspec = jnp.sum(jnp.maximum(count - Cs, 0))
        # the completeness counter is scoped to the live partition (tail
        # rows' windows are provably complete for their — frozen — contacts)
        bwovf = jnp.sum(winover * (consts["kept"] > 0))
        return (pidx, act), pos0, sweep, bovf, bmarg, bspec, bwovf

    def body(carry, _):
        (state, consts, body_id, tables, pos0, sweep, age,
         ovf, sovf, sdrp, marg, spec, wovf, jovf, resorts, rebuilds) = carry
        el, eh, stale = _edge_rows(state, consts, cfg, shard_axis)
        # scheduled re-sorts are pointless while nothing moves (a fully
        # sleeping world keeps a valid sort); the guard still forces one
        if cfg.sleep_velocity > 0.0:
            asleep = ((consts["sleep"] >= cfg.sleep_frames)
                      & (consts["invm"] > 0))
            awake = jnp.any((consts["mov"] > 0) & (consts["act"] > 0)
                            & ~asleep)
            if shard_axis is not None:  # replicate: all shards must agree
                awake = jax.lax.psum(awake.astype(i32), shard_axis) > 0
        else:
            awake = jnp.bool_(True)
        # positional staleness guard (tables superset invariant): any live
        # body whose displacement since table build — plus its coming frame
        # motion — escapes its sweep budget forces a table rebuild. A
        # rebuild does NOT need a resort: tables reference tile rows, which
        # only change when the sort permutation does — so fast phases pay
        # the (cheap) table kernel per frame, never the argsort+permute.
        if K > 1:
            disp = jnp.maximum(jnp.abs(state["px"] - pos0["px"]),
                               jnp.abs(state["py"] - pos0["py"]))
            motion = (jnp.sqrt(state["vx"] ** 2 + state["vy"] ** 2)
                      + gmag * cfg.dt) * cfg.dt
            livb = (consts["mov"] > 0) & (consts["act"] > 0)
            used = disp + motion
            esc = jnp.any((used > sweep + 1e-5) & livb)
            # drift gate for the SCHEDULED resort (measured r5: the every-K
            # resort+build+partition costs ~0.3 ms/frame on the settled 10k
            # pile while accomplishing nothing): skip it while every live
            # row has used less than half its sweep budget. Soundness is
            # untouched — a pair that could need fresher tables must MOVE
            # to need them, and movement past the budget is exactly what
            # `esc`/`stale` force. This makes the resort cadence adaptive:
            # every K frames in motion, never at rest.
            drift = jnp.any((used > 0.5 * sweep) & livb)
            if shard_axis is not None:  # replicate the rebuild decision
                esc = jax.lax.psum(esc.astype(i32), shard_axis) > 0
                drift = jax.lax.psum(drift.astype(i32), shard_axis) > 0
        else:
            esc = jnp.bool_(False)
            drift = jnp.bool_(True)
        zi = jnp.int32(0)
        # awake-prefix compaction (cfg.tile_awake_compaction): while the
        # layout is PARTITIONED, a budget escape must force a full re-sort —
        # a table rebuild alone would look at the partitioned windows, which
        # hide tail sleepers the escapee may now reach.
        compact_on = (cfg.tile_awake_compaction and cfg.sleep_velocity > 0.0
                      and shard_axis is None)
        if compact_on:
            mova = (consts["mov"] > 0) & (consts["act"] > 0)
            partitioned = jnp.any(mova & (consts["kept"] == 0))
            # an UN-partitioned layout with a sleeping mass compacts at the
            # next scheduled slot even without drift (a half-asleep world
            # must not wait for motion to start saving work); once
            # partitioned, the drift gate governs re-partitioning
            want_part = jnp.any(asleep & mova) & jnp.logical_not(partitioned)
            do_sort = (((age == 0) & awake & (drift | want_part))
                       | stale | (esc & partitioned))
        else:
            do_sort = ((age == 0) & awake & drift) | stale

        def sort_and_build(op):
            st, co, bid = op[0], op[1], op[5]
            if not compact_on:
                st, co, bid = _resort(st, co, bid, axis_key=ak,
                                      shard_axis=shard_axis)
                # an un-partitioned layout keeps everything
                co = dict(co, kept=jnp.ones_like(co["kept"]))
                el2, eh2, _ = _edge_rows(st, co, cfg, shard_axis)
                tb, pos0, sweep, bovf, bmarg, bspec, bwovf = build(
                    st, co, bid, edges=(el2, eh2))
                return (st, co, bid, tb, pos0, sweep, (el2, eh2),
                        bovf, bmarg, bspec, bwovf)
            # compacting re-sort: ONE composed permutation (x-sort then
            # stable keep-partition) and ONE table build. The keep set is
            # computed from layout-free swept boxes permuted into x-order
            # (where the 3-tile window test is exhaustive) — see
            # _keep_boxes/_partition_perm.
            Nt2, _, T2 = st["px"].shape
            Mp2 = Nt2 * T2
            act = co["act"].reshape(Mp2)
            mov = co["mov"].reshape(Mp2)
            pxf = st[ak].reshape(Mp2)
            key = jnp.where((act > 0) & (mov > 0), pxf,
                            jnp.where(act > 0, _BIG, 2 * _BIG))
            perm_x = jnp.argsort(key)
            boxes, mova, awk = _keep_boxes(st, co, cfg, g)
            ob_x = (co["obody"].reshape(Mp2)[perm_x] if compound else None)
            jedges = None
            if joints is not None:
                # joint edges in x-order rows: the keep closure must pull a
                # kept row's joint partner into the prefix (the bucket-
                # sliced joint pass addresses partner STATE by row; frozen
                # partners solve as static exactly like the full grid)
                inv_x = jnp.zeros((Mp2,), i32).at[bid[perm_x]].set(
                    jnp.arange(Mp2, dtype=i32))
                jedges = (inv_x[joints.body_a], inv_x[joints.body_b],
                          joints.active > 0)
            perm_p, kept_x = _partition_perm(
                key[perm_x], tuple(bx[perm_x] for bx in boxes),
                mova[perm_x], awk[perm_x], Nt2, T2,
                ob_x=ob_x, kc=cfg.max_colliders_per_body, jedges=jedges)
            perm = perm_x[perm_p]
            st, co, bid = _apply_perm(st, co, bid, lambda x: x[perm])
            co = dict(co, kept=kept_x[perm_p].astype(f32).reshape(
                Nt2, 1, T2))
            el2, eh2, _ = _edge_rows(st, co, cfg, shard_axis)
            tb, pos0, sweep, bovf, bmarg, bspec, bwovf = build(
                st, co, bid, edges=(el2, eh2))
            return (st, co, bid, tb, pos0, sweep, (el2, eh2),
                    bovf, bmarg, bspec, bwovf)

        def no_sort(op):
            st, co, bid = op[0], op[1], op[5]

            def rebuild(_):
                tb, pos0, sweep, bovf, bmarg, bspec, bwovf = build(
                    st, co, bid, edges=(el, eh))
                return (st, co, bid, tb, pos0, sweep, (el, eh),
                        bovf, bmarg, bspec, bwovf)

            def keep_tables(_):
                return (st, co, bid, op[2], op[3], op[4], (el, eh),
                        zi, zi, zi, zi)

            return jax.lax.cond(esc, rebuild, keep_tables, 0)

        (state, consts, body_id, tables, pos0, sweep, edges, bovf, bmarg,
         bspec, bwovf) = jax.lax.cond(
            do_sort, sort_and_build, no_sort,
            (state, consts, tables, pos0, sweep, body_id))
        ovf = jnp.maximum(ovf, bovf)
        marg = jnp.maximum(marg, bmarg)
        spec = jnp.maximum(spec, bspec)
        wovf = jnp.maximum(wovf, bwovf)
        prev = {k: state[k] for k in ("px", "py", "an")}
        # joint endpoint rows track the current sort permutation; the
        # scatter+gathers are [Mp]+[J]-sized — cheap to refresh per frame
        if joints is not None:
            jrows, jovf_f = _joint_rows(joints, body_id,
                                        state["px"].shape[0], shard_axis)
            jovf = jnp.maximum(jovf, jovf_f)
        else:
            jrows = None

        def live_frame(op):
            nlt = None
            if compact_on:
                T_ = op[0]["px"].shape[2]
                n_kept = jnp.sum((op[1]["kept"] > 0) & (op[1]["mov"] > 0)
                                 & (op[1]["act"] > 0))
                nlt = (n_kept.astype(i32) + T_ - 1) // T_
            ev = None
            if with_events:
                # canonical-id rows for the kernel's in-place key compute:
                # row -> canonical collider id (the current sort
                # permutation), large slot -> large-set collider id
                Nt_, _, T_ = op[0]["px"].shape
                ev = (body_id.astype(f32).reshape(Nt_, 1, T_),
                      large["cols"].astype(f32)[None])
            return _run_frame(op[0], op[1], large, cfg, g,
                              interpret=interpret, tables=op[2],
                              jrows=jrows, shard_axis=shard_axis,
                              n_live_t=nlt, event_ids=ev,
                              n_colliders=n_colliders, compound=compound,
                              edges=edges)

        def skip_frame(op):
            # fully-asleep world: every tile would skip anyway, but the
            # lax.cond saves the kernel dispatches + window DMA too (the
            # tile-level skip alone leaves a ~3.4 ms DMA floor at 10k)
            st, co, _ = op
            zi = jnp.int32(0)
            zf = jnp.float32(0)
            Nt2, _, T2 = st["px"].shape
            dg = dict(slot_count=jnp.zeros((Nt2, 1, T2), i32),
                      slot_overflow=zi, solve_overflow=zi,
                      solve_dropped=zi,
                      margin_dropped=zi, spec_dropped=zi,
                      window_overflow=zi,
                      max_penetration=zf,
                      touched=jnp.zeros((Nt2, Csol, T2), f32),
                      pidx=jnp.zeros((Nt2, Csol, T2), i32),
                      slot_src=jnp.zeros((Nt2, Csol, T2), i32),
                      pair_und=zf, touching_und=zf, contact_und=zf)
            if with_events:
                dg["key_sel"] = jnp.zeros((Nt2, Csol, T2), i32)
            return st, co, dg

        state, consts, diag = jax.lax.cond(
            awake, live_frame, skip_frame, (state, consts, tables))
        wovf = jnp.maximum(wovf, diag["window_overflow"])
        sovf = jnp.maximum(sovf, diag["solve_overflow"])
        sdrp = jnp.maximum(sdrp, diag["solve_dropped"])
        resorts = resorts + (do_sort & (age != 0)).astype(i32)
        rebuilds = rebuilds + (esc & ~do_sort).astype(i32)
        age = jnp.where(do_sort, 1, age + 1) % K
        out = prev
        if with_events:
            # per-frame canonical touch keys [Nt, Csol, T] (-1 = empty
            # slot): build-time pair keys, compacted IN the manifold kernel
            # alongside the solve slots (key_sel) — the previous XLA
            # take_along_axis through slot_src cost ~2.4 ms/frame at 10k
            # (measured r5); this is one fused `where`
            out = (prev, jnp.where(diag["touched"] > 0, diag["key_sel"], -1))
        return (state, consts, body_id, tables, pos0, sweep, age,
                ovf, sovf, sdrp, marg, spec, wovf, jovf, resorts,
                rebuilds), out

    zero = jnp.int32(0)
    tables0, pos00, sweep0, bovf0, bmarg0, bspec0, bwovf0 = build(
        state, consts, body_id)
    carry0 = (state, consts, body_id, tables0, pos00, sweep0,
              jnp.int32(1 % K), bovf0, zero, zero, bmarg0, bspec0, bwovf0,
              zero, zero, zero)
    (state, consts, body_id, _, _, _, _, ovf, sovf, sdrp, marg, spec,
     wovf, jovf, resorts, rebuilds), ys = jax.lax.scan(body, carry0, None,
                                                       length=n_frames)
    if with_events:
        prevs, keys = ys
    else:
        prevs, keys = ys, None
    prev_last = jax.tree.map(lambda x: x[-1], prevs)
    counters = dict(slot_overflow=ovf, solve_overflow=sovf,
                    solve_dropped=sdrp, margin_dropped=marg,
                    spec_dropped=spec, window_overflow=wovf,
                    joint_shard_overflow=jovf,
                    forced_resorts=resorts, forced_rebuilds=rebuilds,
                    # awake-prefix compaction observability: movers in the
                    # sleeping tail of the FINAL layout (0 = un-partitioned)
                    compacted_rows=jnp.sum(
                        (consts["mov"] > 0) & (consts["act"] > 0)
                        & (consts["kept"] == 0)).astype(i32))
    if shard_axis is not None:
        # per-shard maxima/sums -> one replicated scalar per counter (the
        # resort/rebuild counts are replicated already; psum would scale
        # them by the shard count, so they pass through)
        counters = {k: (v if k in ("forced_resorts", "forced_rebuilds",
                                   "joint_shard_overflow")
                        else jax.lax.psum(v, shard_axis))
                    for k, v in counters.items()}
    return state, consts, body_id, prev_last, counters, keys


def tiled_rollout(world: World, cfg: SolverConfig, n_frames: int,
                  interpret: bool = False, with_events: bool = False):
    """N frames with state kept in tile layout (one sort in, one unsort out).

    Re-sorts every ``cfg.frames_per_broadphase`` frames, or EARLIER whenever
    the staleness guard fires (some live body's swept AABB could reach x
    beyond its 3-tile window — computed from actual per-tile extrema, so it
    is valid however stale the ordering is). Returns
    ``(final_world, diag)`` with scalar counters: ``slot_overflow`` (HARD:
    touching candidates truncated at table build), ``solve_overflow``
    (HARD: a live manifold was compacted out of the per-frame solve slots —
    raise ``cfg.tile_solve_capacity``), ``margin_dropped`` /
    ``spec_dropped`` (soft: margin-imminent / swept-speculative candidates
    deferred to the next rebuild — bounded staleness), ``window_overflow``
    (residual in-kernel misses — nonzero only for vertical-slab
    configurations no x-sort can fix), ``forced_resorts``,
    ``forced_rebuilds``, ``large_overflow``.
    """
    compound = world.colliders.m != world.bodies.n
    state, consts, large, body_id, large_ovf = _enter_tiles(world, cfg)
    joints = world.joints if world.joints.j > 0 else None
    state, consts, body_id, prev_last, counters, keys = _rollout_core(
        state, consts, large, body_id, joints, world.gravity,
        cfg=cfg, n_frames=n_frames, n_colliders=world.colliders.m,
        with_events=with_events, interpret=interpret, compound=compound)
    final = _exit_tiles(world, state, consts, prev_last, body_id, n_frames)
    diag = dict(counters, large_overflow=large_ovf)
    if compound:
        # HARD counter: a sibling block wider than the owner-reduction span
        # means corrections silently missed siblings — raise
        # cfg.max_colliders_per_body (use_tiled gates this; nonzero can only
        # mean tiled_rollout was invoked directly past the gate)
        diag["owner_overflow"] = _owner_width_overflow(world, cfg)
    if with_events:
        return final, diag, keys
    return final, diag


def sharded_tiled_rollout(world: World, cfg: SolverConfig, n_frames: int,
                          mesh, axis_name: str = "tiles",
                          interpret: bool = False,
                          with_events: bool = False):
    """Tile-layout rollout with the TILE axis sharded over a device mesh —
    the scale-out path for single worlds too big for one chip (>100k
    bodies; FUTURE.md's last unsharded axis). Returns ``(final_world,
    diag)`` with the same counters as :func:`tiled_rollout` (plus the
    replicated HARD ``joint_shard_overflow``), or ``(final_world, diag,
    keys)`` with ``with_events`` — per-frame canonical touch keys
    [n_frames, Nt, Csol, T], frame axis leading, tile axis sharded.

    How the one cross-tile data dependency is satisfied: every window read
    (3-tile sort window) comes from a halo-extended local array — one edge
    tile exchanged each way per array via non-ring ``jax.lax.ppermute``
    (``pallas.tiles._halo_ext``), per substep for state and correction
    windows. Boundary tiles of the GLOBAL array see an inert zero pad
    instead of the single-device clamped window, so the window-completeness
    guard uses the uniform (t-1, t, t+1) coverage; re-sorts are global
    (all-gathered sort keys + row gathers, amortized over
    ``cfg.frames_per_broadphase``), and every resort/rebuild decision is
    psum-replicated so all shards branch together.

    Joints (r5): each joint is solved by the shard owning its first
    endpoint's row; partners are addressable through the same one-tile halo
    (corrections accumulated into halo rows are ppermuted back and summed
    before normalization — exact colored-GS, see
    ``pallas.tiles._tile_joint_pass``). A joint whose endpoints end up more
    than one tile apart in sort order is masked and counted in
    ``joint_shard_overflow``. Contact events (r5): the in-kernel key
    compute rides the same halo'd canonical-id rows as everything else.
    The tile count must divide evenly over the mesh axis; compound worlds
    are not supported (sibling blocks would need their own halo
    treatment).
    """
    from jax.sharding import PartitionSpec as P

    if world.colliders.m != world.bodies.n:
        raise NotImplementedError(
            "sharded_tiled_rollout does not support compound bodies yet "
            "(the owner shift-reduction would need a sibling-block halo)")
    state, consts, large, body_id, large_ovf = _enter_tiles(world, cfg)
    Nt = state["px"].shape[0]
    D = mesh.shape[axis_name]
    if Nt % D != 0:
        raise ValueError(
            f"tile count {Nt} does not divide over {D} '{axis_name}' shards"
            " — pad the world capacity to a multiple of "
            f"{D} * T ({D * state['px'].shape[2]}) colliders")
    body_id = body_id.reshape(Nt, -1)  # [Nt, T]: shard rows with the tiles
    joints = world.joints if world.joints.j > 0 else None

    core = functools.partial(
        _rollout_core, cfg=cfg, n_frames=n_frames,
        n_colliders=world.colliders.m, with_events=with_events,
        interpret=interpret, shard_axis=axis_name)

    def run(state_l, consts_l, large_r, body_id_l, gravity_r):
        st, co, bid, prev, counters, keys = core(
            state_l, consts_l, large_r, body_id_l.reshape(-1), joints,
            gravity_r)
        out = (st, co, bid.reshape(body_id_l.shape), prev, counters)
        if with_events:
            out = out + (keys,)
        return out

    tile_p = P(axis_name, None, None)
    state_specs = {k: tile_p for k in state}
    consts_specs = {k: tile_p for k in consts}
    large_specs = jax.tree.map(lambda _: P(), large)
    cnt_spec = dict(slot_overflow=P(), solve_overflow=P(), solve_dropped=P(),
                    margin_dropped=P(), spec_dropped=P(),
                    window_overflow=P(), joint_shard_overflow=P(),
                    forced_resorts=P(),
                    forced_rebuilds=P(), compacted_rows=P())
    prev_spec = {k: tile_p for k in ("px", "py", "an")}
    out_specs = (state_specs, consts_specs, P(axis_name, None), prev_spec,
                 cnt_spec)
    if with_events:
        out_specs = out_specs + (P(None, axis_name, None, None),)
    mapped = jax.shard_map(
        run, mesh=mesh,
        in_specs=(state_specs, consts_specs, large_specs, P(axis_name, None),
                  P()),
        out_specs=out_specs,
        check_vma=False,
    )
    gravity = jnp.asarray(world.gravity, f32)
    out = mapped(state, consts, large, body_id, gravity)
    state, consts, body_id, prev_last, counters = out[:5]
    final = _exit_tiles(world, state, consts, prev_last,
                        body_id.reshape(-1), n_frames)
    diag = dict(counters, large_overflow=large_ovf)
    if with_events:
        return final, diag, out[5]
    return final, diag
