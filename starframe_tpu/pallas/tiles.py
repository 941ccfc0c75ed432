"""Sorted-sweep tile engine: the whole-frame solver for BIG single worlds
(the 10k-body pile — the driver's primary metric, BASELINE.json:2).

The batched kernel (frame2.py) needs lane gathers from body arrays, which
cost O(source_width/128) per output register — fine at 256 bodies/world,
hopeless at 10k. This engine restores locality first: bodies are sorted by
x every frame (one small argsort + permute), cut into tiles of T=256, and
every contact partner is then either

- in the own tile's 3-tile sort window (a pair can only span more than
  ~one tile if a vertical slab of 256+ bodies separates the two — detected
  and counted as ``window_overflow``), or
- in the ``large set``: the L static colliders (ground slab, walls), which
  touch arbitrarily many bodies and are broadcast to every tile.

Three kernels over a ``(n_tiles,)`` grid, composed per frame under one jit:

1. ``setup``   (once/frame): swept AABBs, dense [3T+L, T] candidate mask,
   rank-select of C partner slots per body, manifolds at frame-start poses
   (velocity-expanded speculative margin), anchors stored body-local —
   the tiled twin of slots.py + frame2.py's frame constants. The manifold
   kernel then COMPACTS the C table slots into Cs <= C solve slots
   (config.tile_solve_capacity): manifolds are frame-frozen, so a slot
   whose manifold has no point inside the speculative margin is an exact
   zero in every substep — only pmask-active slots enter the substep loop
   (measured on the settled 10k pile: live candidates peak at 8/row while
   the K-frame tables need 16, so the 10-substep loop runs at half width).
2. ``project`` (per substep): integrate (derived), XPBD contact projection
   per solve slot, own-row Jacobi sums -> per-body corrections + lambda.
3. ``apply``   (per substep): apply count-normalized corrections, velocity
   reconstruction, restitution/friction velocity pass (partner post-apply
   state derived from the correction windows), write the new tile state.

The project/apply split makes every substep a synchronous Jacobi step: all
tiles read pre-substep state, so the math matches the XLA path's substep
(solver.substep with manifold_refresh='frame') up to summation order — the
parity test in tests/test_tiles.py holds to ~1e-4 over several frames.

Windows are expressed as three (1, T)-block input specs with clamped index
maps (no manual DMA); all cross-tile communication rides HBM between the
per-substep pallas_calls, which a ``lax.scan`` sequences inside one jit.

Requirements (gated statically in tiled.use_tiled): single world,
``colliders == bodies`` (one collider per body, ``body_idx == iota``; the
pile satisfies this), ``iterations == 1``, contact events not consumed (the
XLA path serves ``with_contacts=True``). Joints ride an XLA-side colored-GS
pass between substeps (``_tile_joint_pass``); bullets a per-substep TOI
kernel (``_ccd_kernel``) — both zero-cost when absent (static gates).
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import (
    TOUCH_SLOP,
    PairPose,
    PairVel,
    _pair_kinematics,
    manifold_batch,
    solve_contacts_b,
    velocity_contacts_b,
)
from .lanegather import lane_gather

f32 = jnp.float32
i32 = jnp.int32

T = 256  # bodies per tile (lane axis)
WIN = 3  # window tiles
L = 128  # large-set (static collider) capacity


def _win_start(t, n_tiles):
    return jnp.maximum(jnp.minimum(t - 1, n_tiles - WIN), 0)


def _window_specs(n, halo=False):
    """Three (1, T) input specs covering the tile window.

    Default (single-device) mode: rows (t-1, t, t+1) of the [n, 1, T] array,
    clamped to [0, n-3] — boundary tiles see a full 3-tile window shifted
    inward. Halo mode (``halo=True``, the tile-axis ``shard_map`` path): the
    input is a halo-extended [n_loc+2, 1, T] array (rows 0 and n_loc+1 are
    the neighbor shards' edge tiles, zero-filled at the global ends), the
    window is uniformly rows (t, t+1, t+2) of that array, and the own tile
    always sits at window offset 1."""

    def mk(off):
        def imap(t):
            if halo:
                return (t + off, 0, 0)
            # NOTE: jnp.clip is jit-wrapped and Mosaic rejects nested jits in
            # index maps — use bare maximum/minimum
            return (jnp.maximum(jnp.minimum(t - 1, n - WIN), 0) + off, 0, 0)

        return pl.BlockSpec((1, 1, T), imap, memory_space=pltpu.VMEM)

    return [mk(0), mk(1), mk(2)]


def _own_spec():
    # [Nt, 1, T] arrays: the middle singleton satisfies Mosaic's block rule
    # (2nd-to-last block dim must equal the array dim)
    return pl.BlockSpec((1, 1, T), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)


def _own3(k):
    return pl.BlockSpec((1, k, T), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)


def _bcast(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda t: (0,) * nd, memory_space=pltpu.VMEM)


def _concat_window(rows, large=None):
    """3 x [1, T] window rows (+ optional [1, L] large row) -> [1, 3T(+L)]."""
    parts = [r for r in rows]
    if large is not None:
        parts.append(large)
    return jnp.concatenate(parts, axis=-1)



def _lg(src, idx):
    """lane_gather for [1, S] rows: Mosaic's in-vreg gather lowering rejects
    single-sublane operands, so broadcast to a full 8-sublane tile (same
    silicon cost — thin rows pad to 8 sublanes regardless) and keep row 0."""
    out = lane_gather(jnp.broadcast_to(src, (8, src.shape[-1])),
                      jnp.broadcast_to(idx, (8, idx.shape[-1])))
    return out[:1]


SG = 8  # slots per sublane group: the per-slot solver math runs [SG, T]


def _lg8(src, idx8):
    """Slot-group gather: 8 slots' partner indices on sublanes share ONE
    in-vreg gather from the broadcast [8, S] source — the 8x vector-
    efficiency lever over the old per-slot [1, T] rows (FUTURE.md item 2:
    every row op here used 1 of 8 sublanes)."""
    return lane_gather(jnp.broadcast_to(src, (SG, src.shape[-1])), idx8)


def _own_lane_slice(x, w):
    """Select the own tile's T lanes out of a [1, WIN*T(+L)] row by the
    scalar window offset w in {0, 1, 2} — static slices + scalar selects
    (Mosaic has no dynamic_slice lowering for arrays)."""
    s0 = x[:, :T]
    s1 = x[:, T:2 * T]
    s2 = x[:, 2 * T:3 * T]
    return jnp.where(w == 0, s0, jnp.where(w == 1, s1, s2))


# ===========================================================================
# kernel 1a: slot tables (candidate mask + rank-select) — amortizable over
# K frames with inflated sweeps (tiled.py's rollout carries the result and
# rebuilds on resort / positional escape)
# ===========================================================================


def _tables_kernel(
    # window state [1, T] x3 each
    px0, px1, px2, py0, py1, py2, an0, an1, an2,
    vx0, vx1, vx2, vy0, vy1, vy2, om0, om1, om2,
    # window collider consts
    vlx_w0, vlx_w1, vlx_w2, vly_w0, vly_w1, vly_w2,  # [1, V, T] x3
    rad0, rad1, rad2, nv0, nv1, nv2,
    act0, act1, act2, mov0, mov1, mov2,
    lay0, lay1, lay2, msk0, msk1, msk2,
    ob0, ob1, ob2,  # canonical owner-body ids (compound sibling exclusion)
    # own row extras
    o_responds, o_sensor,
    # large set (broadcast)
    l_px, l_py, l_an, l_vlx, l_vly, l_rad, l_nv, l_act, l_lay, l_msk,
    # rows
    edge_lo, edge_hi,  # [n_tiles, 1] window sort-axis bounds rows (own spec)
    grav_r,  # [1, 2]
    # outputs
    pidx_o, act_o, count_o, cntt_o, cntc_o, winover_o, sweep_o,
    *, C: int, V: int, margin: float, dt: float, n_tiles: int,
    sort_axis: int, sweep_frames: int, sweep_slack: float, sweep_cap: float,
    sweep_floor: float, halo: bool = False,
):
    """Candidate slot tables, valid while every body stays within its sweep
    budget (``sweep_o``, in position units). With ``sweep_frames = K > 1``
    the sweep is a symmetric SPEED-magnitude inflation (contact impulses
    rotate velocity between components, so per-axis signed sweeps would be
    invalidated by every bounce) capped at ``sweep_cap`` — any sweep is
    SOUND because the rollout's positional guard forces a rebuild the
    moment a body's displacement (plus its coming frame motion) escapes the
    budget; the cap only trades rebuild frequency against slot pressure."""
    t = pl.program_id(0)
    own = 1 if halo else t - _win_start(t, n_tiles)

    def win(a, b, c):
        return _concat_window([a[0], b[0], c[0]])

    # ---- candidate row: window (3T) + large (L) on the lane axis ----------
    def wl(w3, lg):  # [1, 3T] + [1, L] -> [1, 3T+L]
        return jnp.concatenate([w3, lg[:]], axis=-1)

    c_px = wl(win(px0, px1, px2), l_px)
    c_py = wl(win(py0, py1, py2), l_py)
    c_an = wl(win(an0, an1, an2), l_an)
    c_vx = wl(win(vx0, vx1, vx2), jnp.zeros_like(l_px[:]))
    c_vy = wl(win(vy0, vy1, vy2), jnp.zeros_like(l_px[:]))
    c_rad = wl(win(rad0, rad1, rad2), l_rad)
    c_nv = wl(win(nv0, nv1, nv2), l_nv)
    c_act = wl(win(act0, act1, act2), l_act)
    # window candidates must MOVE (statics ride the large channel only —
    # that is what prevents double-counting them)
    c_part = wl(win(mov0, mov1, mov2), l_act)
    c_lay = wl(win(lay0, lay1, lay2), l_lay)
    c_msk = wl(win(msk0, msk1, msk2), l_msk)

    def winv(a, b, c):  # verts are pre-sliced [1, T] arrays, not refs
        return jnp.concatenate([a, b, c], axis=-1)

    c_vlx = [wl(winv(vlx_w0[:, v], vlx_w1[:, v], vlx_w2[:, v]), l_vlx[:, v])
             for v in range(V)]
    c_vly = [wl(winv(vly_w0[:, v], vly_w1[:, v], vly_w2[:, v]), l_vly[:, v])
             for v in range(V)]

    S = WIN * T + L
    c_ca = jnp.cos(c_an)
    c_sa = jnp.sin(c_an)

    # candidate AABBs (lane form [1, S])
    lox = hix = loy = hiy = ext = None
    for v in range(V):
        wx = c_px + c_ca * c_vlx[v] - c_sa * c_vly[v]
        wy = c_py + c_sa * c_vlx[v] + c_ca * c_vly[v]
        lox = wx if lox is None else jnp.minimum(lox, wx)
        hix = wx if hix is None else jnp.maximum(hix, wx)
        loy = wy if loy is None else jnp.minimum(loy, wy)
        hiy = wy if hiy is None else jnp.maximum(hiy, wy)
        d = jnp.sqrt(c_vlx[v] ** 2 + c_vly[v] ** 2)
        ext = d if ext is None else jnp.maximum(ext, d)
    ext = ext + c_rad
    pad = c_rad + 0.5 * margin
    if sweep_frames > 1:
        # K-frame symmetric magnitude sweep, capped at sweep_cap body
        # extents (a fast faller would otherwise blow its slot capacity);
        # statics sweep nothing. The budget is a HEURISTIC, not a bound —
        # the rollout's positional guard rebuilds the moment a body leaves
        # it, so any value is sound; it only trades rebuild frequency
        # against slot pressure. Gravity headroom is ONE frame's worth
        # (g*dt), not the window's: in a dense pile a g*K*dt allowance
        # inflates every settled body's AABB into its second neighbor ring
        # and doubles candidate counts; a body that genuinely free-falls
        # escapes the small budget and triggers a rebuild instead.
        gx = grav_r[0, 0]
        gy = grav_r[0, 1]
        gmag = jnp.sqrt(gx * gx + gy * gy)
        spd = jnp.sqrt(c_vx * c_vx + c_vy * c_vy)
        kdt = sweep_frames * dt
        # quarter-extent displacement floor: settled bodies' speeds GROW
        # between builds (impulse jitter), and a pure speed-based budget
        # makes the any-body escape guard fire constantly at settle
        sw = jnp.minimum((spd + gmag * dt + sweep_slack) * kdt
                         + sweep_floor * ext,
                         sweep_cap * ext) * (c_part > 0)
        swx = swy = sw
    else:
        swx = jnp.abs(c_vx) * dt
        swy = jnp.abs(c_vy) * dt
    # touch boxes: shape AABBs + jitter slop — overlapping candidates are
    # touching/penetrating NOW (dropping one is the hard overflow); close
    # boxes add the speculative contact margin (imminent); swept boxes add
    # the K-frame sweep (speculative). Ranked in that order (graceful
    # overflow: most-speculative candidates drop first).
    tpad = c_rad + 0.1 * margin
    tlox = lox - tpad
    thix = hix + tpad
    tloy = loy - tpad
    thiy = hiy + tpad
    clox = lox - pad
    chix = hix + pad
    cloy = loy - pad
    chiy = hiy + pad
    lox = clox - swx
    hix = chix + swx
    loy = cloy - swy
    hiy = chiy + swy

    own_slice = lambda x: _own_lane_slice(x, own)
    o_lox = own_slice(lox)
    o_hix = own_slice(hix)
    o_loy = own_slice(loy)
    o_hiy = own_slice(hiy)
    o_clox = own_slice(clox)
    o_chix = own_slice(chix)
    o_cloy = own_slice(cloy)
    o_chiy = own_slice(chiy)
    o_tlox = own_slice(tlox)
    o_thix = own_slice(thix)
    o_tloy = own_slice(tloy)
    o_thiy = own_slice(thiy)
    o_lay = own_slice(c_lay)
    o_msk = own_slice(c_msk)
    # per-body position budget the tables stay valid for (window rows only).
    # CLAMPED to the room the window's sort-axis coverage actually offers
    # (r5): a fast row whose swept box would poke past the coverage edge
    # gets a tighter budget instead of a silent speculative miss — the
    # positional guard then rebuilds exactly when the covered horizon is
    # exhausted. Only a row whose MARGIN (close) box itself escapes
    # coverage is a real window miss (counted below); that shape no budget
    # can fix — only a re-sort (the stale flag) or denser tiling.
    if sort_axis == 0:
        _c_lo, _c_hi = o_clox, o_chix
    else:
        _c_lo, _c_hi = o_cloy, o_chiy
    avail = jnp.minimum(edge_hi[0] - _c_hi, _c_lo - edge_lo[0])
    sweep_o[0] = jnp.minimum(own_slice(swx), jnp.maximum(avail, 0.0))

    # ---- dense candidate mask [S, T]: candidate j (sublanes) x own i ------
    def as_j(x):  # [1, S] -> [S, 1]
        return jnp.swapaxes(x, 0, 1)

    ov = (
        (as_j(lox) <= o_hix) & (o_lox <= as_j(hix))
        & (as_j(loy) <= o_hiy) & (o_loy <= as_j(hiy))
    )
    ov_close = (
        (as_j(clox) <= o_chix) & (o_clox <= as_j(chix))
        & (as_j(cloy) <= o_chiy) & (o_cloy <= as_j(chiy))
    )
    ov_touch = (
        (as_j(tlox) <= o_thix) & (o_tlox <= as_j(thix))
        & (as_j(tloy) <= o_thiy) & (o_tloy <= as_j(thiy))
    )
    # WINDOW-LOCAL ids: a body appears exactly once in the window, at the
    # same window position for both the own and candidate views, so local
    # ids identify "same collider" exactly (and stay valid in halo mode,
    # where the kernel has no global tile index)
    own_gid = own * T + jax.lax.broadcasted_iota(i32, (1, T), 1)
    win_gid = jax.lax.broadcasted_iota(i32, (1, WIN * T), 1)
    # large ids offset past the window so they never collide with window ids
    lrg_gid = WIN * T + jax.lax.broadcasted_iota(i32, (1, L), 1)
    c_gid = jnp.concatenate([win_gid, lrg_gid], axis=-1)
    diff = as_j(c_gid) != own_gid
    # sibling exclusion: colliders of the SAME body never pair (rigid
    # compounds; for one-collider bodies this reduces to the self check).
    # Large lanes carry owner -1 (statics ride the large channel and the
    # window owner ids are >= 0).
    c_ob = wl(win(ob0, ob1, ob2).astype(i32), jnp.full((1, L), -1, i32))
    diff = diff & (as_j(c_ob) != own_slice(c_ob))
    layer_ok = (
        ((o_msk >> as_j(c_lay)) & 1) & ((as_j(c_msk) >> o_lay) & 1)
    ) != 0
    # rows: responding colliders, plus MOVING sensors (a static sensor's
    # touches are recorded from its dynamic partners' rows instead)
    o_moves = own_slice(c_part)
    row_ok = (o_responds[0] > 0) | ((o_sensor[0] > 0) & (o_moves > 0))
    elig = (as_j(c_part) > 0) & (as_j(c_act) > 0) & row_ok
    mask = (ov & diff & layer_ok & elig).astype(f32)

    # window-miss detection: a row whose MARGIN box reaches past the
    # window's sort-axis coverage may have imminent partners we cannot see
    # — count it (SURVEY.md §4.6). Pure speculative (sweep-budget) escapes
    # are NOT misses anymore: the budget clamp above converts them into
    # earlier guard rebuilds. sort_axis: 0 = tiles cut by x, 1 = by y.
    winover = ((_c_lo < edge_lo[0]) | (_c_hi > edge_hi[0])).astype(i32)
    winover_o[0] = winover * (o_responds[0] > 0).astype(i32)

    # ---- rank-select C partners per own body (touch, close, then swept) ---
    mask_touch = ov_touch.astype(f32) * mask
    mask_close = ov_close.astype(f32) * mask
    mask_mid = mask_close - mask_touch
    mask_far = mask - mask_close
    jj = jax.lax.broadcasted_iota(i32, (S, S), 0)
    kk = jax.lax.broadcasted_iota(i32, (S, S), 1)
    # (measured: bf16 operands here are SLOWER — the f32->bf16 relayouts
    # cost more than the MXU saves at [S, S] x [S, T] scale)
    lt = (kk < jj).astype(f32)

    def rank_of(m):
        return jax.lax.dot_general(lt, m, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # [S, T]

    rank_t = rank_of(mask_touch)
    rank_m = rank_of(mask_mid)
    rank_f = rank_of(mask_far)
    cnt_t = jnp.sum(mask_touch, axis=0, keepdims=True)  # [1, T]
    cnt_m = jnp.sum(mask_mid, axis=0, keepdims=True)
    crank = jnp.where(mask_touch > 0, rank_t,
                      jnp.where(mask_mid > 0, cnt_t + rank_m,
                                cnt_t + cnt_m + rank_f))
    j_iota = jax.lax.broadcasted_iota(i32, (S, T), 0).astype(f32)
    pidx, acts = [], []
    for c in range(C):
        oh = jnp.where(crank == float(c), mask, 0.0)
        pidx.append(jnp.sum(oh * j_iota, axis=0, keepdims=True))  # [1, T]
        acts.append(jnp.sum(oh, axis=0, keepdims=True))
    count_o[0] = jnp.sum(mask, axis=0, keepdims=True).astype(i32)
    # touch candidates = live contacts: the HARD overflow signal. Margin-
    # close or swept candidates dropped beyond C are bounded staleness (the
    # positional guard / scheduled rebuild re-admits them, close-first)
    cntt_o[0] = cnt_t.astype(i32)
    cntc_o[0] = jnp.sum(mask_close, axis=0, keepdims=True).astype(i32)
    pidx_o[:] = jnp.concatenate(pidx, axis=0)[None].astype(i32)  # [1, C, T]
    act_o[:] = jnp.concatenate(acts, axis=0)[None]


# ===========================================================================
# kernel 1b: per-frame manifolds + anchors at current poses (consumes the
# slot tables; runs every frame)
# ===========================================================================


def _manifold_kernel(
    # window state [1, T] x3 each
    px0, px1, px2, py0, py1, py2, an0, an1, an2,
    vx0, vx1, vx2, vy0, vy1, vy2, om0, om1, om2,
    # window collider consts
    vlx_w0, vlx_w1, vlx_w2, vly_w0, vly_w1, vly_w2,  # [1, V, T] x3
    rad0, rad1, rad2, nv0, nv1, nv2, fric0, fric1, fric2,
    rst0, rst1, rst2, sen0, sen1, sen2,
    invm0, invm1, invm2, invi0, invi1, invi2,
    # own row extras
    o_sensor,
    # large set (broadcast): pose frozen for the frame
    l_px, l_py, l_an, l_vlx, l_vly, l_rad, l_nv, l_fric, l_rst, l_sen,
    # tables + gating
    pidx_r, act_r,  # [1, C, T]
    tile_live,  # [n_tiles, 1, T] 0/1: any awake body in this tile's window
    *rest,
    C: int, Cs: int, V: int, margin: float, dt: float, n_tiles: int,
    sleep_velocity: float, halo: bool = False, with_keys: bool = False,
    n_colliders: int = 0,
):
    """Per-frame manifolds + anchors for the C-slot tables, COMPACTED into
    Cs <= C solve slots: with frame-frozen manifolds, a candidate with no
    manifold point inside the speculative margin (pmask all-zero) is an
    exact zero in every substep's projection and velocity pass, so only
    pmask-active candidates are rank-selected (in table order, i.e.
    touch > margin-close > speculative) into the Cs slots the per-substep
    kernels actually iterate. ``nact_o`` counts active candidates per body;
    rows with nact > Cs dropped their most-speculative active manifolds —
    the caller surfaces that as the HARD ``solve_overflow`` counter.

    ``with_keys``: four extra inputs (``cid0/1/2`` window rows of canonical
    collider ids as f32 — ids are < 2^24, exact — and ``l_cid`` [1, L] for
    the large set) and one extra output (``keyc_o`` [1, Cs, T] i32 —
    canonical pair keys ``min*n_colliders+max`` computed from the slot
    gathers and selected through the same compaction ranking as ``src_o``).
    Per-frame contact-event keys then need NO XLA work at all — neither the
    old per-build ``slot_pair_keys`` gathers nor the per-frame
    ``take_along_axis`` through ``slot_src`` (VERDICT r4 weak #2: those two
    cost ~2.4 ms/frame at 10k between them)."""
    if with_keys:
        cid0, cid1, cid2, l_cid = rest[:4]
        (cc_o, c2_o, pidxc_o, src_o, nact_o, wake_o, pen_o, npts_o,
         keyc_o) = rest[4:]
    else:
        cid0 = cid1 = cid2 = l_cid = keyc_o = None
        cc_o, c2_o, pidxc_o, src_o, nact_o, wake_o, pen_o, npts_o = rest
    t = pl.program_id(0)
    own = 1 if halo else t - _win_start(t, n_tiles)
    live = jnp.max(tile_live[0]) > 0.0

    # skipped (all-asleep-window) tiles: zero outputs, no compute — the
    # island-granular work saving (SURVEY.md §2 row 11); sleeping tiles'
    # bodies are frozen so their manifolds would be unused anyway
    cc_o[:] = jnp.zeros_like(cc_o)
    c2_o[:] = jnp.zeros_like(c2_o)
    pidxc_o[:] = jnp.zeros_like(pidxc_o)
    src_o[:] = jnp.zeros_like(src_o)
    nact_o[:] = jnp.zeros_like(nact_o)
    wake_o[0] = jnp.zeros((1, T), f32)
    pen_o[0] = jnp.zeros((1, T), f32)
    npts_o[0] = jnp.zeros((1, T), f32)
    if with_keys:
        keyc_o[:] = jnp.zeros_like(keyc_o)

    @pl.when(live)
    def _manifold_body():
        def win(a, b, c):
            return _concat_window([a[0], b[0], c[0]])

        def wl(w3, lg):  # [1, 3T] + [1, L] -> [1, 3T+L]
            return jnp.concatenate([w3, lg[:]], axis=-1)

        c_px = wl(win(px0, px1, px2), l_px)
        c_py = wl(win(py0, py1, py2), l_py)
        c_an = wl(win(an0, an1, an2), l_an)
        c_vx = wl(win(vx0, vx1, vx2), jnp.zeros_like(l_px[:]))
        c_vy = wl(win(vy0, vy1, vy2), jnp.zeros_like(l_px[:]))
        c_om = wl(win(om0, om1, om2), jnp.zeros_like(l_px[:]))
        c_rad = wl(win(rad0, rad1, rad2), l_rad)
        c_nv = wl(win(nv0, nv1, nv2), l_nv)
        c_fric = wl(win(fric0, fric1, fric2), l_fric)
        c_rst = wl(win(rst0, rst1, rst2), l_rst)
        c_sen = wl(win(sen0, sen1, sen2), l_sen)
        c_invm = wl(win(invm0, invm1, invm2), jnp.zeros_like(l_px[:]))
        c_invi = wl(win(invi0, invi1, invi2), jnp.zeros_like(l_px[:]))

        def winv(a, b, c):
            return jnp.concatenate([a, b, c], axis=-1)

        c_vlx = [wl(winv(vlx_w0[:, v], vlx_w1[:, v], vlx_w2[:, v]), l_vlx[:, v])
                 for v in range(V)]
        c_vly = [wl(winv(vly_w0[:, v], vly_w1[:, v], vly_w2[:, v]), l_vly[:, v])
                 for v in range(V)]

        c_ca = jnp.cos(c_an)
        c_sa = jnp.sin(c_an)
        ext = None
        for v in range(V):
            d = jnp.sqrt(c_vlx[v] ** 2 + c_vly[v] ** 2)
            ext = d if ext is None else jnp.maximum(ext, d)
        ext = ext + c_rad
        c_spd = jnp.sqrt(c_vx**2 + c_vy**2) + jnp.abs(c_om) * ext

        own_slice = lambda x: _own_lane_slice(x, own)
        o_px = own_slice(c_px)
        o_py = own_slice(c_py)
        o_ca = own_slice(c_ca)
        o_sa = own_slice(c_sa)
        o_spd = own_slice(c_spd)
        o_rad = own_slice(c_rad)
        o_nv = own_slice(c_nv)
        o_fric = own_slice(c_fric)
        o_rst = own_slice(c_rst)
        o_sen2 = o_sensor[0]
        o_vlx = [own_slice(v) for v in c_vlx]
        o_vly = [own_slice(v) for v in c_vly]
        own_wx = [o_px + o_ca * o_vlx[v] - o_sa * o_vly[v] for v in range(V)]
        own_wy = [o_py + o_sa * o_vlx[v] + o_ca * o_vly[v] for v in range(V)]
        wvax = jnp.stack(own_wx)  # [V, 1, T]
        wvay = jnp.stack(own_wy)

        # per-slot manifolds, vectorized over SG-slot sublane groups: each group
        # processes 8 slots as [SG, T] (one gather / one manifold batch for all 8)
        pidx_all = pidx_r[0].astype(f32)  # [C, T]
        acts_all = act_r[0]
        cc_k = [[] for _ in range(KC)]  # per-quantity group lists -> [C, T]
        c2_q = [[] for _ in range(K2)]  # (quantity, point)-major
        # partner squared speed (lin + ang), the wake-on-fast-contact signal
        # (mirrors step._sleep_branches: touching a partner with
        # spd^2 >= sleep_velocity^2 resets the own sleep counter)
        c_spd2 = c_vx * c_vx + c_vy * c_vy + c_om * c_om
        wake_acc = jnp.zeros((1, T), f32)
        pen_acc = jnp.zeros((1, T), f32)
        npts_acc = jnp.zeros((1, T), f32)
        act_groups = []  # per group [SG, T]: any manifold point in-margin
        sep_groups = []  # per group [SG, T]: min separation over in-margin
        hard_groups = []  # per group [SG, T]: min sep < margin (imminent)
        key_groups = []  # with_keys: per group [SG, T] i32 canonical keys
        if with_keys:
            c_cid = wl(win(cid0, cid1, cid2), l_cid)
            own_cid = own_slice(c_cid)
        for gi in range(C // SG):
            pc = pidx_all[gi * SG:(gi + 1) * SG].astype(i32)  # [SG, T]
            act = acts_all[gi * SG:(gi + 1) * SG]

            def g(src):
                return _lg8(src, pc)

            p_px = g(c_px)
            p_py = g(c_py)
            p_ca = g(c_ca)
            p_sa = g(c_sa)
            pvx = [g(v) for v in c_vlx]
            pvy = [g(v) for v in c_vly]
            wvbx = jnp.stack([p_px + p_ca * pvx[v] - p_sa * pvy[v]
                              for v in range(V)])  # [V, SG, T]
            wvby = jnp.stack([p_py + p_sa * pvx[v] + p_ca * pvy[v]
                              for v in range(V)])
            margin_eff = margin + dt * (o_spd + g(c_spd))
            # own side stays [*, 1, T] and broadcasts against the [*, SG, T]
            # partner group inside the manifold math
            m = manifold_batch(wvax, wvay, o_nv, o_rad,
                               wvbx, wvby, g(c_nv), g(c_rad), margin_eff)
            dxa = m.wa_x - o_px
            dya = m.wa_y - o_py
            a_ax = o_ca * dxa + o_sa * dya  # [2, SG, T]
            a_ay = -o_sa * dxa + o_ca * dya
            dxb = m.wb_x - p_px
            dyb = m.wb_y - p_py
            b_ax = p_ca * dxb + p_sa * dyb
            b_ay = -p_sa * dxb + p_ca * dyb
            n_ax = o_ca * m.n_x + o_sa * m.n_y  # [SG, T]
            n_ay = -o_sa * m.n_x + o_ca * m.n_y
            pmask = m.pmask * act
            if with_keys:
                p_cid = g(c_cid)
                a_k = jnp.minimum(own_cid, p_cid).astype(i32)
                b_k = jnp.maximum(own_cid, p_cid).astype(i32)
                key_groups.append(a_k * n_colliders + b_k)
            act_groups.append(
                (jnp.maximum(pmask[0], pmask[1]) > 0.0).astype(f32))
            minsep = jnp.min(jnp.where(pmask > 0.0, m.sep, 1e30), axis=0)
            sep_groups.append(minsep)  # [SG, T]
            hard_groups.append((minsep < margin).astype(f32))
            solvable = act * (1.0 - jnp.maximum(o_sen2, g(c_sen)))
            p_invm = g(c_invm)
            for k, v in enumerate([
                pc.astype(f32), act, n_ax, n_ay,
                jnp.sqrt(o_fric * g(c_fric)),
                jnp.maximum(o_rst, g(c_rst)),
                p_invm, g(c_invi), (p_invm > 0).astype(f32),  # p_dyn
            ]):
                cc_k[k].append(v)
            for q, v2 in enumerate([a_ax, a_ay, b_ax, b_ay,
                                    pmask * solvable, pmask, m.sep]):
                c2_q[2 * q].append(v2[0])
                c2_q[2 * q + 1].append(v2[1])
            pen_acc = jnp.maximum(pen_acc, jnp.max(
                jnp.max(jnp.maximum(-m.sep, 0.0) * pmask, axis=0),
                axis=0, keepdims=True))
            # undirected manifold-point count (cross-tier Diagnostics
            # parity, VERDICT r3 item 8): dyn-dyn pairs appear in both rows
            # (weight 0.5); large-set partners only in this row (weight 1)
            pt_w = jnp.where(pc < WIN * T, 0.5, 1.0)
            npts_acc = npts_acc + jnp.sum(
                jnp.sum(pmask, axis=0) * pt_w, axis=0, keepdims=True)
            if sleep_velocity > 0.0:
                # wake on a fast DYNAMIC partner inside the speculative
                # margin (pmask): manifolds are frame-start snapshots, and a
                # bouncing impactor is "touching" only mid-frame — waking on
                # imminent contact instead means the sleeper participates in
                # the impact rather than being frozen through it. p_invm is
                # the effective inverse mass, so sleepers can't chain-wake.
                prox = jnp.max(pmask, axis=0)  # [SG, T]
                fast = ((g(c_spd2) >= sleep_velocity * sleep_velocity)
                        & (p_invm > 0)).astype(f32)
                wake_acc = jnp.maximum(
                    wake_acc,
                    jnp.max(prox * fast, axis=0, keepdims=True))
        wake_o[0] = wake_acc
        pen_o[0] = pen_acc
        npts_o[0] = npts_acc
        act_m = jnp.concatenate(act_groups, axis=0)  # [C, T]
        hard_m = jnp.concatenate(hard_groups, axis=0)  # [C, T]
        # row 0: pmask-active candidates; row 1: imminent (sep < margin).
        # Compaction keeps closest-first, so a hard drop happens iff
        # row 1 > Cs (solve_overflow); row 0 > Cs alone only drops
        # fast-approach speculatives re-admitted NEXT FRAME (soft).
        nact_o[0] = jnp.concatenate(
            [jnp.sum(act_m, axis=0, keepdims=True),
             jnp.sum(hard_m, axis=0, keepdims=True)], axis=0).astype(i32)
        if Cs >= C:
            # no compaction: k-major layouts, row k*C + slot (group slices
            # stay 8-aligned); solve slots = table slots
            cc_o[:] = jnp.stack([jnp.concatenate(r, axis=0) for r in cc_k]
                                )[None].reshape(1, KC * C, T)
            c2_o[:] = jnp.stack([jnp.concatenate(r, axis=0) for r in c2_q]
                                )[None].reshape(1, K2 * C, T)
            pidxc_o[:] = pidx_r[:]
            src_o[:] = jax.lax.broadcasted_iota(i32, (1, C, T), 1)
            if with_keys:
                keyc_o[:] = jnp.concatenate(key_groups, axis=0)[None]
        else:
            # rank the pmask-active candidates by CURRENT min separation
            # (closest first; inactive rank last) and select the first Cs
            # into the solve slots the per-substep kernels iterate. Ranking
            # by live sep — not build-time tier — keeps every penetrating/
            # imminent manifold ahead of fast-approach speculatives.
            full_cc = [jnp.concatenate(r, axis=0) for r in cc_k]  # [C, T]
            full_c2 = [jnp.concatenate(r, axis=0) for r in c2_q]
            key_m = (jnp.concatenate(key_groups, axis=0) if with_keys
                     else None)  # [C, T] i32
            sep_m = jnp.concatenate(sep_groups, axis=0)  # [C, T]
            key = jnp.where(act_m > 0, sep_m, 1e30)
            rank = jnp.zeros_like(key)
            for k in range(C):
                kr = key[k:k + 1]  # [1, T]
                before = jnp.where(
                    (kr < key)
                    | ((kr == key)
                       & (k < jax.lax.broadcasted_iota(i32, (C, T), 0))),
                    1.0, 0.0)
                rank = rank + before  # rank[j] = #slots preceding j
            slot_iota = jax.lax.broadcasted_iota(
                i32, (C, T), 0).astype(f32)
            sel_cc = [[] for _ in range(KC)]
            sel_c2 = [[] for _ in range(K2)]
            sel_src = []
            sel_key = []
            for c in range(Cs):
                oh = jnp.where((rank == float(c)) & (act_m > 0), 1.0, 0.0)
                for k in range(KC):
                    sel_cc[k].append(jnp.sum(oh * full_cc[k], axis=0,
                                             keepdims=True))
                for q in range(K2):
                    sel_c2[q].append(jnp.sum(oh * full_c2[q], axis=0,
                                             keepdims=True))
                sel_src.append(jnp.sum(oh * slot_iota, axis=0,
                                       keepdims=True))
                if with_keys:
                    # integer one-hot select: keys exceed f32's exact-int
                    # range (a*M+b at M=10k), so sum in i32
                    sel_key.append(jnp.sum(
                        jnp.where(oh > 0, key_m, 0), axis=0,
                        keepdims=True))
            cc_o[:] = jnp.concatenate(
                [jnp.concatenate(r, axis=0) for r in sel_cc], axis=0
            )[None]  # [1, KC*Cs, T]
            c2_o[:] = jnp.concatenate(
                [jnp.concatenate(r, axis=0) for r in sel_c2], axis=0)[None]
            # partner indices ride cc row 0 (pc as f32, exact below 2^24)
            pidxc_o[:] = jnp.concatenate(sel_cc[0], axis=0)[None].astype(i32)
            src_o[:] = jnp.concatenate(sel_src, axis=0)[None].astype(i32)
            if with_keys:
                keyc_o[:] = jnp.concatenate(sel_key, axis=0)[None]



KC = 9  # per-slot scalar constants (see cc_k above)
K2 = 14  # per-slot two-point constants (7 quantities x 2 points, see c2_q)


def _unpack_group(cc, c2, gi, C):
    """Rebuild one SG-slot group's namespaces for kernels 2/3 — every leaf
    is [SG, T] (or [2, SG, T] for two-point quantities). cc: [1, KC*C, T]
    k-major; c2: [1, K2*C, T] (quantity, point)-major."""
    lo = gi * SG

    def row(k):
        return cc[0, k * C + lo:k * C + lo + SG]  # [SG, T]

    def r2(q):
        return jnp.stack([c2[0, (2 * q) * C + lo:(2 * q) * C + lo + SG],
                          c2[0, (2 * q + 1) * C + lo:(2 * q + 1) * C + lo + SG]])

    pd = SimpleNamespace(
        friction=row(4), restitution=row(5),
        inv_mass_a=None, inv_mass_b=row(6),
        inv_inertia_a=None, inv_inertia_b=row(7),
    )
    cb = SimpleNamespace(
        n_ax=row(2), n_ay=row(3),
        a_ax=r2(0), a_ay=r2(1), b_ax=r2(2), b_ay=r2(3),
        solve_mask=r2(4), pmask=r2(5), sep=r2(6),
    )
    return SimpleNamespace(pc=row(0).astype(i32), act=row(1), p_dyn=row(8),
                           pd=pd, cb=cb)


# ===========================================================================
# kernel 1c: per-substep CCD TOI factors (only built when cfg.ccd) — the
# tile twin of kernels.bullet_advance_scale: each body's integrated advance
# factor f in [0, 1], computed from ITS OWN slot rows (dyn-dyn pairs appear
# in both rows, so each side clamps itself; statics ride the large channel
# and never move). project/apply then integrate own AND partner poses with
# the same f field, keeping the synchronous-Jacobi derivation consistent.
# ===========================================================================


def _ccd_kernel(
    px0r, px1r, px2r, py0r, py1r, py2r, an0, an1, an2,
    vx0, vx1, vx2, vy0, vy1, vy2, om0, om1, om2,
    o_dynb, o_blt,
    l_px, l_py, l_an,
    pidx_r, cc_r, c2_r, grav_r, tile_live,
    f_o,
    *, C: int, h: float, ccd_slop: float, n_tiles: int, halo: bool = False,
):
    t = pl.program_id(0)
    own = 1 if halo else t - _win_start(t, n_tiles)
    live = jnp.max(tile_live[0]) > 0.0

    f_o[0] = jnp.ones((1, T), f32)

    @pl.when(live & (jnp.max(o_blt[0]) > 0.0))
    def _ccd_body():
        def wl(a, b, c, lg):
            return jnp.concatenate([a[0], b[0], c[0], lg], axis=-1)

        zl = jnp.zeros_like(l_px[:])
        c_px = wl(px0r, px1r, px2r, l_px[:])
        c_py = wl(py0r, py1r, py2r, l_py[:])
        c_an = wl(an0, an1, an2, l_an[:])
        c_vx = wl(vx0, vx1, vx2, zl)
        c_vy = wl(vy0, vy1, vy2, zl)
        c_om = wl(om0, om1, om2, zl)
        f_o[0] = _ccd_math(
            c_px, c_py, c_an, c_vx, c_vy, c_om, own,
            o_dynb[0], o_blt[0], grav_r[0, 0], grav_r[0, 1],
            pidx_r[:], cc_r[:], c2_r[:], C=C, h=h, ccd_slop=ccd_slop)


def _ccd_math(c_px, c_py, c_an, c_vx, c_vy, c_om, own,
              o_dyn, o_bltr, gx, gy, pidx, cc, c2,
              *, C: int, h: float, ccd_slop: float):
    """One tile's TOI factors on pre-concatenated candidate rows (same row
    conventions as :func:`_project_math`). Returns f [1, T] in [0, 1]."""
    c_ca = jnp.cos(c_an)
    c_sa = jnp.sin(c_an)
    own_slice = lambda x: _own_lane_slice(x, own)
    o_px = own_slice(c_px)
    o_py = own_slice(c_py)
    o_an = own_slice(c_an)
    o_ca = own_slice(c_ca)
    o_sa = own_slice(c_sa)
    o_vx = own_slice(c_vx)
    o_vy = own_slice(c_vy)
    o_om = own_slice(c_om)
    dyn = o_dyn

    # unclamped integrated own pose (same derivation as project)
    opx_t = o_px + (o_vx + gx * h * dyn) * h
    opy_t = o_py + (o_vy + gy * h * dyn) * h
    oa_t = o_an + o_om * h
    oca_t = jnp.cos(oa_t)
    osa_t = jnp.sin(oa_t)

    f_acc = jnp.ones((1, T), f32)
    for gi in range(C // SG):
        s = _unpack_group(cc, c2, gi, C)
        pc = pidx[0, gi * SG:(gi + 1) * SG]  # [SG, T]

        def g(src):
            return _lg8(src, pc)

        p_dyn = s.p_dyn
        p_px0 = g(c_px)
        p_py0 = g(c_py)
        p_an0 = g(c_an)
        pose0 = PairPose(o_px, o_py, o_ca, o_sa,
                         p_px0, p_py0, g(c_ca), g(c_sa))
        p_px_t = p_px0 + (g(c_vx) + gx * h * p_dyn) * h
        p_py_t = p_py0 + (g(c_vy) + gy * h * p_dyn) * h
        p_an_t = p_an0 + g(c_om) * h
        pose1 = PairPose(opx_t, opy_t, oca_t, osa_t,
                         p_px_t, p_py_t, jnp.cos(p_an_t), jnp.sin(p_an_t))
        nx0, ny0, *_, wax0, way0, wbx0, wby0 = _pair_kinematics(s.cb,
                                                                pose0)
        _, _, _, _, _, _, wax1, way1, wbx1, wby1 = _pair_kinematics(
            s.cb, pose1)
        nxp = nx0[None]
        nyp = ny0[None]
        c0 = (wbx0 - wax0) * nxp + (wby0 - way0) * nyp  # [2, SG, T]
        c1 = (wbx1 - wax1) * nxp + (wby1 - way1) * nyp
        advance = c0 - c1
        allowed = jnp.maximum(c0, 0.0) + ccd_slop
        need = (advance > allowed) & (s.cb.solve_mask > 0.0)
        f_pt = jnp.where(need, allowed / jnp.maximum(advance, 1e-10), 1.0)
        f_acc = jnp.minimum(
            f_acc, jnp.min(jnp.min(f_pt, axis=0), axis=0, keepdims=True))
    return jnp.where(o_bltr > 0, f_acc, 1.0)


# ===========================================================================
# kernel 2: project (one substep's integrate + XPBD position projection)
#
# The per-tile math lives in _project_math/_apply_math/_ccd_math, shared
# verbatim between the per-substep kernels (the sharded halo path) and the
# whole-frame megakernel (_mega_kernel — the single-dispatch fast path):
# both produce bitwise-identical substeps because they run the same ops in
# the same order on the same [1, 3T+L] candidate rows.
# ===========================================================================


def _project_math(c_px, c_py, c_an, c_vx, c_vy, c_om, c_f, own,
                  o_invm, o_invi, o_dyn, gx, gy, pidx, cc, c2,
                  *, C: int, h: float, compliance: float, ccd: bool):
    """One tile's project phase on pre-concatenated candidate rows.

    c_*: [1, 3T+L] window+large rows; c_f: TOI rows or None; own in {0,1,2};
    o_*: [1, T] own-tile consts; pidx [1, C, T], cc [1, KC*C, T],
    c2 [1, K2*C, T]. Returns (accs [4, 1, T], lam [1, 2C, T],
    touch_new [1, C, T])."""
    c_ca = jnp.cos(c_an)
    c_sa = jnp.sin(c_an)
    own_slice = lambda x: _own_lane_slice(x, own)
    o_px = own_slice(c_px)
    o_py = own_slice(c_py)
    o_an = own_slice(c_an)
    o_ca = own_slice(c_ca)
    o_sa = own_slice(c_sa)
    o_vx = own_slice(c_vx)
    o_vy = own_slice(c_vy)
    o_om = own_slice(c_om)
    dyn = o_dyn
    o_f = own_slice(c_f) if ccd else 1.0

    # integrated own state (v_tilde + pose), derived algebraically;
    # with ccd the POSE advance is TOI-clamped (velocities are not —
    # restitution must see the true approach speed, cfg.ccd docs)
    ovx_t = o_vx + gx * h * dyn
    ovy_t = o_vy + gy * h * dyn
    opx_t = o_px + ovx_t * h * o_f
    opy_t = o_py + ovy_t * h * o_f
    oa_t = o_an + o_om * h * o_f

    # slot-group loop: 8 slots per iteration as [SG, T] — own-side [1, T]
    # rows broadcast against the group inside the solver math
    oca_t = jnp.cos(oa_t)
    osa_t = jnp.sin(oa_t)
    acc = None
    lam_groups = []  # per group [2, SG, T]
    touch_groups = []
    for gi in range(C // SG):
        s = _unpack_group(cc, c2, gi, C)
        s.pd.inv_mass_a = o_invm
        s.pd.inv_inertia_a = o_invi
        pc = pidx[0, gi * SG:(gi + 1) * SG]  # [SG, T]

        def g(src):
            return _lg8(src, pc)

        p_dyn = s.p_dyn  # partner gravity response (stored at setup)
        p_px0 = g(c_px)
        p_py0 = g(c_py)
        p_an0 = g(c_an)
        p_vx0 = g(c_vx)
        p_vy0 = g(c_vy)
        p_om0 = g(c_om)
        pose0 = PairPose(o_px, o_py, o_ca, o_sa,
                         p_px0, p_py0, g(c_ca), g(c_sa))
        p_f = g(c_f) if ccd else 1.0
        pvx_t = p_vx0 + gx * h * p_dyn
        pvy_t = p_vy0 + gy * h * p_dyn
        p_px_t = p_px0 + pvx_t * h * p_f
        p_py_t = p_py0 + pvy_t * h * p_f
        p_an_t = p_an0 + p_om0 * h * p_f
        pose = PairPose(opx_t, opy_t, oca_t, osa_t,
                        p_px_t, p_py_t, jnp.cos(p_an_t), jnp.sin(p_an_t))
        vals_a, _, lam_i = solve_contacts_b(pose, pose0, s.pd, s.cb, h,
                                            compliance)  # [4, SG, T]
        acc = vals_a if acc is None else acc + vals_a
        lam_groups.append(lam_i)
        touch_groups.append(
            jnp.max((lam_i > 0.0).astype(f32) * s.cb.pmask, axis=0))

    accs = jnp.sum(acc, axis=1, keepdims=True)  # slot-axis reduce -> [4, 1, T]
    # lam layout: row pt*C + slot (point-major, group slices 8-aligned)
    lam = jnp.concatenate(lam_groups, axis=1).reshape(2 * C, T)[None]
    touch_new = jnp.concatenate(touch_groups, axis=0)[None]
    return accs, lam, touch_new


def _project_kernel(
    px0, px1, px2, py0, py1, py2, an0, an1, an2,
    vx0, vx1, vx2, vy0, vy1, vy2, om0, om1, om2,
    o_invm, o_invi, o_dynb,
    l_px, l_py, l_an,
    pidx_r, cc_r, c2_r, grav_r, touch_r, tile_live,
    *rest,
    C: int, h: float, compliance: float, n_tiles: int, ccd: bool = False,
    halo: bool = False,
):
    if ccd:  # per-body TOI factors from _ccd_kernel, window rows
        f0w, f1w, f2w = rest[:3]
        dxx_o, dxy_o, dth_o, cnt_o, lam_o, touch_o = rest[3:]
    else:
        f0w = f1w = f2w = None
        dxx_o, dxy_o, dth_o, cnt_o, lam_o, touch_o = rest
    t = pl.program_id(0)
    own = 1 if halo else t - _win_start(t, n_tiles)
    live = jnp.max(tile_live[0]) > 0.0

    # all-asleep-window tiles: zero corrections, touch passthrough
    dxx_o[0] = jnp.zeros((1, T), f32)
    dxy_o[0] = jnp.zeros((1, T), f32)
    dth_o[0] = jnp.zeros((1, T), f32)
    cnt_o[0] = jnp.zeros((1, T), f32)
    lam_o[:] = jnp.zeros_like(lam_o)
    touch_o[:] = touch_r[:]

    @pl.when(live)
    def _project_body():

        def wl(a, b, c, lg):
            return jnp.concatenate([a[0], b[0], c[0], lg], axis=-1)

        zl = jnp.zeros_like(l_px[:])
        c_px = wl(px0, px1, px2, l_px[:])
        c_py = wl(py0, py1, py2, l_py[:])
        c_an = wl(an0, an1, an2, l_an[:])
        c_vx = wl(vx0, vx1, vx2, zl)
        c_vy = wl(vy0, vy1, vy2, zl)
        c_om = wl(om0, om1, om2, zl)
        c_f = wl(f0w, f1w, f2w, jnp.ones_like(l_px[:])) if ccd else None

        accs, lam, touch_new = _project_math(
            c_px, c_py, c_an, c_vx, c_vy, c_om, c_f, own,
            o_invm[0], o_invi[0], o_dynb[0],
            grav_r[0, 0], grav_r[0, 1], pidx_r[:], cc_r[:], c2_r[:],
            C=C, h=h, compliance=compliance, ccd=ccd)
        dxx_o[0] = accs[0]
        dxy_o[0] = accs[1]
        dth_o[0] = accs[2]
        cnt_o[0] = accs[3]
        lam_o[:] = lam
        touch_o[:] = jnp.maximum(touch_r[:], touch_new)


# ===========================================================================
# kernel 3: apply + velocity pass
# ===========================================================================


def _apply_kernel(
    px0, px1, px2, py0, py1, py2, an0, an1, an2,
    vx0, vx1, vx2, vy0, vy1, vy2, om0, om1, om2,
    dxx0, dxx1, dxx2, dxy0, dxy1, dxy2, dth0, dth1, dth2, cnt0, cnt1, cnt2,
    o_invm, o_invi, o_dynb, o_kin,
    l_px, l_py, l_an,
    pidx_r, cc_r, c2_r, lam_r, grav_r, tile_live,
    *rest,
    C: int, h: float, relaxation: float, max_dpos: float,
    rest_threshold: float, lin_damp: float, ang_damp: float, n_tiles: int,
    ccd: bool = False, halo: bool = False, compound: bool = False,
):
    if ccd:  # per-body TOI factors from _ccd_kernel, window rows
        f0w, f1w, f2w = rest[:3]
        rest = rest[3:]
    else:
        f0w = f1w = f2w = None
    if compound:  # + raw velocity-pass accumulators (owner-summed by caller)
        npx_o, npy_o, nan_o, nvx_o, nvy_o, nom_o, accv_o = rest
    else:
        npx_o, npy_o, nan_o, nvx_o, nvy_o, nom_o = rest
        accv_o = None
    t = pl.program_id(0)
    own = 1 if halo else t - _win_start(t, n_tiles)
    live = jnp.max(tile_live[0]) > 0.0

    # all-asleep-window tiles: state passthrough (identical to running
    # the kernel, since every body in a skipped tile has v == 0 and its
    # effective gravity response is 0 — this skip only saves time). The own
    # tile sits at window offset `own` (0 only for t=0, 2 only for t=Nt-1).
    def _own_of(a, b, c):
        return jnp.where(own == 0, a[0], jnp.where(own == 1, b[0], c[0]))

    npx_o[0] = _own_of(px0, px1, px2)
    npy_o[0] = _own_of(py0, py1, py2)
    nan_o[0] = _own_of(an0, an1, an2)
    nvx_o[0] = _own_of(vx0, vx1, vx2)
    nvy_o[0] = _own_of(vy0, vy1, vy2)
    nom_o[0] = _own_of(om0, om1, om2)
    if compound:
        accv_o[:] = jnp.zeros_like(accv_o)

    @pl.when(live)
    def _apply_body():

        def wl(a, b, c, lg):
            return jnp.concatenate([a[0], b[0], c[0], lg], axis=-1)

        zl = jnp.zeros_like(l_px[:])
        c_px = wl(px0, px1, px2, l_px[:])
        c_py = wl(py0, py1, py2, l_py[:])
        c_an = wl(an0, an1, an2, l_an[:])
        c_vx = wl(vx0, vx1, vx2, zl)
        c_vy = wl(vy0, vy1, vy2, zl)
        c_om = wl(om0, om1, om2, zl)
        c_dxx = wl(dxx0, dxx1, dxx2, zl)
        c_dxy = wl(dxy0, dxy1, dxy2, zl)
        c_dth = wl(dth0, dth1, dth2, zl)
        c_cnt = wl(cnt0, cnt1, cnt2, zl)
        c_f = wl(f0w, f1w, f2w, jnp.ones_like(l_px[:])) if ccd else None

        res = _apply_math(
            c_px, c_py, c_an, c_vx, c_vy, c_om,
            c_dxx, c_dxy, c_dth, c_cnt, c_f, own,
            o_invm[0], o_invi[0], o_dynb[0], o_kin[0],
            grav_r[0, 0], grav_r[0, 1], pidx_r[:], cc_r[:], c2_r[:], lam_r[:],
            C=C, h=h, relaxation=relaxation, max_dpos=max_dpos,
            rest_threshold=rest_threshold, lin_damp=lin_damp,
            ang_damp=ang_damp, ccd=ccd, compound=compound)
        npx, npy, nan, nvx, nvy, nom = res[:6]
        npx_o[0] = npx
        npy_o[0] = npy
        nan_o[0] = nan
        nvx_o[0] = nvx
        nvy_o[0] = nvy
        nom_o[0] = nom
        if compound:
            accv_o[:] = res[6][:, 0][None]  # [4, 1, T] -> [1, 4, T] block


def _apply_math(c_px, c_py, c_an, c_vx, c_vy, c_om,
                c_dxx, c_dxy, c_dth, c_cnt, c_f, own,
                o_invm, o_invi, o_dyn, o_kinr, gx, gy, pidx, cc, c2, lam,
                *, C: int, h: float, relaxation: float, max_dpos: float,
                rest_threshold: float, lin_damp: float, ang_damp: float,
                ccd: bool, compound: bool = False):
    """One tile's apply + velocity pass on pre-concatenated candidate rows
    (same row conventions as :func:`_project_math`; c_d* are the correction
    windows, lam [1, 2C, T]). Returns (npx, npy, nan, nvx, nvy, nom),
    each [1, T]."""
    # applied (count-normalized) deltas for EVERY candidate, derived the same
    # way the own tile applies them — this is how partner post-apply state is
    # known without cross-program communication
    c_scale = relaxation / jnp.maximum(c_cnt, 1.0)
    c_ddx = jnp.clip(c_dxx * c_scale, -max_dpos, max_dpos)
    c_ddy = jnp.clip(c_dxy * c_scale, -max_dpos, max_dpos)
    c_dda = jnp.clip(c_dth * c_scale, -max_dpos, max_dpos)

    own_slice = lambda x: _own_lane_slice(x, own)
    dyn = o_dyn
    kin = o_kinr
    o_f = own_slice(c_f) if ccd else 1.0

    # integrate own (same derivation as project; ccd clamps the pose
    # advance only — the velocity reconstruction below keeps full speed)
    o_vx = own_slice(c_vx)
    o_vy = own_slice(c_vy)
    o_om = own_slice(c_om)
    ovx_t = o_vx + gx * h * dyn
    ovy_t = o_vy + gy * h * dyn
    opx_t = own_slice(c_px) + ovx_t * h * o_f
    opy_t = own_slice(c_py) + ovy_t * h * o_f
    oa_t = own_slice(c_an) + o_om * h * o_f
    o_ddx = own_slice(c_ddx)
    o_ddy = own_slice(c_ddy)
    o_dda = own_slice(c_dda)
    npx = opx_t + o_ddx
    npy = opy_t + o_ddy
    nan = oa_t + o_dda

    # velocity reconstruction
    nk = 1.0 - kin
    nvx = kin * ovx_t + nk * (ovx_t + o_ddx / h)
    nvy = kin * ovy_t + nk * (ovy_t + o_ddy / h)
    nom = kin * o_om + nk * (o_om + o_dda / h)

    o_can = jnp.cos(nan)
    o_san = jnp.sin(nan)

    accv = None
    for gi in range(C // SG):
        s = _unpack_group(cc, c2, gi, C)
        s.pd.inv_mass_a = o_invm
        s.pd.inv_inertia_a = o_invi
        pc = pidx[0, gi * SG:(gi + 1) * SG]  # [SG, T]

        def g(src):
            return _lg8(src, pc)

        p_dyn = s.p_dyn
        p_f = g(c_f) if ccd else 1.0
        p_vx0 = g(c_vx)
        p_vy0 = g(c_vy)
        p_om0 = g(c_om)
        pvx_t = p_vx0 + gx * h * p_dyn
        pvy_t = p_vy0 + gy * h * p_dyn
        p_ddx = g(c_ddx)
        p_ddy = g(c_ddy)
        p_dda = g(c_dda)
        p_px_n = g(c_px) + pvx_t * h * p_f + p_ddx
        p_py_n = g(c_py) + pvy_t * h * p_f + p_ddy
        p_an_n = g(c_an) + p_om0 * h * p_f + p_dda
        # partner velocity reconstruction mirrors the partner's own apply —
        # kinematic partners keep velocity (their ddx is 0 anyway)
        p_nvx = pvx_t + p_ddx / h
        p_nvy = pvy_t + p_ddy / h
        p_nom = p_om0 + p_dda / h

        pose_v = PairPose(npx, npy, o_can, o_san,
                          p_px_n, p_py_n, jnp.cos(p_an_n), jnp.sin(p_an_n))
        pvel = PairVel(nvx, nvy, nom, p_nvx, p_nvy, p_nom)
        pvel0 = PairVel(ovx_t, ovy_t, o_om, pvx_t, pvy_t, p_om0)
        lo = gi * SG
        lam_c = jnp.stack([lam[0, lo:lo + SG],
                           lam[0, C + lo:C + lo + SG]])  # [2, SG, T]
        cv_a, _ = velocity_contacts_b(pose_v, pvel, pvel0, s.pd, s.cb,
                                      lam_c, h, rest_threshold)
        accv = cv_a if accv is None else accv + cv_a

    accv = jnp.sum(accv, axis=1, keepdims=True)  # slot-axis reduce
    if compound:
        # compound rows: the restitution/friction velocity corrections must
        # be count-normalized per BODY, not per collider row — return the
        # raw accumulators; the caller owner-sums them across sibling rows
        # and applies (+ damping) in XLA (see run_tiled_frame)
        return npx, npy, nan, nvx, nvy, nom, accv
    cntv = jnp.maximum(accv[3], 1.0)
    nvx = nvx + accv[0] / cntv
    nvy = nvy + accv[1] / cntv
    nom = nom + accv[2] / cntv
    if lin_damp > 0.0:
        sd = 1.0 / (1.0 + h * lin_damp)
        nvx = nvx * sd
        nvy = nvy * sd
    if ang_damp > 0.0:
        nom = nom * (1.0 / (1.0 + h * ang_damp))
    return npx, npy, nan, nvx, nvy, nom


# ===========================================================================
# whole-frame megakernel: ALL substeps in ONE pallas_call.
#
# The r4 profile (PROFILE.md round-4 addendum) put the whole 1.44 ms pile
# frame in the 10x per-substep project/apply kernel PAIR — i.e. in dispatch
# overhead plus re-streaming the frame-constant cc/c2 solve tables and the
# state/correction windows through HBM twenty times per frame (~150 MB).
# This kernel runs the substep loop as the leading Pallas grid dimension
# instead: grid (substeps, phases, n_tiles), with the tile state double-
# buffered in VMEM scratch, the correction windows + lambdas in scratch,
# and the solve tables resident in VMEM for the whole frame. Sequential
# TPU grid semantics give the exact same phase ordering as the per-substep
# pallas_calls (project over all tiles, then apply over all tiles), and the
# per-tile math is the SAME _project_math/_apply_math/_ccd_math code — so
# trajectories are bitwise-equal to the per-substep path (pinned by
# tests/test_tiles.py::test_mega_matches_per_substep).
#
# Scratch state is stored [Nt, SG, T] (each tile's [1, T] row replicated to
# a full 8-sublane tile): leading-dim dynamic indexing is then a pure
# tile-aligned address offset (no sublane rotates), and the window rows the
# solver reads are row 0 slices. Not usable when the tile axis is sharded
# (halo exchanges between substeps are XLA collectives — the per-substep
# kernels remain that path) or with joints (the XLA joint pass interleaves
# with substeps; see run_tiled_frame).
# ===========================================================================


def _mega_kernel(
    # resident inputs
    px_i, py_i, an_i, vx_i, vy_i, om_i,  # [Nt, 1, T] initial state
    o_invm_r, o_invi_r, o_dynb_r, o_kin_r,  # [Nt, 1, T]
    l_px, l_py, l_an,  # [1, L]
    pidx_r, cc_r, c2_r,  # [Nt, C, T] i32 / [Nt, KC*C, T] / [Nt, K2*C, T]
    grav_r, tile_live_r,  # [1, 2] / [Nt, 1, T]
    *rest,
    C: int, h: float, substeps: int, compliance: float, relaxation: float,
    max_dpos: float, rest_threshold: float, lin_damp: float, ang_damp: float,
    n_tiles: int, ccd: bool, ccd_slop: float,
):
    if ccd:
        (o_blt_r, npx_o, npy_o, nan_o, nvx_o, nvy_o, nom_o, touch_o,
         *scr) = rest
        (ax, ay, aa, avx, avy, aom, bx, by, ba, bvx, bvy, bom,
         cdxx, cdxy, cdth, ccnt, lam_s, f_s) = scr
    else:
        npx_o, npy_o, nan_o, nvx_o, nvy_o, nom_o, touch_o, *scr = rest
        (ax, ay, aa, avx, avy, aom, bx, by, ba, bvx, bvy, bom,
         cdxx, cdxy, cdth, ccnt, lam_s) = scr
        o_blt_r = f_s = None
    st_a = (ax, ay, aa, avx, avy, aom)
    st_b = (bx, by, ba, bvx, bvy, bom)
    outs = (npx_o, npy_o, nan_o, nvx_o, nvy_o, nom_o)
    ins = (px_i, py_i, an_i, vx_i, vy_i, om_i)
    corr = (cdxx, cdxy, cdth, ccnt)

    s = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    start = jnp.maximum(jnp.minimum(t - 1, n_tiles - WIN), 0)
    own = t - start
    even = (s % 2) == 0
    last = s == substeps - 1
    ph_proj = 1 if ccd else 0
    ph_apply = 2 if ccd else 1
    live = jnp.max(tile_live_r[pl.ds(t, 1)]) > 0.0

    # one-time: materialize the initial state into buffer A, zero the touch
    # accumulator (outputs with constant index maps stay VMEM-resident for
    # the whole grid, so in-place accumulation is free)
    @pl.when((s == 0) & (ph == 0) & (t == 0))
    def _init():
        for src, dst in zip(ins, st_a):
            dst[:] = jnp.broadcast_to(src[:], (n_tiles, SG, T))
        touch_o[:] = jnp.zeros_like(touch_o)

    def wrow(buf, i):  # [1, T] row of tile i (row 0 of the replicated tile)
        return buf[pl.ds(i, 1), 0:1, :][0]

    def cwin(buf, lg):  # [1, WIN*T + L] candidate row
        return jnp.concatenate(
            [wrow(buf, start), wrow(buf, start + 1), wrow(buf, start + 2),
             lg], axis=-1)

    def own_row(ref):  # [1, T] from a [Nt, 1, T] input
        return ref[pl.ds(t, 1)][0]

    def wr_rep(buf, val):  # write a [1, T] row replicated to tile t
        buf[pl.ds(t, 1)] = jnp.broadcast_to(val[None], (1, SG, T))

    zl_c = jnp.zeros((1, L), f32)
    one_c = jnp.ones((1, L), f32)
    gx = grav_r[0, 0]
    gy = grav_r[0, 1]

    def tables():  # loaded lazily inside the phases that use them
        return pidx_r[pl.ds(t, 1)], cc_r[pl.ds(t, 1)], c2_r[pl.ds(t, 1)]

    def state_rows(src):
        return (cwin(src[0], l_px[:]), cwin(src[1], l_py[:]),
                cwin(src[2], l_an[:]), cwin(src[3], zl_c),
                cwin(src[4], zl_c), cwin(src[5], zl_c))

    if ccd:
        @pl.when(ph == 0)
        def _ccd_phase():
            has_b = jnp.max(o_blt_r[pl.ds(t, 1)]) > 0.0

            def run(src):
                pidx, cc, c2 = tables()
                c_px, c_py, c_an, c_vx, c_vy, c_om = state_rows(src)
                f = _ccd_math(c_px, c_py, c_an, c_vx, c_vy, c_om, own,
                              own_row(o_dynb_r), own_row(o_blt_r), gx, gy,
                              pidx, cc, c2, C=C, h=h, ccd_slop=ccd_slop)
                wr_rep(f_s, f)

            @pl.when(live & has_b & even)
            def _(): run(st_a)

            @pl.when(live & has_b & jnp.logical_not(even))
            def _(): run(st_b)

            @pl.when(jnp.logical_not(live & has_b))
            def _(): wr_rep(f_s, jnp.ones((1, T), f32))

    @pl.when(ph == ph_proj)
    def _project_phase():
        def run(src):
            pidx, cc, c2 = tables()
            c_px, c_py, c_an, c_vx, c_vy, c_om = state_rows(src)
            c_f = cwin(f_s, one_c) if ccd else None
            accs, lam, touch_new = _project_math(
                c_px, c_py, c_an, c_vx, c_vy, c_om, c_f, own,
                own_row(o_invm_r), own_row(o_invi_r), own_row(o_dynb_r),
                gx, gy, pidx, cc, c2,
                C=C, h=h, compliance=compliance, ccd=ccd)
            for k in range(4):
                wr_rep(corr[k], accs[k])
            lam_s[pl.ds(t, 1)] = lam
            touch_o[pl.ds(t, 1)] = jnp.maximum(touch_o[pl.ds(t, 1)],
                                               touch_new)

        @pl.when(live & even)
        def _(): run(st_a)

        @pl.when(live & jnp.logical_not(even))
        def _(): run(st_b)

        @pl.when(jnp.logical_not(live))
        def _():  # skipped tiles: zero corrections (neighbors window-read)
            for k in range(4):
                wr_rep(corr[k], jnp.zeros((1, T), f32))

    @pl.when(ph == ph_apply)
    def _apply_phase():
        def run(src, dst):
            pidx, cc, c2 = tables()
            c_px, c_py, c_an, c_vx, c_vy, c_om = state_rows(src)
            c_dxx = cwin(corr[0], zl_c)
            c_dxy = cwin(corr[1], zl_c)
            c_dth = cwin(corr[2], zl_c)
            c_cnt = cwin(corr[3], zl_c)
            c_f = cwin(f_s, one_c) if ccd else None
            res = _apply_math(
                c_px, c_py, c_an, c_vx, c_vy, c_om,
                c_dxx, c_dxy, c_dth, c_cnt, c_f, own,
                own_row(o_invm_r), own_row(o_invi_r), own_row(o_dynb_r),
                own_row(o_kin_r), gx, gy, pidx, cc, c2,
                lam_s[pl.ds(t, 1)],
                C=C, h=h, relaxation=relaxation, max_dpos=max_dpos,
                rest_threshold=rest_threshold, lin_damp=lin_damp,
                ang_damp=ang_damp, ccd=ccd)
            for k in range(6):
                wr_rep(dst[k], res[k])

            @pl.when(last)
            def _():
                for k in range(6):
                    outs[k][pl.ds(t, 1)] = res[k][None]

        def passthrough(src, dst):
            for k in range(6):
                v = src[k][pl.ds(t, 1)]
                dst[k][pl.ds(t, 1)] = v

                @pl.when(last)
                def _(v=v, k=k):
                    outs[k][pl.ds(t, 1)] = v[:, 0:1, :]

        @pl.when(live & even)
        def _(): run(st_a, st_b)

        @pl.when(live & jnp.logical_not(even))
        def _(): run(st_b, st_a)

        @pl.when(jnp.logical_not(live) & even)
        def _(): passthrough(st_a, st_b)

        @pl.when(jnp.logical_not(live) & jnp.logical_not(even))
        def _(): passthrough(st_b, st_a)


def _run_mega(state, consts, large, pidx_c, cc, c2, gravity, tile_live,
              *, C, substeps, h, compliance, relaxation, max_dpos,
              rest_threshold, lin_damp, ang_damp, ccd, ccd_slop, interpret,
              params):
    """Invoke the whole-frame megakernel. Returns (new_state dict,
    touched [Nt, C, T])."""
    Nt = state["px"].shape[0]
    nph = 3 if ccd else 2

    def res(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda s, p, t, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = (
        [res((Nt, 1, T))] * 6  # state
        + [res((Nt, 1, T))] * 4  # invm invi dynb kin
        + [res((1, L))] * 3  # large pose
        + [res((Nt, C, T)), res((Nt, KC * C, T)), res((Nt, K2 * C, T))]
        + [res((1, 2)), res((Nt, 1, T))]  # gravity, tile_live
    )
    args = (
        [state[k] for k in ("px", "py", "an", "vx", "vy", "om")]
        + [consts["invm"], consts["invi"], consts["dynb"], consts["kin"]]
        + [large["px"], large["py"], large["an"]]
        + [pidx_c, cc, c2, jnp.asarray(gravity, f32), tile_live]
    )
    if ccd:
        in_specs.append(res((Nt, 1, T)))
        args.append(consts["blt"])
    scratch = (
        [pltpu.VMEM((Nt, SG, T), f32)] * 12  # state double buffer
        + [pltpu.VMEM((Nt, SG, T), f32)] * 4  # correction windows
        + [pltpu.VMEM((Nt, 2 * C, T), f32)]  # lambdas
        + ([pltpu.VMEM((Nt, SG, T), f32)] if ccd else [])  # TOI factors
    )
    kernel = functools.partial(
        _mega_kernel, C=C, h=h, substeps=substeps, compliance=compliance,
        relaxation=relaxation, max_dpos=max_dpos,
        rest_threshold=rest_threshold, lin_damp=lin_damp, ang_damp=ang_damp,
        n_tiles=Nt, ccd=ccd, ccd_slop=ccd_slop)
    out = pl.pallas_call(
        kernel,
        grid=(substeps, nph, Nt),
        in_specs=in_specs,
        out_specs=tuple([res((Nt, 1, T))] * 6 + [res((Nt, C, T))]),
        out_shape=tuple([jax.ShapeDtypeStruct((Nt, 1, T), f32)] * 6
                        + [jax.ShapeDtypeStruct((Nt, C, T), f32)]),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*args)
    new_state = dict(zip(("px", "py", "an", "vx", "vy", "om"), out[:6]))
    return new_state, out[6]


# ===========================================================================
# owner reduction for COMPOUND rows (VERDICT r4 missing #1): collider rows
# of one body are kept CONTIGUOUS by the sort (identical owner-origin keys +
# stable argsorts — see tiled._enter_tiles), so reducing per-row values to
# per-BODY values and broadcasting back is a handful of masked SHIFTS —
# no scatter, no gather (both measured ~150-200 us per call at 10k rows on
# this TPU), and the result lands on every sibling row directly.
# ===========================================================================


def _owner_shift_reduce(vals, ob, kc: int, op, neutral):
    """Reduce ``vals [Mp, ...]`` over each row's owner block (rows sharing
    ``ob [Mp]``, contiguous, size <= kc) and broadcast the result back to
    every row of the block. ``op`` elementwise-associative (add/min/max);
    ``neutral`` its identity. 2*(kc-1) masked shifts."""
    out = vals
    for o in range(1, kc):
        for sgn in (1, -1):
            sh = jnp.roll(vals, sgn * o, axis=0)
            m = jnp.roll(ob, sgn * o, axis=0) == ob
            if vals.ndim > 1:
                m = m.reshape(m.shape + (1,) * (vals.ndim - 1))
            out = op(out, jnp.where(m, sh, neutral))
    return out


def _owner_sum3(x, ob, kc: int):
    """[Nt, 1, T] per-row values -> per-OWNER sums broadcast to rows."""
    sh = x.shape
    return _owner_shift_reduce(x.reshape(-1), ob, kc, jnp.add,
                               jnp.zeros((), x.dtype)).reshape(sh)


def _owner_min3(x, ob, kc: int):
    sh = x.shape
    return _owner_shift_reduce(x.reshape(-1), ob, kc, jnp.minimum,
                               jnp.asarray(jnp.inf, x.dtype)).reshape(sh)


def _owner_max3(x, ob, kc: int):
    sh = x.shape
    return _owner_shift_reduce(x.reshape(-1), ob, kc, jnp.maximum,
                               jnp.asarray(-jnp.inf, x.dtype)).reshape(sh)


# ===========================================================================
# XLA-side joint pass for tile-layout state (single BIG worlds keep joints
# at any scale — VERDICT r3 item 3; SURVEY.md §3.2 step 4 ticks joints in
# the same substep). Joints are body-PAIR constraints with frame-static
# topology, so no slot tables and no overflow: the pass gathers both
# endpoints from the flattened [Nt*T] tile state by row index (canonical ->
# row map rebuilt at resort time), solves graph-colored exact Gauss-Seidel
# with the SAME row-major math as the XLA tier (solver.solve_joint_positions
# — shared code, not a twin), scatter-accumulates, and reconstructs
# velocity from the applied deltas. At J << N this is a handful of [J]-sized
# ops per substep against the kernels' [Nt*T] work.
# ===========================================================================


def _ext_flat(x, shard_axis, Ntl, Tl):
    """[Ntl*Tl, ...] flat own rows -> [(Ntl+2)*Tl, ...] with neighbor
    shards' edge tiles as halo rows (flat view of :func:`_halo_ext`)."""
    xt = _halo_ext(x.reshape(Ntl, Tl, *x.shape[1:]), shard_axis)
    return xt.reshape((Ntl + 2) * Tl, *x.shape[1:])


def _halo_fold_add(x, shard_axis, Ntl, Tl):
    """[(Ntl+2)*Tl, ...] halo'd per-row ACCUMULATORS -> [Ntl*Tl, ...] own
    rows, with values accumulated into halo rows RETURNED to their owner
    shard and added (the reverse of :func:`_ext_flat`'s exchange). Edge
    shards' outer halos hold zero-pad rows that no joint references."""
    D = jax.lax.axis_size(shard_axis)
    xt = x.reshape(Ntl + 2, Tl, *x.shape[1:])
    own = xt[1:-1]
    # my LEFT halo block holds contributions to my left neighbor's LAST
    # own tile: send it left; symmetrically for the right halo
    from_right = jax.lax.ppermute(xt[0:1], shard_axis,
                                  [(i + 1, i) for i in range(D - 1)])
    from_left = jax.lax.ppermute(xt[-1:], shard_axis,
                                 [(i, i + 1) for i in range(D - 1)])
    own = own.at[-1:].add(from_right).at[0:1].add(from_left)
    return own.reshape(Ntl * Tl, *x.shape[1:])


def _tile_joint_pass(st, jp, *, h, n_colors, max_dpos, shard_axis=None):
    """One substep's joint solve on tile-layout state. Runs AFTER the
    contact apply kernel, mirroring solver.substep's colored branch: one
    masked exact-GS pass per color (corrections applied with relaxation 1,
    clipped by the raw max_dpos — joints are constraint maintenance, not
    depenetration), pose refreshed between colors, velocity updated by the
    applied deltas / h, then the motor/damping velocity rows.

    Ordering difference vs the XLA tier (documented, pinned loosely by
    tests/test_tiled_joints.py): the tile engine's restitution/friction
    velocity pass runs inside the apply kernel BEFORE this pass — the kernel
    cannot see joint corrections that have not happened yet — so contact
    restitution reads velocities without the current substep's joint
    delta/h. Plain distance/pin/weld/range joints contribute no velocity
    rows, so scenes without motors/damping match the XLA tier up to Jacobi
    summation order.

    With ``shard_axis`` (tile axis sharded under shard_map) the pass runs
    on HALO-EXTENDED rows: ``jp`` rows are halo-local (built by
    ``tiled._joint_rows`` from all-gathered body ids; each joint is solved
    by exactly one shard — its ``row_a`` owner — and partners beyond the
    one-tile halo reach are masked out and counted upstream). Per color,
    accumulators landing on halo rows are ppermuted back to their owner
    and summed BEFORE normalization (graph coloring guarantees one joint
    per body per color globally, so cross-shard Gauss-Seidel order is
    preserved exactly), then the refreshed edge tiles are re-exchanged for
    the next color's reads."""
    from ..solver import (
        BodyState,
        _accumulate,
        solve_joint_positions,
        velocity_joints,
    )

    Nt, _, Tl = st["px"].shape
    Mp = Nt * Tl
    sharded = shard_axis is not None
    Mh = (Nt + 2) * Tl if sharded else Mp

    def flat(x):
        return x.reshape(Mp)

    def extf(x):
        return _ext_flat(x, shard_axis, Nt, Tl) if sharded else x

    def fold(x):
        return _halo_fold_add(x, shard_axis, Nt, Tl) if sharded else x

    def own(x):  # halo'd flat -> own rows
        return x[Tl:Tl + Mp] if sharded else x

    def mk_state(pos, ang, vel, om):
        return BodyState(pos, ang, vel, om)

    pos = jnp.stack([extf(flat(st["px"])), extf(flat(st["py"]))], axis=-1)
    vel = jnp.stack([extf(flat(st["vx"])), extf(flat(st["vy"]))], axis=-1)
    s = mk_state(pos, extf(flat(st["an"])), vel, extf(flat(st["om"])))
    bodies = SimpleNamespace(inv_mass=extf(jp["invm"]),
                             inv_inertia=extf(jp["invi"]))
    joints = SimpleNamespace(
        body_a=jp["row_a"], body_b=jp["row_b"], jtype=jp["jtype"],
        anchor_a=jp["anchor_a"], anchor_b=jp["anchor_b"], rest=jp["rest"],
        lo=jp["lo"], hi=jp["hi"], compliance=jp["compliance"],
        damping=jp["damping"], motor_speed=jp["motor_speed"],
        motor_max=jp["motor_max"], color=jp["color"], active=jp["active"],
    )

    def apply_acc(s, acc):
        """Fold accumulators to owners, normalize, apply, re-extend."""
        dp = fold(acc.dpos)
        da = fold(acc.dang)
        cnt = jnp.maximum(fold(acc.count), 1.0)
        dpos = jnp.clip(dp / cnt[:, None], -max_dpos, max_dpos)
        dang = jnp.clip(da / cnt, -max_dpos, max_dpos)
        npos = own(s.pos) + dpos
        nang = own(s.angle) + dang
        nvel = own(s.vel) + dpos / h
        nom = own(s.ang_vel) + dang / h
        return mk_state(
            jnp.stack([extf(npos[:, 0]), extf(npos[:, 1])], axis=-1),
            extf(nang),
            jnp.stack([extf(nvel[:, 0]), extf(nvel[:, 1])], axis=-1),
            extf(nom))

    for color in range(n_colors):
        last = color == n_colors - 1
        msk = (joints.color >= color) if last else (joints.color == color)
        contrib = solve_joint_positions(s, bodies, joints, h, mask=msk)
        s = apply_acc(s, _accumulate(Mh, False, *contrib))
    jv = velocity_joints(s, bodies, joints, h)
    accv = _accumulate(Mh, False, *jv)
    dv = fold(accv.dpos)
    dw = fold(accv.dang)
    cntv = jnp.maximum(fold(accv.count), 1.0)
    vel = own(s.vel) + dv / cntv[:, None]
    om = own(s.ang_vel) + dw / cntv
    opos = own(s.pos)
    oang = own(s.angle)

    def tile(x):
        return x.reshape(Nt, 1, Tl)

    return dict(px=tile(opos[:, 0]), py=tile(opos[:, 1]),
                an=tile(oang), vx=tile(vel[:, 0]), vy=tile(vel[:, 1]),
                om=tile(om))


# ===========================================================================
# wrapper: per-frame composition of the three kernels
# ===========================================================================


def _halo_ext(x, shard_axis):
    """[Nt_loc, ...] tile-sharded array -> [Nt_loc+2, ...] with the neighbor
    shards' edge tiles as halo rows. The ppermutes are NON-RING (no
    wraparound pairs), so the first shard's left halo and the last shard's
    right halo arrive ZERO-FILLED — an all-zero tile is inert by
    construction (``act == 0`` excludes every pad body from candidacy and
    the zero poses/verts keep the AABB math finite). All cross-shard
    traffic is 2 tiles x #arrays per exchange — one (1, T) row each way."""
    D = jax.lax.axis_size(shard_axis)
    fwd = [(i, i + 1) for i in range(D - 1)]
    bwd = [(i + 1, i) for i in range(D - 1)]
    left = jax.lax.ppermute(x[-1:], shard_axis, fwd)  # my left halo
    right = jax.lax.ppermute(x[:1], shard_axis, bwd)  # my right halo
    return jnp.concatenate([left, x, right], axis=0)


def _make_ext(shard_axis):
    if shard_axis is None:
        return lambda x: x
    return lambda x: _halo_ext(x, shard_axis)


def _wv3_specs(n_tiles, V, halo=False):
    def mk(off):
        def imap(t):
            if halo:
                return (t + off, 0, 0)
            return (jnp.maximum(jnp.minimum(t - 1, n_tiles - WIN), 0)
                    + off, 0, 0)

        return pl.BlockSpec((1, V, T), imap, memory_space=pltpu.VMEM)

    return [mk(0), mk(1), mk(2)]


def _tables_specs(n_tiles, C, V, halo=False):
    def w3():
        return list(_window_specs(n_tiles, halo))

    in_specs = []
    for _ in range(6):  # px py an vx vy om
        in_specs += w3()
    in_specs += _wv3_specs(n_tiles, V, halo) * 2  # vlx, vly
    for _ in range(7):  # rad nv act mov lay msk obody
        in_specs += w3()
    in_specs += [_own_spec()] * 2  # o_responds, o_sensor
    in_specs += [_bcast((1, L))] * 3  # l_px l_py l_an
    in_specs += [_bcast((1, V, L))] * 2  # l_vlx l_vly
    in_specs += [_bcast((1, L))] * 5  # l_rad l_nv l_act l_lay l_msk
    in_specs += [_own_spec()] * 2  # edge_lo, edge_hi
    in_specs += [_bcast((1, 2))]  # gravity
    return in_specs


def _manifold_specs(n_tiles, C, V, halo=False, with_keys=False):
    def w3():
        return list(_window_specs(n_tiles, halo))

    in_specs = []
    for _ in range(6):  # px py an vx vy om
        in_specs += w3()
    in_specs += _wv3_specs(n_tiles, V, halo) * 2  # vlx, vly
    for _ in range(7):  # rad nv fric rst sen invm invi
        in_specs += w3()
    in_specs += [_own_spec()]  # o_sensor
    in_specs += [_bcast((1, L))] * 3  # l_px l_py l_an
    in_specs += [_bcast((1, V, L))] * 2  # l_vlx l_vly
    in_specs += [_bcast((1, L))] * 5  # l_rad l_nv l_fric l_rst l_sen
    in_specs += [_own3(C), _own3(C), _own_spec()]  # pidx, act, tile_live
    if with_keys:
        in_specs += w3() + [_bcast((1, L))]  # canonical-id rows (cid, l_cid)
    return in_specs


@functools.partial(
    jax.jit,
    static_argnames=("C", "V", "margin", "dt", "sort_axis", "sweep_frames",
                     "sweep_slack", "sweep_cap", "sweep_floor", "shard_axis",
                     "interpret"),
)
def build_tile_tables(
    state, consts, large, gravity,
    *, C, V, margin, dt, sort_axis=0, sweep_frames=1, sweep_slack=0.0,
    sweep_floor=0.25,
    sweep_cap=1e30, shard_axis=None, interpret=False,
):
    """Slot tables for the tile layout. Returns ``(pidx [Nt, C, T] i32,
    act [Nt, C, T] f32, count [Nt, 1, T] i32, count_touch [Nt, 1, T] i32,
    count_close [Nt, 1, T] i32, winover [Nt, 1, T] i32,
    sweep [Nt, 1, T] f32)`` — ``sweep`` is each body's position budget
    (tiled.py's rollout guards displacement against it);
    ``count_touch > C`` is the hard overflow (a live contact went
    unsolved); ``count_close > C`` / ``count > C`` alone only drop
    imminent/speculative candidates (bounded staleness).

    ``shard_axis``: name of a ``shard_map`` mesh axis the TILE axis is
    sharded over. Window reads then come from halo-extended local arrays
    (see :func:`_halo_ext`), the window is the uniform (t-1, t, t+1) —
    boundary tiles see an inert zero pad instead of the single-device
    clamped window — and every output is local to the shard."""
    Nt = state["px"].shape[0]
    halo = shard_axis is not None
    ext = _make_ext(shard_axis)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_TILES)

    def wrows(x):
        xe = ext(x)
        return [xe, xe, xe]

    win_state = sum([wrows(state[k]) for k in
                     ("px", "py", "an", "vx", "vy", "om")], [])
    win_verts = wrows(consts["vlx"]) + wrows(consts["vly"])
    win_scal = sum([wrows(consts[k]) for k in
                    ("rad", "nv", "act", "mov", "lay", "msk", "obody")], [])
    large_args = [large["px"], large["py"], large["an"],
                  large["vlx"], large["vly"],
                  large["rad"], large["nv"], large["act"],
                  large["lay"], large["msk"]]
    kernel = functools.partial(
        _tables_kernel, C=C, V=V, margin=margin, dt=dt, n_tiles=Nt,
        sort_axis=sort_axis, sweep_frames=sweep_frames,
        sweep_slack=sweep_slack, sweep_cap=sweep_cap,
        sweep_floor=sweep_floor, halo=halo)
    return pl.pallas_call(
        kernel,
        grid=(Nt,),
        in_specs=_tables_specs(Nt, C, V, halo),
        out_specs=(_own3(C), _own3(C), _own_spec(), _own_spec(), _own_spec(),
                   _own_spec(), _own_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((Nt, C, T), i32),
            jax.ShapeDtypeStruct((Nt, C, T), f32),
            jax.ShapeDtypeStruct((Nt, 1, T), i32),
            jax.ShapeDtypeStruct((Nt, 1, T), i32),
            jax.ShapeDtypeStruct((Nt, 1, T), i32),
            jax.ShapeDtypeStruct((Nt, 1, T), i32),
            jax.ShapeDtypeStruct((Nt, 1, T), f32),
        ),
        compiler_params=params,
        interpret=interpret,
    )(*(win_state + win_verts + win_scal
        + [consts["responds"], consts["sen"]]
        + large_args + [consts["edge_lo"], consts["edge_hi"], gravity]))


@functools.partial(
    jax.jit,
    static_argnames=("C", "Cs", "V", "substeps", "h", "dt", "margin",
                     "compliance",
                     "relaxation", "max_dpos", "rest_threshold", "lin_damp",
                     "ang_damp", "sleep_velocity", "sort_axis", "ccd",
                     "ccd_slop", "joint_colors", "max_dpos_joint",
                     "shard_axis", "fuse", "interpret", "n_colliders",
                     "compound", "owner_kc"),
)
def run_tiled_frame(
    state,  # dict of [Nt, T] f32: px py an vx vy om
    consts,  # dict of [Nt, T]: rad nv fric rst sen act mov invm invi lay msk
             # responds dynb kin + verts vlx/vly [Nt, V, T] + edge_lo/edge_hi
             # (+ blt when ccd=True)
    large,  # dict of [1, L] (+ verts [1, V, L]): px py an rad nv fric rst
            # sen act lay msk
    gravity,  # [1, 2]
    tables=None,  # optional (pidx, act) from build_tile_tables — reuse a
                  # K-frame broadphase; None builds per-frame tables here
    joints=None,  # optional row-indexed joint pytree (tiled._joint_rows):
                  # an XLA joint pass runs per substep after the apply kernel
    *, C, V, substeps, h, dt, margin, compliance, relaxation, max_dpos,
    rest_threshold, lin_damp, ang_damp, sleep_velocity=0.0, sort_axis=0,
    ccd=False, ccd_slop=0.005, joint_colors=1, max_dpos_joint=1e3,
    Cs=None, shard_axis=None, fuse=True, interpret=False, event_ids=None,
    n_colliders=0, compound=False, owner_kc=1,
):
    """One frame on the sorted-tile layout. Returns (new_state dict,
    touched [Nt, Cs, T], (count, count_touch, count_close) [Nt, 1, T] each,
    winover [Nt, T], wake [Nt, 1, T],
    pen [Nt, 1, T], pidx [Nt, C, T] (table partner indices),
    pidx_c [Nt, Cs, T] (per-frame COMPACTED partner indices),
    act [Nt, C, T] (table slot-valid flags), npts [Nt, 1, T],
    src [Nt, Cs, T] (solve slot -> table slot, for per-frame event-key
    selection), nact [Nt, 2, T] (row 0: pmask-active candidates per body,
    row 1: imminent candidates with sep < margin; compaction keeps
    closest-first, so row1 > Cs is the HARD solve_overflow and
    row0 > Cs alone only drops fast-approach speculatives for one frame)
    — touched+pidx_c back the pair-event API in tiled.py; act+npts back
    the unified cross-tier Diagnostics (npts is the UNDIRECTED
    manifold-point count: dyn-dyn points weighted 0.5 per row).
    ``C`` (table slots) and ``Cs`` (per-frame compacted SOLVE slots,
    default C — see config.tile_solve_capacity) must be multiples of SG=8
    (slots are processed as sublane groups; tiled.py rounds up).
    ``consts['tile_live']`` gates per-tile work: a tile whose whole 3-tile
    window is asleep skips all compute (island-granular sleeping);
    ``sleep_velocity > 0`` enables the in-kernel wake-on-fast-contact
    signal; ``sort_axis`` picks which axis the window-miss check uses.
    ``shard_axis`` names a ``shard_map`` mesh axis the tile axis is sharded
    over: all window reads (state per substep, corrections between project
    and apply, CCD TOI factors) then ride halo exchanges (one edge tile
    each way per array, :func:`_halo_ext`) and every array here is the
    shard-local slice; ``joints`` rows must then be HALO-LOCAL with
    beyond-reach joints masked out (``tiled._joint_rows``) — the joint
    pass folds halo corrections back over the same exchange."""
    assert C % SG == 0, f"tile engine needs slot capacity % {SG} == 0, got {C}"
    if Cs is None:
        Cs = C
    Cs = min(Cs, C)
    assert Cs % SG == 0, f"solve capacity % {SG} != 0: {Cs}"
    assert not compound or (joints is None and shard_axis is None), (
        "compound rows: joints and the sharded tile axis are handled by "
        "other tiers (tiled.use_tiled gates)")
    Nt = state["px"].shape[0]
    halo = shard_axis is not None
    ext = _make_ext(shard_axis)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_TILES)

    def wrows(x):
        xe = ext(x)
        return [xe, xe, xe]

    win_state = sum([wrows(state[k]) for k in
                     ("px", "py", "an", "vx", "vy", "om")], [])
    win_verts = wrows(consts["vlx"]) + wrows(consts["vly"])
    tile_live = consts["tile_live"]

    if tables is None:
        (pidx, act, count, count_touch, count_close, winover,
         _sweep) = build_tile_tables(
            {k: state[k] for k in ("px", "py", "an", "vx", "vy", "om")},
            consts, large, gravity, C=C, V=V, margin=margin, dt=dt,
            sort_axis=sort_axis, shard_axis=shard_axis, interpret=interpret)
    else:
        pidx, act = tables
        count = jnp.zeros((Nt, 1, T), i32)  # caller tracks counts at build
        count_touch = jnp.zeros((Nt, 1, T), i32)
        count_close = jnp.zeros((Nt, 1, T), i32)
        winover = jnp.zeros((Nt, 1, T), i32)

    mani_scal = sum([wrows(consts[k]) for k in
                     ("rad", "nv", "fric", "rst", "sen", "invm", "invi")], [])
    mani_large = [large["px"], large["py"], large["an"],
                  large["vlx"], large["vly"],
                  large["rad"], large["nv"], large["fric"], large["rst"],
                  large["sen"]]
    with_keys = event_ids is not None
    manifold = functools.partial(
        _manifold_kernel, C=C, Cs=Cs, V=V, margin=margin, dt=dt, n_tiles=Nt,
        sleep_velocity=sleep_velocity, halo=halo, with_keys=with_keys,
        n_colliders=n_colliders)
    out_specs = (_own3(Cs * KC), _own3(Cs * K2), _own3(Cs), _own3(Cs),
                 _own3(2), _own_spec(), _own_spec(), _own_spec())
    out_shape = (
        jax.ShapeDtypeStruct((Nt, Cs * KC, T), f32),
        jax.ShapeDtypeStruct((Nt, Cs * K2, T), f32),
        jax.ShapeDtypeStruct((Nt, Cs, T), i32),
        jax.ShapeDtypeStruct((Nt, Cs, T), i32),
        jax.ShapeDtypeStruct((Nt, 2, T), i32),
        jax.ShapeDtypeStruct((Nt, 1, T), f32),
        jax.ShapeDtypeStruct((Nt, 1, T), f32),
        jax.ShapeDtypeStruct((Nt, 1, T), f32),
    )
    if with_keys:
        out_specs = out_specs + (_own3(Cs),)
        out_shape = out_shape + (jax.ShapeDtypeStruct((Nt, Cs, T), i32),)
    mani_out = pl.pallas_call(
        manifold,
        grid=(Nt,),
        in_specs=_manifold_specs(Nt, C, V, halo, with_keys=with_keys),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=interpret,
    )(*(win_state + win_verts + mani_scal
        + [consts["sen"]]
        + mani_large + [pidx, act, tile_live]
        + (wrows(event_ids[0]) + [event_ids[1]] if with_keys else [])))
    if with_keys:
        cc, c2, pidx_c, src, nact, wake, pen, npts, key_c = mani_out
    else:
        (cc, c2, pidx_c, src, nact, wake, pen, npts), key_c = mani_out, None

    # fast path: ALL substeps in one pallas_call (state + tables VMEM-
    # resident across the frame — see _mega_kernel). The per-substep
    # kernels below remain for the sharded tile axis (halo exchanges
    # between substeps are XLA collectives) and for the joint pass (XLA-
    # side, interleaved between substeps).
    # (fuse defaults OFF in interpret mode at the tiled.py call sites: the
    # interpreter copies every VMEM-resident block per grid step, which makes
    # the whole-frame grid pathologically slow; the per-substep kernels run
    # the same _project_math/_apply_math code, and the compiled TPU parity
    # test pins the megakernel bitwise — tests/test_tiles.py.)
    if (fuse and shard_axis is None and joints is None and not compound
            and substeps > 0):
        mega_state, touched = _run_mega(
            state, consts, large, pidx_c, cc, c2, gravity, tile_live,
            C=Cs, substeps=substeps, h=h, compliance=compliance,
            relaxation=relaxation, max_dpos=max_dpos,
            rest_threshold=rest_threshold, lin_damp=lin_damp,
            ang_damp=ang_damp, ccd=ccd, ccd_slop=ccd_slop,
            interpret=interpret, params=params)
        return mega_state, touched, (count, count_touch, count_close), \
            winover, wake, pen, pidx, pidx_c, act, npts, src, nact, key_c

    if joints is not None:
        # frame-level gate: the whole per-substep XLA joint pass is skipped
        # while every joint is inert — both ends sleep-frozen or static
        # (effective inverse masses zeroed by the caller's freeze) or the
        # joint inactive. Exact: an all-frozen joint contributes zero.
        if halo:
            Ntl = state["px"].shape[0]
            jim = _ext_flat(joints["invm"], shard_axis, Ntl, T)
            jii = _ext_flat(joints["invi"], shard_axis, Ntl, T)
        else:
            jim, jii = joints["invm"], joints["invi"]
        ia = jim[joints["row_a"]] + jii[joints["row_a"]]
        ib = jim[joints["row_b"]] + jii[joints["row_b"]]
        jlive = jnp.any((joints["active"] > 0) & ((ia > 0) | (ib > 0)))
        if halo:  # every shard must take the same branch
            jlive = jax.lax.psum(jlive.astype(jnp.int32), shard_axis) > 0
    else:
        jlive = None

    # the per-substep kernels run at the COMPACTED width Cs
    ob = consts["obody"].reshape(-1) if compound else None
    project = functools.partial(_project_kernel, C=Cs, h=h,
                                compliance=compliance, n_tiles=Nt, ccd=ccd,
                                halo=halo)
    apply_k = functools.partial(
        _apply_kernel, C=Cs, h=h, relaxation=relaxation, max_dpos=max_dpos,
        rest_threshold=rest_threshold, lin_damp=lin_damp, ang_damp=ang_damp,
        n_tiles=Nt, ccd=ccd, halo=halo, compound=compound)
    ccd_k = functools.partial(_ccd_kernel, C=Cs, h=h, ccd_slop=ccd_slop,
                              n_tiles=Nt, halo=halo)

    def w3s():
        return list(_window_specs(Nt, halo))

    fwin = w3s() if ccd else []
    ccd_specs = (
        sum([w3s() for _ in range(6)], [])
        + [_own_spec()] * 2  # dynb blt
        + [_bcast((1, L))] * 3  # large pose
        + [_own3(Cs), _own3(Cs * KC), _own3(Cs * K2), _bcast((1, 2)),
           _own_spec()]  # + tile_live
    )
    proj_specs = (
        sum([w3s() for _ in range(6)], [])
        + [_own_spec()] * 3  # invm invi dynb
        + [_bcast((1, L))] * 3  # large pose
        + [_own3(Cs), _own3(Cs * KC), _own3(Cs * K2), _bcast((1, 2)),
           _own3(Cs), _own_spec()]  # + tile_live
        + fwin  # ccd TOI factor window rows
    )
    apply_specs = (
        sum([w3s() for _ in range(10)], [])  # state 6 + corrections 4
        + [_own_spec()] * 4  # invm invi dynb kin
        + [_bcast((1, L))] * 3
        + [_own3(Cs), _own3(Cs * KC), _own3(Cs * K2), _own3(2 * Cs),
           _bcast((1, 2)), _own_spec()]  # + tile_live
        + fwin
    )

    lpose = [large["px"], large["py"], large["an"]]

    def substep(carry, _):
        st, touched = carry
        sw = sum([wrows(st[k]) for k in ("px", "py", "an", "vx", "vy", "om")],
                 [])
        if ccd:
            f = pl.pallas_call(
                ccd_k,
                grid=(Nt,),
                in_specs=ccd_specs,
                out_specs=(_own_spec(),),
                out_shape=(jax.ShapeDtypeStruct((Nt, 1, T), f32),),
                compiler_params=params,
                interpret=interpret,
            )(*(sw + [consts["dynb"], consts["blt"]]
                + lpose + [pidx_c, cc, c2, gravity, tile_live]))[0]
            if compound:
                # the whole compound advances by its earliest sibling TOI
                f = _owner_min3(f, ob, owner_kc)
            fargs = wrows(f)
        else:
            fargs = []
        dxx, dxy, dth, cnt, lam, touched = pl.pallas_call(
            project,
            grid=(Nt,),
            in_specs=proj_specs,
            out_specs=([_own_spec()] * 4 + [_own3(2 * Cs), _own3(Cs)]),
            out_shape=(
                [jax.ShapeDtypeStruct((Nt, 1, T), f32)] * 4
                + [jax.ShapeDtypeStruct((Nt, 2 * Cs, T), f32),
                   jax.ShapeDtypeStruct((Nt, Cs, T), f32)]
            ),
            compiler_params=params,
            interpret=interpret,
        )(*(sw + [consts["invm"], consts["invi"], consts["dynb"]]
            + lpose + [pidx_c, cc, c2, gravity, touched, tile_live] + fargs))

        if compound:
            # corrections + counts become per-BODY sums broadcast to every
            # sibling row (count-normalized per body, exactly the XLA
            # tier's semantics) BEFORE the apply kernel consumes them — so
            # the partner post-apply derivation stays consistent too
            dxx = _owner_sum3(dxx, ob, owner_kc)
            dxy = _owner_sum3(dxy, ob, owner_kc)
            dth = _owner_sum3(dth, ob, owner_kc)
            cnt = _owner_sum3(cnt, ob, owner_kc)
        corr = wrows(dxx) + wrows(dxy) + wrows(dth) + wrows(cnt)
        apply_out_specs = [_own_spec()] * 6 + ([_own3(4)] if compound else [])
        apply_out_shape = ([jax.ShapeDtypeStruct((Nt, 1, T), f32)] * 6
                           + ([jax.ShapeDtypeStruct((Nt, 4, T), f32)]
                              if compound else []))
        aout = pl.pallas_call(
            apply_k,
            grid=(Nt,),
            in_specs=apply_specs,
            out_specs=tuple(apply_out_specs),
            out_shape=tuple(apply_out_shape),
            compiler_params=params,
            interpret=interpret,
        )(*(sw + corr
            + [consts["invm"], consts["invi"], consts["dynb"], consts["kin"]]
            + lpose + [pidx_c, cc, c2, lam, gravity, tile_live] + fargs))
        npx, npy, nan_, nvx, nvy, nom = aout[:6]
        if compound:
            # velocity pass: per-BODY count-normalized correction + damping
            av = _owner_shift_reduce(
                aout[6].transpose(0, 2, 1).reshape(-1, 4), ob, owner_kc,
                jnp.add, jnp.float32(0))  # [Mp, 4]
            cntv = jnp.maximum(av[:, 3], 1.0)
            nvx = nvx + (av[:, 0] / cntv).reshape(nvx.shape)
            nvy = nvy + (av[:, 1] / cntv).reshape(nvy.shape)
            nom = nom + (av[:, 2] / cntv).reshape(nom.shape)
            if lin_damp > 0.0:
                sd = 1.0 / (1.0 + h * lin_damp)
                nvx = nvx * sd
                nvy = nvy * sd
            if ang_damp > 0.0:
                nom = nom * (1.0 / (1.0 + h * ang_damp))
        st2 = dict(px=npx, py=npy, an=nan_, vx=nvx, vy=nvy, om=nom)
        if joints is not None:
            # jlive is psum-replicated under shard_map, so every shard
            # takes the same branch and the pass's ppermutes always pair
            st2 = jax.lax.cond(
                jlive,
                lambda s: _tile_joint_pass(s, joints, h=h,
                                           n_colors=joint_colors,
                                           max_dpos=max_dpos_joint,
                                           shard_axis=shard_axis),
                lambda s: s, st2)
        return (st2, touched), ()

    touched0 = jnp.zeros((Nt, Cs, T), f32)
    (state, touched), _ = jax.lax.scan(
        substep, (state, touched0), None, length=substeps)
    return state, touched, (count, count_touch, count_close), winover, wake, \
        pen, pidx, pidx_c, act, npts, src, nact, key_c


_VMEM_LIMIT_TILES = 100 * 1024 * 1024
