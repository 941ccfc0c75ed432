"""Slot-table broadphase: one Pallas kernel from body poses to per-collider
partner slots, for batched worlds.

TPU-native equivalent of starframe's HGrid broadphase (SURVEY.md §2 row 5)
for the batched-worlds regime (BASELINE.json:11): instead of compacting a
pair LIST (which needs ``nonzero``/gather/scatter — all poison on TPU at
batch scale, PROFILE.md), every *dynamic* collider owns ``C`` partner slots.
The kernel computes swept AABBs in VMEM, builds the dense ``[M, M]`` overlap
mask per world (M <= ~1k, so M^2 stays VMEM-resident), ranks each row's hits
with one small matmul against a strictly-lower-triangular matrix, and
rank-selects the first ``C`` partners per collider — emitting ``partner
[W, C, M]`` / ``slot_active [W, C, M]`` tables that the whole-frame kernel
(frame2.py) consumes with in-register lane gathers.

Owner-row design notes:

- A dynamic-dynamic overlap appears in BOTH rows (each side later applies
  its own half of the XPBD correction); a static/kinematic collider gets no
  row at all (its correction is identically zero), which is what keeps a
  ground slab touching hundreds of bodies from overflowing any row.
- ``count [W, M]`` is the TRUE per-row hit count; rows with count > C are
  silently truncated in the tables, so callers must surface
  ``sum(max(count - C, 0))`` as an overflow diagnostic (SURVEY.md §4.6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanegather import lane_gather

f32 = jnp.float32
i32 = jnp.int32


def _elig_kernel(cbody_r, layer_r, lmask_r, active_r, sensor_r,
                 responds_b_r, moves_b_r, elig_o):
    """Static pair-eligibility mask ``[Wb, M, M] i8`` (j on sublanes, own
    row i on lanes — same layout the slot kernel consumes). Everything here
    depends only on topology/layers/flags, which are constant across a
    rollout, so rollouts precompute it once and every table rebuild skips
    ~10 of its ~28 [Wb, M, M] vector passes (the build is VPU-pass-bound,
    measured r3)."""
    cbody = cbody_r[:]
    responds = lane_gather(responds_b_r[:], cbody)
    moves = lane_gather(moves_b_r[:], cbody)
    layer = layer_r[:]
    lmask = lmask_r[:]
    active = active_r[:]
    sensor = sensor_r[:]

    def as_i(x):
        return x[:, None, :]

    def as_j(x):
        return x[:, :, None]

    diff_body = as_j(cbody) != as_i(cbody)
    layer_ok = (
        ((as_i(lmask) >> as_j(layer)) & 1) & ((as_j(lmask) >> as_i(layer)) & 1)
    ) != 0
    both_active = (as_i(active) > 0) & (as_j(active) > 0)
    sensorish = (as_i(sensor) > 0) | (as_j(sensor) > 0)
    row_ok = (as_i(responds) > 0) | ((as_i(sensor) > 0) & (as_i(moves) > 0))
    pair_moves = (as_i(moves) > 0) | (as_j(moves) > 0)
    elig = diff_body & layer_ok & both_active & row_ok & (pair_moves | sensorish)
    elig_o[:] = elig.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("worlds_per_program", "interpret"))
def build_elig_mask(cbody, layer, lmask, active, sensor, responds, moves,
                    *, worlds_per_program: int = 0, interpret: bool = False):
    """One-time static eligibility mask ``[W, M, M] i8`` for
    :func:`build_slot_tables`'s ``elig`` input. Rebuild on topology/flag
    changes (spawn/despawn, layer/sensor edits) — NOT per frame."""
    W, M = cbody.shape
    Wb = worlds_per_program or pick_worlds_per_program(W, M)

    def mspec():
        return pl.BlockSpec((Wb, M), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def nspec():
        N = responds.shape[1]
        return pl.BlockSpec((Wb, N), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def espec():
        return pl.BlockSpec((Wb, M, M), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _elig_kernel,
        grid=(W // Wb,),
        in_specs=[mspec()] * 5 + [nspec()] * 2,
        out_specs=espec(),
        out_shape=jax.ShapeDtypeStruct((W, M, M), jnp.int8),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(cbody, layer, lmask, active, sensor, responds, moves)


def _slot_kernel(
    # body-level [Wb, N]
    posx_r, posy_r, ang_r, velx_r, vely_r,
    # collider-level [Wb, M] (verts [Wb, V, M])
    cbody_r, vlx_r, vly_r, radius_r,
    # then EITHER elig [Wb, M, M] i8 (has_elig) OR the six flag inputs the
    # in-kernel eligibility needs (responds/moves body rows + layer/lmask/
    # active/sensor collider rows) — the unused set is not even streamed
    # into VMEM (they cost real bandwidth every grid step)
    *rest,
    C: int, margin: float, dt: float, partner_aware: bool, has_elig: bool,
):
    if has_elig:
        elig_r = rest[0]
        (partner_o, slot_act_o, count_o, count_touch_o, count_close_o,
         budget_o) = rest[1:]
        responds_r = moves_r = layer_r = lmask_r = active_r = sensor_r = None
    else:
        elig_r = None
        (responds_r, moves_r, layer_r, lmask_r, active_r,
         sensor_r) = rest[:6]
        (partner_o, slot_act_o, count_o, count_touch_o, count_close_o,
         budget_o) = rest[6:]
    posx, posy, ang = posx_r[:], posy_r[:], ang_r[:]
    velx, vely = velx_r[:], vely_r[:]
    cbody = cbody_r[:]
    radius = radius_r[:]
    Wb, M = cbody.shape

    # ---- swept AABBs per collider (SURVEY.md §3.2 step 1) ----
    ca_b, sa_b = jnp.cos(ang), jnp.sin(ang)
    px = lane_gather(posx, cbody)
    py = lane_gather(posy, cbody)
    ca = lane_gather(ca_b, cbody)
    sa = lane_gather(sa_b, cbody)
    vx = lane_gather(velx, cbody)
    vy = lane_gather(vely, cbody)

    lox = hix = loy = hiy = None
    V = vlx_r.shape[1]
    for v in range(V):  # padded verts repeat v0, so min/max over V are exact
        vlx = vlx_r[:, v, :]
        vly = vly_r[:, v, :]
        wx = px + ca * vlx - sa * vly
        wy = py + sa * vlx + ca * vly
        lox = wx if lox is None else jnp.minimum(lox, wx)
        hix = wx if hix is None else jnp.maximum(hix, wx)
        loy = wy if loy is None else jnp.minimum(loy, wy)
        hiy = wy if hiy is None else jnp.maximum(hiy, wy)
    sweep_x = jnp.abs(vx) * dt
    sweep_y = jnp.abs(vy) * dt
    # touch boxes: shape AABBs (incl. rounding radius) + a jitter slop —
    # candidates overlapping these are touching/penetrating NOW; dropping
    # one means a live contact goes unsolved (the hard overflow)
    tpad = radius + 0.1 * margin
    tlox = lox - tpad
    thix = hix + tpad
    tloy = loy - tpad
    thiy = hiy + tpad
    pad = radius + 0.5 * margin
    # close boxes: no velocity sweep — within the speculative contact margin
    # (imminent; forms within ~a frame at closing speed)
    clox = lox - pad
    chix = hix + pad
    cloy = loy - pad
    chiy = hiy + pad
    lox = clox - sweep_x
    hix = chix + sweep_x
    loy = cloy - sweep_y
    hiy = chiy + sweep_y

    # ---- dense eligibility+overlap mask [Wb, M(partner j), M(own i)] ----
    def as_i(x):  # own/row axis: lanes
        return x[:, None, :]

    def as_j(x):  # partner axis: sublanes (one relayout per quantity)
        return x[:, :, None]

    ov = (
        (as_j(lox) <= as_i(hix)) & (as_i(lox) <= as_j(hix))
        & (as_j(loy) <= as_i(hiy)) & (as_i(loy) <= as_j(hiy))
    )
    if has_elig:
        elig = elig_r[:] != 0
    else:
        layer = layer_r[:]
        lmask = lmask_r[:]
        active = active_r[:]
        sensor = sensor_r[:]
        responds = lane_gather(responds_r[:], cbody)  # inv_mass|inv_inertia>0
        moves = lane_gather(moves_r[:], cbody)  # responds or kinematic

        diff_body = as_j(cbody) != as_i(cbody)
        layer_ok = (
            ((as_i(lmask) >> as_j(layer)) & 1)
            & ((as_j(lmask) >> as_i(layer)) & 1)
        ) != 0
        both_active = (as_i(active) > 0) & (as_j(active) > 0)
        sensorish = (as_i(sensor) > 0) | (as_j(sensor) > 0)
        # row-eligibility: the OWN side must be able to respond (dynamic-ish)
        # or be a moving sensor; pairs where only the partner responds live
        # in the partner's row instead. Kinematic/static own rows would
        # apply nothing.
        row_ok = (as_i(responds) > 0) | ((as_i(sensor) > 0) & (as_i(moves) > 0))
        pair_moves = (as_i(moves) > 0) | (as_j(moves) > 0)
        elig = (diff_body & layer_ok & both_active & row_ok
                & (pair_moves | sensorish))
    mask = (ov & elig).astype(f32)
    # tier subsets (touch ⊂ close ⊂ swept): touching/penetrating candidates
    # take slots FIRST, then margin-imminent ones, then swept-speculative
    # ones — an overflowed row degrades gracefully, dropping the most
    # speculative candidates first. Only a TOUCH drop corrupts physics (a
    # live contact goes unsolved); close/spec drops are bounded staleness
    # (the pair re-enters at the next rebuild, forming its contact late).
    ov_touch = (
        (as_j(tlox) <= as_i(thix)) & (as_i(tlox) <= as_j(thix))
        & (as_j(tloy) <= as_i(thiy)) & (as_i(tloy) <= as_j(thiy))
    )
    ov_close = (
        (as_j(clox) <= as_i(chix)) & (as_i(clox) <= as_j(chix))
        & (as_j(cloy) <= as_i(chiy)) & (as_i(cloy) <= as_j(chiy))
    )
    if partner_aware:
        # Impulse-aware inflation (two-phase): a resting body hit by a
        # mover acquires up to ~the mover's speed, so a K-frame table built
        # from OWN speeds goes stale on the first momentum exchange (the
        # rollout's positional guard then forces a rebuild nearly every
        # frame in contact-rich scenes — measured r3). Phase 1's mask says
        # who can REACH collider i within the window at current speeds;
        # inflate i's box by the max positional budget over those partners
        # (sweeps MUST be symmetric in this mode: sweep_x == sweep_y ==
        # positional budget — enforced host-side in build_slot_tables) and
        # redo the swept-overlap test. Post-impulse motion at up-to-
        # neighborhood-max speed then stays inside the table's budget, which
        # budget_o reports for the guard to check.
        sweep = sweep_x
        ps = jnp.max(jnp.where(mask > 0, as_j(sweep), 0.0), axis=1)
        ns = jnp.maximum(sweep, ps)
        lox = clox - ns
        hix = chix + ns
        loy = cloy - ns
        hiy = chiy + ns
        ov = (
            (as_j(lox) <= as_i(hix)) & (as_i(lox) <= as_j(hix))
            & (as_j(loy) <= as_i(hiy)) & (as_i(loy) <= as_j(hiy))
        )
        mask = (ov & elig).astype(f32)
        budget_o[:] = ns
    else:
        budget_o[:] = jnp.minimum(sweep_x, sweep_y)
    mask_touch = (ov_touch & elig).astype(f32) * mask
    mask_close = (ov_close & elig).astype(f32) * mask
    mask_mid = mask_close - mask_touch
    mask_far = mask - mask_close

    # ---- rank partners within each row (touch, then close, then swept) ----
    # rank[w, j, i] = #{j' < j : mask[w, j', i]} = (LT @ mask_w)[j, i]
    jj = jax.lax.broadcasted_iota(i32, (M, M), 0)
    kk = jax.lax.broadcasted_iota(i32, (M, M), 1)
    lt = (kk < jj).astype(f32)  # strictly lower triangular

    def ranks(m):
        return jnp.stack([
            jax.lax.dot_general(lt, m[w], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            for w in range(Wb)
        ])  # [Wb, M, M]

    rank_t = ranks(mask_touch)
    rank_m = ranks(mask_mid)
    rank_f = ranks(mask_far)
    cnt_t = jnp.sum(mask_touch, axis=1, keepdims=True)  # [Wb, 1, M]
    cnt_m = jnp.sum(mask_mid, axis=1, keepdims=True)
    # one combined priority rank: tiers are disjoint by construction, each
    # queues after all candidates of the tiers above it
    crank = jnp.where(mask_touch > 0, rank_t,
                      jnp.where(mask_mid > 0, cnt_t + rank_m,
                                cnt_t + cnt_m + rank_f))

    # ---- rank-select the first C partners per row ----
    # (iota must be integer-typed for Mosaic; convert after)
    j_iota = jax.lax.broadcasted_iota(i32, (Wb, M, M), 1).astype(f32)
    parts = []
    acts = []
    for c in range(C):
        oh = jnp.where(crank == float(c), mask, 0.0)
        parts.append(jnp.sum(oh * j_iota, axis=1, keepdims=True))  # [Wb, 1, M]
        acts.append(jnp.sum(oh, axis=1, keepdims=True))
    partner_o[:] = jnp.concatenate(parts, axis=1).astype(i32)
    slot_act_o[:] = jnp.concatenate(acts, axis=1)
    count_o[:] = jnp.sum(mask, axis=1).astype(i32)
    # touch candidates are live contacts: rows where THESE exceed C have
    # dropped live physics (hard overflow). Rows where only count_close or
    # the total exceeds C dropped imminent/speculative candidates, which
    # re-enter at the next table rebuild (soft, bounded staleness)
    count_touch_o[:] = cnt_t[:, 0, :].astype(i32)
    count_close_o[:] = jnp.sum(mask_close, axis=1).astype(i32)


def _joint_slot_kernel(jba_r, jbb_r, jactive_r, partner_o, side_o, act_o,
                       count_o, *, JC: int):
    """Per-body joint slot tables: body n's jc-th joint row + which side of
    it n is on. Same rank-select machinery as the contact slots, over the
    (padded) joint axis on sublanes."""
    jba = jba_r[:]  # [Wb, Jp] i32
    jbb = jbb_r[:]
    jact = jactive_r[:]  # [Wb, Jp] f32 0/1
    Wb, Jp = jba.shape
    N = partner_o.shape[2]

    n_iota = jax.lax.broadcasted_iota(i32, (Wb, 1, N), 2)
    is_a = (jba[:, :, None] == n_iota) & (jact[:, :, None] > 0)  # [Wb, Jp, N]
    is_b = (jbb[:, :, None] == n_iota) & (jact[:, :, None] > 0)
    mask = (is_a | is_b).astype(f32)

    jj = jax.lax.broadcasted_iota(i32, (Jp, Jp), 0)
    kk = jax.lax.broadcasted_iota(i32, (Jp, Jp), 1)
    lt = (kk < jj).astype(f32)
    rank = jnp.stack([
        jax.lax.dot_general(lt, mask[w], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        for w in range(Wb)
    ])
    j_iota = jax.lax.broadcasted_iota(i32, (Wb, Jp, N), 1).astype(f32)
    is_a_f = is_a.astype(f32)
    parts, sides, acts = [], [], []
    for c in range(JC):
        oh = jnp.where(rank == float(c), mask, 0.0)
        parts.append(jnp.sum(oh * j_iota, axis=1, keepdims=True))
        sides.append(jnp.sum(oh * is_a_f, axis=1, keepdims=True))
        acts.append(jnp.sum(oh, axis=1, keepdims=True))
    partner_o[:] = jnp.concatenate(parts, axis=1).astype(i32)
    side_o[:] = jnp.concatenate(sides, axis=1)
    act_o[:] = jnp.concatenate(acts, axis=1)
    count_o[:] = jnp.sum(mask, axis=1).astype(i32)


@functools.partial(
    jax.jit,
    static_argnames=("n_bodies", "JC", "worlds_per_program", "interpret"),
)
def build_joint_slots(jba, jbb, jactive, n_bodies: int, *, JC: int,
                      worlds_per_program: int = 0, interpret: bool = False):
    """Per-body joint slot tables for a world batch.

    jba/jbb: [W, Jp] joint endpoint bodies (Jp padded to a 128-multiple);
    jactive: [W, Jp] f32. Returns (jslot [W, JC, N] i32 — joint row index,
    jside [W, JC, N] f32 — 1 when the body is endpoint A, jact [W, JC, N],
    count [W, N] i32)."""
    W, Jp = jba.shape
    N = n_bodies
    Wb = worlds_per_program
    if not Wb:
        if W <= 8:
            Wb = W  # block == array dim: always legal
        else:
            Wb = 32
            while Wb > 8 and (Jp * N * 4 * Wb > 8 * 1024 * 1024 or W % Wb):
                Wb //= 2

    kernel = functools.partial(_joint_slot_kernel, JC=JC)

    def jspec():
        return pl.BlockSpec((Wb, Jp), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def cspec():
        return pl.BlockSpec((Wb, JC, N), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)

    def nspec():
        return pl.BlockSpec((Wb, N), lambda w: (w, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(W // Wb,),
        in_specs=[jspec()] * 3,
        out_specs=(cspec(), cspec(), cspec(), nspec()),
        out_shape=(
            jax.ShapeDtypeStruct((W, JC, N), i32),
            jax.ShapeDtypeStruct((W, JC, N), f32),
            jax.ShapeDtypeStruct((W, JC, N), f32),
            jax.ShapeDtypeStruct((W, N), i32),
        ),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jba, jbb, jactive)


# Mosaic's default scoped-VMEM limit is 16 MB; the v5e core has far more, and
# the rank-select keeps ~16-20 [Wb, M, M] buffers live, so kernels here ask
# for a higher cap and the block picker budgets ~20 live mask-sized buffers.
_VMEM_LIMIT = 64 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def pick_worlds_per_program(n_worlds: int, m: int, budget_bytes=32 * 1024 * 1024):
    """Worlds per program: the [Wb, M, M] mask/rank working set is the VMEM
    driver (~20 live buffers through the rank-select). Mosaic requires the
    sublane block dim be divisible by 8, so Wb never drops below 8 (the
    raised vmem_limit_bytes absorbs the difference)."""
    if n_worlds <= 8:
        return n_worlds  # block == array dim: always legal
    wb = 32
    while wb > 8 and (wb * m * m * 4 * 20 > budget_bytes or n_worlds % wb != 0):
        wb //= 2
    return wb


@functools.partial(
    jax.jit,
    static_argnames=("C", "margin", "dt", "worlds_per_program", "interpret",
                     "partner_aware"),
)
def build_slot_tables(
    posx, posy, ang, velx, vely, responds, moves,  # [W, N]
    cbody, vlx, vly, radius, layer, lmask, active, sensor,  # [W, M] / [W, V, M]
    elig=None,  # [W, M, M] i8 from build_elig_mask (optional, amortizes)
    *, C: int, margin: float, dt: float, worlds_per_program: int = 0,
    interpret: bool = False, partner_aware: bool = False,
):
    """Build per-collider partner slot tables for a world batch.

    Returns ``(partner [W, C, M] i32, slot_active [W, C, M] f32,
    count [W, M] i32, count_touch [W, M] i32, count_close [W, M] i32,
    budget [W, M] f32)``. Overflowed rows (count > C) keep their first C
    partners in rank order: TOUCHING (shape AABBs overlapping now)
    candidates first, then margin-close (imminent) ones, then swept-
    speculative ones — ``count_touch > C`` is the hard overflow (a live
    contact went unsolved); ``count_close > C`` or ``count > C`` alone only
    drop imminent/speculative candidates (bounded staleness: they re-enter
    at the next rebuild, forming their contact late at the pair's closing
    speed). ``budget`` is the positional inflation each collider's
    swept box actually used — with ``partner_aware=True`` (K-frame mode)
    that budget also covers the max budget over phase-1 candidate partners,
    so impulse-acquired velocity stays in-table and the rollout's staleness
    guard (which checks displacement against this budget) fires rarely.

    ``partner_aware=True`` requires SYMMETRIC sweeps: pass the positional
    budget as ``velx`` and leave ``vely=None`` (it is reused for both axes).
    The two-phase inflation uses the x sweep for both axes; an asymmetric
    pair would silently under-inflate y, so asymmetric input is rejected
    statically (``vely`` is a static-None check, valid under jit — an ``is``
    identity test on traced arrays is not).
    """
    if partner_aware and vely is not None:
        raise ValueError(
            "build_slot_tables(partner_aware=True) needs symmetric sweeps: "
            "pass the positional-budget array as velx and vely=None "
            "(K-frame mode); asymmetric per-axis sweeps would silently "
            "under-inflate the y axis")
    if vely is None:
        vely = velx
    W, N = posx.shape
    M = cbody.shape[1]
    V = vlx.shape[1]
    Wb = worlds_per_program or pick_worlds_per_program(W, M)

    kernel = functools.partial(_slot_kernel, C=C, margin=margin, dt=dt,
                               partner_aware=partner_aware,
                               has_elig=elig is not None)

    def nspec():
        return pl.BlockSpec((Wb, N), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def mspec():
        return pl.BlockSpec((Wb, M), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def vspec():
        return pl.BlockSpec((Wb, V, M), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)

    def cspec():
        return pl.BlockSpec((Wb, C, M), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)

    def espec():
        return pl.BlockSpec((Wb, M, M), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [nspec()] * 5 + [mspec(), vspec(), vspec(), mspec()]
    operands = [posx, posy, ang, velx, vely, cbody, vlx, vly, radius]
    if elig is not None:
        # precomputed eligibility: the six flag inputs are NOT passed at all
        # (streaming them into VMEM every grid step costs bandwidth on the
        # very path the precompute exists to cheapen)
        in_specs.append(espec())
        operands.append(elig)
    else:
        in_specs += [nspec()] * 2 + [mspec()] * 4
        operands += [responds, moves, layer, lmask, active, sensor]

    partner, slot_act, count, count_touch, count_close, budget = pl.pallas_call(
        kernel,
        grid=(W // Wb,),
        in_specs=in_specs,
        out_specs=(cspec(), cspec(), mspec(), mspec(), mspec(), mspec()),
        out_shape=(
            jax.ShapeDtypeStruct((W, C, M), i32),
            jax.ShapeDtypeStruct((W, C, M), f32),
            jax.ShapeDtypeStruct((W, M), i32),
            jax.ShapeDtypeStruct((W, M), i32),
            jax.ShapeDtypeStruct((W, M), i32),
            jax.ShapeDtypeStruct((W, M), f32),
        ),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(*operands)
    return partner, slot_act, count, count_touch, count_close, budget
