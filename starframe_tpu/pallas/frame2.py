"""Whole-frame slot kernel v2: worlds on sublanes, entities on lanes.

Round 1's whole-frame kernel (frame.py) kept state VMEM-resident but moved
data with per-world one-hot MXU dots; at one-dot-per-carry granularity those
measured 4-11 us each and were ~97% of kernel time. This rewrite applies the
round-1 microbenchmark findings (PROFILE.md):

- **Layout**: every array is ``[Wb, lanes]`` — a block of Wb worlds on the
  sublane axis, bodies/colliders on the lane axis. All per-slot math is
  identical across worlds, so the VPU is perfectly tiled.
- **Gathers**: body->slot pose reads are in-register lane gathers
  (lanegather.py), ~10 cycles per [8, 256] component instead of a dot.
- **Accumulation**: slot->body writes need NO scatter and NO per-pair
  one-hot: each *dynamic collider owns its slots* (slots.py), so summing a
  body's corrections is a sum over its C slot slices — contiguous adds —
  followed by one small collider->body matmul (identity when each body has
  one collider).
- **Narrowphase once per frame** (reference pipeline order, SURVEY.md §3.2:
  broadphase -> narrowphase -> substeps): manifolds are built at frame-start
  poses with a velocity-expanded speculative margin (Box2D-style), anchors
  stored body-local; substeps re-project anchors at current poses. Round 1
  refreshed manifolds per substep, which cost ~800 P-ops x 10 substeps.

Every contact pair (i, j) between dynamic bodies is processed twice — once
in i's row (computing i's correction) and once in j's row — trading ~2x
manifold math for conflict-free, gather/scatter-free accumulation. Static
and kinematic colliders own no rows (their corrections are zero), so a
ground slab touching hundreds of bodies costs nothing.

**Joints** ride the same design: each body owns JC joint slots (slots.py
``build_joint_slots``), canonicalized so the own body is endpoint A
(kernels.solve_joints_b). With ``joint_solver='colored'`` (the default) the
kernel runs graph-colored Gauss-Seidel IN-KERNEL: one masked sequential pass
per color (colors computed host-side at build time, clamped to the scene's
true chromatic count by scenes.base.tighten_joint_colors), matching the XLA
path's colored solve; ``joint_solver='jacobi'`` keeps the averaged-Jacobi
fallback fused with the contact accumulation.

Batch-uniformity: by default the collider->body reduction uses world 0's
topology for the whole block as one MXU dot (worlds built by
``replicate_world``/same-shape builders satisfy this).
``SolverConfig.batch_uniform_topology=False`` switches the reduction to
PER-WORLD owner tables (``parallel.collider_owner_tables`` — each body's
collider rows gathered and mask-summed on the VPU, capacity
``cfg.max_colliders_per_body`` with an ``owner_overflow`` hard counter), so
heterogeneous batches — e.g. domain-randomized compounds — keep kernel
speed instead of falling to ``vmap(step)``.
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
    solve_joints_b,
    velocity_contacts_b,
    velocity_joints_b,
)
from ..state import JOINT_ANGLE_RANGE
from .lanegather import lane_gather

f32 = jnp.float32
i32 = jnp.int32


def _frame2_kernel(
    # body-level [Wb, N]
    posx_r, posy_r, ang_r, velx_r, vely_r, angvel_r,
    invm_r, invi_r, dyn_r, kin_r, bullet_r,
    # collider-level [Wb, M] (verts [Wb, V, M])
    cbody_r, vlx_r, vly_r, nverts_r, radius_r, fric_r, rest_r, sensor_r,
    # contact slot tables [Wb, C, M]
    partner_r, slot_act_r,
    # with uniform=False: owner tables [Wb, Kc, N] (bcol i32, bmask f32),
    # then joint params [Wb, Jp] + joint slots [Wb, JC, N] (when
    # has_joints), then gravity [Wb, 2] and the output refs
    *rest,
    C: int, JC: int, has_joints: bool, substeps: int, iterations: int,
    h: float, dt: float, margin: float, compliance: float, relaxation: float,
    max_dpos: float, rest_threshold: float, lin_damp: float, ang_damp: float,
    joint_solver: str = "jacobi", n_colors: int = 1,
    max_dpos_joint: float = 1e3, ccd: bool = False, ccd_slop: float = 0.005,
    uniform: bool = True, Cs: int = 0,
):
    compact = 0 < Cs < C
    if not uniform:
        bcol_r, bmask_r = rest[:2]
        rest = rest[2:]
    if has_joints:
        (jtype_r, jba_r, jbb_r, jaax_r, jaay_r, jabx_r, jaby_r, jrest_r,
         jlo_r, jhi_r, jcomp_r, jdamp_r, jms_r, jmm_r, jcolor_r,
         jslot_r, jside_r, jact_r, grav_r,
         oposx_r, oposy_r, oang_r, ovelx_r, ovely_r, oangvel_r, otouched_r,
         *orest) = rest
    else:
        (grav_r, oposx_r, oposy_r, oang_r, ovelx_r, ovely_r, oangvel_r,
         otouched_r, *orest) = rest
    opartner_r, onact_r = orest if compact else (None, None)

    px, py, an = posx_r[:], posy_r[:], ang_r[:]
    vx, vy, om = velx_r[:], vely_r[:], angvel_r[:]
    invm, invi = invm_r[:], invi_r[:]
    dyn, kin = dyn_r[:], kin_r[:]
    bullet = bullet_r[:]
    cbody = cbody_r[:]
    nverts = nverts_r[:]
    radius = radius_r[:]
    Wb, N = px.shape
    M = cbody.shape[1]
    V = vlx_r.shape[1]
    grav = grav_r[:]
    gx = grav[:, 0:1]  # [Wb, 1] — per-world gravity (round 1 used world 0's)
    gy = grav[:, 1:2]

    # ---- slot packing helpers ------------------------------------------------
    # All C contact slots live on ONE packed lane axis [Wb, C*M] (and all JC
    # joint slots on [Wb, JC*N]): at M=256 a single-slot op is only a few
    # vregs, so a per-slot Python loop is op-issue-bound on the VPU; packing
    # widens every op C-fold and cuts its issue count C-fold (the frame2
    # analogue of the tile engine's sublane packing — PROFILE.md cost model,
    # FUTURE.md lever 1a).
    def _tile_w(x, k):  # [Wb, M] -> [Wb, k*M]: own-side quantity per slot
        return x if k == 1 else jnp.concatenate([x] * k, axis=-1)

    def _sum_w(x, k):  # [..., k*M] -> [..., M]: reduce packed slots
        if k == 1:
            return x
        acc = x[..., 0:M]
        for c in range(1, k):
            acc = acc + x[..., c * M:(c + 1) * M]
        return acc

    def _min_w(x, k):  # [..., k*M] -> [..., M]: min over packed slots
        if k == 1:
            return x
        acc = x[..., 0:M]
        for c in range(1, k):
            acc = jnp.minimum(acc, x[..., c * M:(c + 1) * M])
        return acc

    def tile_c(x):  # table width (frame setup)
        return _tile_w(x, C)

    def sum_c(x):
        return _sum_w(x, C)

    # ---- frame constants ----------------------------------------------------
    if uniform:
        # collider->body reduction matrix from world 0's topology (identity
        # when each body owns one collider — the batched-RL case); one
        # [4*Wb, M] x [M, N] dot rides the otherwise-idle MXU
        cb0 = jnp.swapaxes(cbody[0:1, :], 0, 1)  # [M, 1]
        oh_bc = (jax.lax.broadcasted_iota(i32, (M, N), 1) == cb0).astype(f32)

        def col_to_body(x):  # [Wb, M] -> [Wb, N] sum over owned colliders
            return jax.lax.dot_general(
                x, oh_bc, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def to_bodies(vals):  # [4, Wb, M] slot-row sums -> [4, Wb, N]
            flat = vals.reshape(4 * Wb, M)
            out = jax.lax.dot_general(
                flat, oh_bc, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            return out.reshape(4, Wb, N)
    else:
        # PER-WORLD topology (heterogeneous batches, e.g. domain-randomized
        # compounds): owner tables list each body's collider rows, and the
        # reduction becomes Kc masked lane gathers per quantity — VPU work
        # instead of a free MXU dot, so the uniform path stays the default
        bcol = bcol_r[:]  # [Wb, Kc, N] i32 collider row per (body, k)
        bmask = bmask_r[:]  # [Wb, Kc, N] f32 0/1 (k < body's collider count)
        Kc_own = bcol.shape[1]

        def col_to_body(x):  # [Wb, M] -> [Wb, N] per-world owner gather-sum
            acc = None
            for k in range(Kc_own):
                g = lane_gather(x, bcol[:, k, :]) * bmask[:, k, :]
                acc = g if acc is None else acc + g
            return acc

        def to_bodies(vals):  # [4, Wb, M] -> [4, Wb, N]
            return jnp.stack([col_to_body(vals[q]) for q in range(4)])

    ca_b, sa_b = jnp.cos(an), jnp.sin(an)
    o_px = lane_gather(px, cbody)
    o_py = lane_gather(py, cbody)
    o_ca = lane_gather(ca_b, cbody)
    o_sa = lane_gather(sa_b, cbody)
    o_invm = lane_gather(invm, cbody)
    o_invi = lane_gather(invi, cbody)
    # conservative per-collider speed bound for the speculative margin
    ext = None
    for v in range(V):
        d = jnp.sqrt(vlx_r[:, v, :] ** 2 + vly_r[:, v, :] ** 2)
        ext = d if ext is None else jnp.maximum(ext, d)
    ext = ext + radius
    spd_b = jnp.sqrt(vx * vx + vy * vy)
    o_spd = lane_gather(spd_b, cbody) + jnp.abs(lane_gather(om, cbody)) * ext

    # ---- packed frame setup: partner gathers + manifolds ([Wb, C*M]) -------
    pc = jnp.concatenate(
        [partner_r[:, c, :] for c in range(C)], axis=-1) if C > 1 \
        else partner_r[:, 0, :]  # [Wb, C*M] i32 partner collider
    act = jnp.concatenate(
        [slot_act_r[:, c, :] for c in range(C)], axis=-1) if C > 1 \
        else slot_act_r[:, 0, :]  # [Wb, C*M] f32 0/1
    pb = lane_gather(cbody, pc)  # partner body [Wb, C*M]
    p_px = lane_gather(px, pb)
    p_py = lane_gather(py, pb)
    p_ca = lane_gather(ca_b, pb)
    p_sa = lane_gather(sa_b, pb)
    p_spd = lane_gather(spd_b, pb) + jnp.abs(lane_gather(om, pb)) * lane_gather(ext, pc)
    o_px_t, o_py_t = tile_c(o_px), tile_c(o_py)
    o_ca_t, o_sa_t = tile_c(o_ca), tile_c(o_sa)

    own_wx, own_wy, par_wx, par_wy = [], [], [], []
    for v in range(V):
        ovx, ovy = vlx_r[:, v, :], vly_r[:, v, :]
        # own world verts once per collider [Wb, M], tiled to the slot axis
        own_wx.append(tile_c(o_px + o_ca * ovx - o_sa * ovy))
        own_wy.append(tile_c(o_py + o_sa * ovx + o_ca * ovy))
        pvx = lane_gather(ovx, pc)
        pvy = lane_gather(ovy, pc)
        par_wx.append(p_px + p_ca * pvx - p_sa * pvy)
        par_wy.append(p_py + p_sa * pvx + p_ca * pvy)
    wvax = jnp.stack(own_wx)  # [V, Wb, C*M]
    wvay = jnp.stack(own_wy)
    wvbx = jnp.stack(par_wx)
    wvby = jnp.stack(par_wy)

    # velocity-expanded speculative margin: a contact that will form
    # during THIS frame's substeps must already be in the manifold
    margin_eff = margin + dt * (tile_c(o_spd) + p_spd)
    m = manifold_batch(
        wvax, wvay, tile_c(nverts), tile_c(radius),
        wvbx, wvby, lane_gather(nverts, pc), lane_gather(radius, pc),
        margin_eff,
    )
    # body-local anchors and normal (rotate by -angle at frame start)
    dxa = m.wa_x - o_px_t[None]
    dya = m.wa_y - o_py_t[None]
    a_ax = o_ca_t[None] * dxa + o_sa_t[None] * dya
    a_ay = -o_sa_t[None] * dxa + o_ca_t[None] * dya
    dxb = m.wb_x - p_px[None]
    dyb = m.wb_y - p_py[None]
    b_ax = p_ca[None] * dxb + p_sa[None] * dyb
    b_ay = -p_sa[None] * dxb + p_ca[None] * dyb
    n_ax = o_ca_t * m.n_x + o_sa_t * m.n_y
    n_ay = -o_sa_t * m.n_x + o_ca_t * m.n_y
    pmask = m.pmask * act[None]
    p_sensor = lane_gather(sensor_r[:], pc)
    solvable = act * (1.0 - jnp.maximum(tile_c(sensor_r[:]), p_sensor))
    cb_ = SimpleNamespace(
        n_ax=n_ax, n_ay=n_ay, a_ax=a_ax, a_ay=a_ay, b_ax=b_ax, b_ay=b_ay,
        solve_mask=pmask * solvable[None], pmask=pmask, sep=m.sep,
    )
    pd_ = SimpleNamespace(
        friction=jnp.sqrt(tile_c(fric_r[:]) * lane_gather(fric_r[:], pc)),
        restitution=jnp.maximum(tile_c(rest_r[:]), lane_gather(rest_r[:], pc)),
        inv_mass_a=tile_c(o_invm),
        inv_mass_b=lane_gather(invm, pb),
        inv_inertia_a=tile_c(o_invi),
        inv_inertia_b=lane_gather(invi, pb),
    )

    # ---- packed joint slots [Wb, JC*N] (frame-constant canonical params) ----
    def tile_j(x):  # [Wb, N] -> [Wb, JC*N]: own-side body quantity per slot
        return x if JC == 1 else jnp.concatenate([x] * JC, axis=-1)

    def sum_j(x):  # [..., JC*N] -> [..., N]
        if JC == 1:
            return x
        acc = x[..., 0:N]
        for jc in range(1, JC):
            acc = acc + x[..., jc * N:(jc + 1) * N]
        return acc

    jpack = None
    if has_joints:
        jtype = jtype_r[:]
        jba = jba_r[:]
        jbb = jbb_r[:]
        js = jnp.concatenate(
            [jslot_r[:, jc, :] for jc in range(JC)], axis=-1) if JC > 1 \
            else jslot_r[:, 0, :]  # [Wb, JC*N] joint row per body-slot
        side = jnp.concatenate(
            [jside_r[:, jc, :] for jc in range(JC)], axis=-1) if JC > 1 \
            else jside_r[:, 0, :]  # 1 when own body is endpoint A
        jact = jnp.concatenate(
            [jact_r[:, jc, :] for jc in range(JC)], axis=-1) if JC > 1 \
            else jact_r[:, 0, :]
        side_b = side > 0

        def jg(src_ref):
            return lane_gather(src_ref[:], js)

        ty = lane_gather(jtype, js)
        ba = lane_gather(jba, js)
        bb = lane_gather(jbb, js)
        pb_j = jnp.where(side_b, bb, ba)
        aax = jg(jaax_r)
        aay = jg(jaay_r)
        abx = jg(jabx_r)
        aby = jg(jaby_r)
        rest_j = jg(jrest_r)
        lo_j = jg(jlo_r)
        hi_j = jg(jhi_r)
        ms = jg(jms_r)
        # swap canonicalization: distance length bounds are symmetric;
        # angular quantities (weld rest, angle-range bounds, motor speed)
        # negate when the own body is endpoint B
        keep_rng = side_b | (ty != JOINT_ANGLE_RANGE)
        jcol = lane_gather(jcolor_r[:], js)
        jd_all = SimpleNamespace(
            jtype=ty,
            oax=jnp.where(side_b, aax, abx),
            oay=jnp.where(side_b, aay, aby),
            pax=jnp.where(side_b, abx, aax),
            pay=jnp.where(side_b, aby, aay),
            rest=jnp.where(side_b, rest_j, -rest_j),
            lo=jnp.where(keep_rng, lo_j, -hi_j),
            hi=jnp.where(keep_rng, hi_j, -lo_j),
            compliance=jg(jcomp_r),
            damping=jg(jdamp_r),
            motor_speed=jnp.where(side_b, ms, -ms),
            motor_max=jg(jmm_r),
            im_o=tile_j(invm), im_p=lane_gather(invm, pb_j),
            ii_o=tile_j(invi), ii_p=lane_gather(invi, pb_j),
            active=jact,
        )
        jpack = SimpleNamespace(pb=pb_j, jd=jd_all, color=jcol)

    touch0 = jnp.max((m.sep < TOUCH_SLOP).astype(f32) * pmask, axis=0)

    # ---- per-frame solve-slot compaction (r5 — the frame2 analogue of the
    # tile engine's r4 lever): manifolds are frame-frozen, so only slots
    # with a pmask-active point can contribute to ANY substep, and the mean
    # active count is far below the K-frame table width C (measured 1.24 vs
    # C=16 on the flagship batch). Rank-select the Cs closest candidates
    # per collider (three tiers: touching now < imminent (sep < margin) <
    # speculative-active; empty last) and run the 10-substep loop at the
    # COMPACTED packing — every per-substep op narrows C/Cs-fold. The rank
    # permutation is applied with ONE in-register lane gather per array.
    # Counters (onact_r): [.., 0, :] = imminent count (drop beyond Cs =
    # HARD solve_overflow), [.., 1, :] = pmask-active count (soft
    # solve_dropped — a dropped speculative manifold produces zero impulse
    # this frame and re-enters at the next frame's manifolds).
    if compact:
        BIGS = jnp.float32(1e9)
        pm_any = jnp.max(pmask, axis=0)  # [Wb, C*M]
        sep_min = jnp.min(jnp.where(pmask > 0, m.sep, BIGS), axis=0)
        tier = jnp.where(touch0 > 0, 0.0,
                         jnp.where((sep_min < margin) & (pm_any > 0), 1.0,
                                   jnp.where(pm_any > 0, 2.0, 3.0)))

        def sl(x, c):
            return x[:, c * M:(c + 1) * M]

        # lexicographic rank over (tier, sep, slot index) — exact total
        # order, C^2 [Wb, M] comparisons once per frame
        rank = [None] * C
        for c in range(C):
            acc = None
            tc = sl(tier, c)
            sc = sl(sep_min, c)
            for c2 in range(C):
                if c2 == c:
                    continue
                t2 = sl(tier, c2)
                s2 = sl(sep_min, c2)
                before = (t2 < tc) | ((t2 == tc)
                                      & ((s2 < sc)
                                         | ((s2 == sc) & (c2 < c))))
                b32 = before.astype(i32)
                acc = b32 if acc is None else acc + b32
            rank[c] = acc
        lane_m = jax.lax.broadcasted_iota(i32, (Wb, M), 1)
        src_abs = []
        for s in range(Cs):
            slot = None
            for c in range(C):
                t = jnp.where(rank[c] == s, jnp.int32(c), 0)
                slot = t if slot is None else slot + t
            src_abs.append(slot * M + lane_m)
        src_abs = jnp.concatenate(src_abs, axis=-1)  # [Wb, Cs*M]

        def cpk(x):  # [Wb, C*M] -> [Wb, Cs*M] via the rank permutation
            return lane_gather(x, src_abs)

        def cpk2(x):  # [P, Wb, C*M] -> [P, Wb, Cs*M]
            return jnp.stack([cpk(x[p]) for p in range(x.shape[0])])

        onact_r[:, 0, :] = _sum_w((tier <= 1.0).astype(f32), C)
        onact_r[:, 1, :] = _sum_w((tier <= 2.0).astype(f32), C)
        pc = cpk(pc)
        pb = cpk(pb)
        touch0 = cpk(touch0)
        for s in range(Cs):
            opartner_r[:, s, :] = pc[:, s * M:(s + 1) * M]
        cb_ = SimpleNamespace(
            n_ax=cpk2(cb_.n_ax), n_ay=cpk2(cb_.n_ay),
            a_ax=cpk2(cb_.a_ax), a_ay=cpk2(cb_.a_ay),
            b_ax=cpk2(cb_.b_ax), b_ay=cpk2(cb_.b_ay),
            solve_mask=cpk2(cb_.solve_mask), pmask=cpk2(cb_.pmask),
            sep=cpk2(cb_.sep),
        )
        pd_ = SimpleNamespace(
            friction=cpk(pd_.friction), restitution=cpk(pd_.restitution),
            inv_mass_a=cpk(pd_.inv_mass_a), inv_mass_b=cpk(pd_.inv_mass_b),
            inv_inertia_a=cpk(pd_.inv_inertia_a),
            inv_inertia_b=cpk(pd_.inv_inertia_b),
        )
    Cp = Cs if compact else C

    def tile_cp(x):  # solve width (substep loop)
        return _tile_w(x, Cp)

    def sum_cp(x):
        return _sum_w(x, Cp)

    def min_cp(x):
        return _min_w(x, Cp)

    def joint_pose(cab, sab, px, py, an):
        """Own pose is the body lane itself (tiled); the partner is gathered."""
        pbj = jpack.pb
        return PairPose(
            tile_j(px), tile_j(py), tile_j(cab), tile_j(sab),
            lane_gather(px, pbj), lane_gather(py, pbj),
            lane_gather(cab, pbj), lane_gather(sab, pbj),
        ), lane_gather(an, pbj)

    def slot_pose(cab, sab, px, py):
        """Packed pair poses: own side gathered once per collider and tiled,
        partner side gathered at the packed (solve-width) slot indices."""
        return PairPose(
            tile_cp(lane_gather(px, cbody)), tile_cp(lane_gather(py, cbody)),
            tile_cp(lane_gather(cab, cbody)), tile_cp(lane_gather(sab, cbody)),
            lane_gather(px, pb), lane_gather(py, pb),
            lane_gather(cab, pb), lane_gather(sab, pb),
        )

    # ---- substep loop --------------------------------------------------------
    # The static-friction reference (substep-start anchor world positions) is
    # CARRIED from the previous substep's velocity-pass kinematics: the
    # end-of-substep pose IS the next substep's start pose, so recomputing a
    # slot_pose (8 lane gathers) + _pair_kinematics (~16 [2, P] passes) per
    # substep would be pure duplication (measured r3: the kernel is
    # VPU-pass-bound).
    # CCD frame constant: own collider's body is bullet-flagged ([Wb, C*M])
    blt_t = tile_cp(lane_gather(bullet, cbody)) if ccd else None

    def substep(_, carry):
        if ccd:
            (px, py, an, vx, vy, om, touched,
             nx0, ny0, wax0, way0, wbx0, wby0) = carry
        else:
            px, py, an, vx, vy, om, touched, wax0, way0, wbx0, wby0 = carry
        px0, py0, an0 = px, py, an  # substep-start pose (CCD reference)

        # integrate (semi-implicit Euler)
        vx = vx + gx * h * dyn
        vy = vy + gy * h * dyn
        px = px + vx * h
        py = py + vy * h
        an = an + om * h
        vtx, vty, vtom = vx, vy, om  # v_tilde

        if ccd:
            # continuous collision (cfg.ccd): clamp flagged bullets'
            # integrated advance at their earliest TOI against the frame
            # manifolds — the slot-form twin of kernels.bullet_advance_scale
            # (see its docstring; solver.substep:317 is the XLA caller).
            # Velocities are NOT scaled: restitution must see the true
            # approach speed at the clamped pose. The substep-start anchor
            # kinematics (wax0.., nx0/ny0) are carried from the previous
            # velocity pass, so only the integrated pose costs new gathers.
            cab1, sab1 = jnp.cos(an), jnp.sin(an)
            kin1 = _pair_kinematics(cb_, slot_pose(cab1, sab1, px, py))
            wax1, way1, wbx1, wby1 = kin1[6], kin1[7], kin1[8], kin1[9]
            nxp, nyp = nx0[None], ny0[None]  # [1, Wb, C*M] frame-start side
            c0 = (wbx0 - wax0) * nxp + (wby0 - way0) * nyp  # [2, Wb, C*M]
            c1 = (wbx1 - wax1) * nxp + (wby1 - way1) * nyp
            advance = c0 - c1  # > 0 where the pair closes this substep
            allowed = jnp.maximum(c0, 0.0) + ccd_slop
            need = (advance > allowed) & (cb_.solve_mask > 0.0)
            f_pt = jnp.where(need, allowed / jnp.maximum(advance, 1e-10), 1.0)
            # min over the 2 points, then this row's C slots -> [Wb, M];
            # only bullet-owned rows clamp
            f_slot = jnp.where(blt_t > 0, jnp.minimum(f_pt[0], f_pt[1]), 1.0)
            f_col = min_cp(f_slot)
            # collider -> body: sum of (1 - f) over a body's colliders upper-
            # bounds max(1 - f), so the clamp is EXACT for single-collider
            # bullets (the projectile case) and conservative (stops earlier,
            # never later) for compound bullets
            neg = col_to_body(1.0 - f_col)  # [Wb, N]
            f_body = jnp.clip(1.0 - neg, 0.0, 1.0)
            hit = f_body < 1.0  # where() keeps unclamped bodies bitwise same
            px = jnp.where(hit, px0 + f_body * (px - px0), px)
            py = jnp.where(hit, py0 + f_body * (py - py0), py)
            an = jnp.where(hit, an0 + f_body * (an - an0), an)

        dxx = jnp.zeros_like(px)
        dxy = jnp.zeros_like(py)
        dth = jnp.zeros_like(an)
        lam_n = jnp.zeros_like(cb_.sep)  # [2, Wb, C*M]
        for _it in range(iterations):
            cab, sab = jnp.cos(an), jnp.sin(an)
            pose = slot_pose(cab, sab, px, py)
            vals_a, _, lam_i = solve_contacts_b(
                pose, None, pd_, cb_, h, compliance,
                kin0=(wax0, way0, wbx0, wby0))
            lam_n = lam_n + lam_i
            ab = to_bodies(sum_cp(vals_a))  # [4, Wb, N]
            if jpack is not None and joint_solver == "jacobi":
                # joints: averaged Jacobi fused with the contact apply
                pose_j, an_p = joint_pose(cab, sab, px, py, an)
                ab = ab + sum_j(
                    solve_joints_b(pose_j, tile_j(an), an_p, jpack.jd, h))
            cnt = jnp.maximum(ab[3], 1.0)
            ddx = jnp.clip(ab[0] * relaxation / cnt, -max_dpos, max_dpos)
            ddy = jnp.clip(ab[1] * relaxation / cnt, -max_dpos, max_dpos)
            dda = jnp.clip(ab[2] * relaxation / cnt, -max_dpos, max_dpos)
            px = px + ddx
            py = py + ddy
            an = an + dda
            dxx = dxx + ddx
            dxy = dxy + ddy
            dth = dth + dda
            if jpack is not None and joint_solver == "colored":
                # graph-colored Gauss-Seidel (BASELINE.json:5): same-color
                # joints share no dynamic body, so each color batch applies
                # EXACTLY; poses refresh between colors. Mirrors
                # solver.substep's colored branch; the final color sweeps
                # any colors beyond the static bound (count-normalized).
                for color in range(n_colors):
                    cab2, sab2 = jnp.cos(an), jnp.sin(an)
                    last = color == n_colors - 1
                    cmask = (jpack.color >= color) if last else (
                        jpack.color == color)
                    jd = SimpleNamespace(**vars(jpack.jd))
                    jd.active = jpack.jd.active * cmask.astype(f32)
                    pose_j, an_p = joint_pose(cab2, sab2, px, py, an)
                    abj = sum_j(solve_joints_b(pose_j, tile_j(an), an_p, jd, h))
                    cntj = jnp.maximum(abj[3], 1.0)
                    # joints are constraint maintenance, not depenetration:
                    # clipped by the raw max_dpos, not the rate cap
                    jdx = jnp.clip(abj[0] / cntj, -max_dpos_joint,
                                   max_dpos_joint)
                    jdy = jnp.clip(abj[1] / cntj, -max_dpos_joint,
                                   max_dpos_joint)
                    jda = jnp.clip(abj[2] / cntj, -max_dpos_joint,
                                   max_dpos_joint)
                    px = px + jdx
                    py = py + jdy
                    an = an + jda
                    dxx = dxx + jdx
                    dxy = dxy + jdy
                    dth = dth + jda

        # velocity reconstruction (kinematic bodies keep their velocity)
        nk = 1.0 - kin
        vx = kin * vx + nk * (vtx + dxx / h)
        vy = kin * vy + nk * (vty + dxy / h)
        om = kin * om + nk * (vtom + dth / h)

        # velocity pass: restitution + dynamic friction + motors/damping
        cab, sab = jnp.cos(an), jnp.sin(an)
        pose_v = slot_pose(cab, sab, px, py)
        kin_v = _pair_kinematics(cb_, pose_v)
        pvel = PairVel(
            tile_cp(lane_gather(vx, cbody)), tile_cp(lane_gather(vy, cbody)),
            tile_cp(lane_gather(om, cbody)),
            lane_gather(vx, pb), lane_gather(vy, pb), lane_gather(om, pb),
        )
        pvel0 = PairVel(
            tile_cp(lane_gather(vtx, cbody)), tile_cp(lane_gather(vty, cbody)),
            tile_cp(lane_gather(vtom, cbody)),
            lane_gather(vtx, pb), lane_gather(vty, pb), lane_gather(vtom, pb),
        )
        cv_a, _ = velocity_contacts_b(
            pose_v, pvel, pvel0, pd_, cb_, lam_n, h, rest_threshold,
            kin=kin_v)
        abv = to_bodies(sum_cp(cv_a))
        tk = jnp.max((lam_n > 0.0).astype(f32) * cb_.pmask, axis=0)
        touched = jnp.maximum(touched, tk)
        if jpack is not None:
            pose_j, _ = joint_pose(cab, sab, px, py, an)
            pvel_j = PairVel(
                tile_j(vx), tile_j(vy), tile_j(om),
                lane_gather(vx, jpack.pb), lane_gather(vy, jpack.pb),
                lane_gather(om, jpack.pb))
            abv = abv + sum_j(velocity_joints_b(pose_j, pvel_j, jpack.jd, h))
        cntv = jnp.maximum(abv[3], 1.0)
        vx = vx + abv[0] / cntv
        vy = vy + abv[1] / cntv
        om = om + abv[2] / cntv
        if lin_damp > 0.0:
            sdamp = 1.0 / (1.0 + h * lin_damp)
            vx = vx * sdamp
            vy = vy * sdamp
        if ang_damp > 0.0:
            om = om * (1.0 / (1.0 + h * ang_damp))
        # kin_v's anchor world positions are exactly the NEXT substep's
        # static-friction reference (positions don't move after the
        # velocity pass); with CCD the normals there double as the next
        # substep's frame-start TOI side convention
        if ccd:
            return (px, py, an, vx, vy, om, touched, kin_v[0], kin_v[1],
                    kin_v[6], kin_v[7], kin_v[8], kin_v[9])
        return (px, py, an, vx, vy, om, touched,
                kin_v[6], kin_v[7], kin_v[8], kin_v[9])

    ca0b, sa0b = jnp.cos(an), jnp.sin(an)
    kin00 = _pair_kinematics(cb_, slot_pose(ca0b, sa0b, px, py))
    if ccd:
        carry = (px, py, an, vx, vy, om, touch0, kin00[0], kin00[1],
                 kin00[6], kin00[7], kin00[8], kin00[9])
    else:
        carry = (px, py, an, vx, vy, om, touch0,
                 kin00[6], kin00[7], kin00[8], kin00[9])
    px, py, an, vx, vy, om, touched, *_ = jax.lax.fori_loop(
        0, substeps, substep, carry)
    oposx_r[:] = px
    oposy_r[:] = py
    oang_r[:] = an
    ovelx_r[:] = vx
    ovely_r[:] = vy
    oangvel_r[:] = om
    for c in range(Cp):  # unpack the lane-packed slots back to [Wb, Cp, M]
        otouched_r[:, c, :] = touched[:, c * M:(c + 1) * M]


def pick_frame_worlds(n_worlds: int, m: int, c: int, budget=6 * 1024 * 1024):
    """Worlds per program: slice storage (~26 [Wb, M] arrays per slot slice)
    is the VMEM driver."""
    if n_worlds <= 8:
        return n_worlds  # block == array dim: always legal
    # Mosaic needs the sublane block dim divisible by 8: floor at 8
    wb = 16
    while wb > 8 and (26 * c * wb * m * 4 > budget or n_worlds % wb != 0):
        wb //= 2
    return wb


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "JC", "substeps", "iterations", "h", "dt", "margin", "compliance",
        "relaxation", "max_dpos", "rest_threshold", "lin_damp", "ang_damp",
        "joint_solver", "n_colors", "max_dpos_joint", "ccd", "ccd_slop",
        "worlds_per_program", "interpret", "Cs",
    ),
)
def run_frame2(
    posx, posy, ang, velx, vely, angvel, invm, invi, dyn, kin,  # [W, N]
    cbody, vlx, vly, nverts, radius, fric, rest, sensor,  # [W, M] / [W, V, M]
    partner, slot_act,  # [W, C, M]
    joints=None,  # dict of [W, Jp] param arrays + [W, JC, N] slot tables
    gravity=None,  # [W, 2]
    bullet=None,  # [W, N] f32 0/1 (required when ccd=True)
    owner=None,  # (bcol [W, Kc, N] i32, bmask [W, Kc, N] f32): per-world
                 # collider-owner tables — heterogeneous-topology batches
                 # (parallel.collider_owner_tables); None = world 0's
                 # topology for the whole batch (the uniform default)
    *, C, JC=0, substeps, iterations, h, dt, margin, compliance, relaxation,
    max_dpos, rest_threshold, lin_damp, ang_damp,
    joint_solver: str = "jacobi", n_colors: int = 1,
    max_dpos_joint: float = 1e3, ccd: bool = False, ccd_slop: float = 0.005,
    worlds_per_program: int = 0, interpret: bool = False, Cs: int = 0,
):
    """Run one frame's XPBD substeps for a world batch. Returns
    ``(posx, posy, ang, velx, vely, angvel, touched[W, Cp, M])`` where
    ``Cp = Cs`` with per-frame solve-slot compaction (``0 < Cs < C`` — see
    the in-kernel compaction comment) else ``C``; with compaction two more
    outputs follow: ``partner_solve [W, Cs, M]`` i32 (the compacted
    partner-collider table ``touched`` indexes — feed it wherever the
    build-time ``partner`` table was used against ``touched``) and
    ``nact [W, 2, M]`` f32 (imminent / pmask-active candidate counts per
    collider, for the HARD ``solve_overflow`` / soft ``solve_dropped``
    counters)."""
    W, N = posx.shape
    M = cbody.shape[1]
    V = vlx.shape[1]
    has_joints = joints is not None
    uniform = owner is None
    compact = 0 < Cs < C
    Cp = Cs if compact else C
    Wb = worlds_per_program or pick_frame_worlds(W, M, C)
    if bullet is None:
        bullet = jnp.zeros_like(invm)

    kernel = functools.partial(
        _frame2_kernel, C=C, JC=JC, has_joints=has_joints, substeps=substeps,
        iterations=iterations, h=h, dt=dt, margin=margin, compliance=compliance,
        relaxation=relaxation, max_dpos=max_dpos, rest_threshold=rest_threshold,
        lin_damp=lin_damp, ang_damp=ang_damp, joint_solver=joint_solver,
        n_colors=n_colors, max_dpos_joint=max_dpos_joint,
        ccd=ccd, ccd_slop=ccd_slop, uniform=uniform, Cs=Cs,
    )

    def nspec():
        return pl.BlockSpec((Wb, N), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def mspec():
        return pl.BlockSpec((Wb, M), lambda w: (w, 0), memory_space=pltpu.VMEM)

    def vspec():
        return pl.BlockSpec((Wb, V, M), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)

    def cspec():
        return pl.BlockSpec((Wb, C, M), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)

    gspec = pl.BlockSpec((Wb, 2), lambda w: (w, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [nspec()] * 11
        + [mspec(), vspec(), vspec()] + [mspec()] * 5
        + [cspec(), cspec()]
    )
    args = [
        posx, posy, ang, velx, vely, angvel, invm, invi, dyn, kin, bullet,
        cbody, vlx, vly, nverts, radius, fric, rest, sensor,
        partner, slot_act,
    ]
    if not uniform:
        bcol, bmask = owner
        Kc = bcol.shape[1]

        def ospec():
            return pl.BlockSpec((Wb, Kc, N), lambda w: (w, 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs += [ospec(), ospec()]
        args += [bcol, bmask]
    if has_joints:
        Jp = joints["jtype"].shape[1]

        def jpspec():
            return pl.BlockSpec((Wb, Jp), lambda w: (w, 0),
                                memory_space=pltpu.VMEM)

        def jcspec():
            return pl.BlockSpec((Wb, JC, N), lambda w: (w, 0, 0),
                                memory_space=pltpu.VMEM)

        keys = ["jtype", "jba", "jbb", "jaax", "jaay", "jabx", "jaby",
                "jrest", "jlo", "jhi", "jcomp", "jdamp", "jms", "jmm",
                "jcolor"]
        in_specs += [jpspec() for _ in keys] + [jcspec()] * 3
        args += [joints[k] for k in keys]
        args += [joints["jslot"], joints["jside"], joints["jact"]]
    in_specs += [gspec]
    args += [gravity]

    def cpspec(k, ln=None):
        return pl.BlockSpec((Wb, k, M), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [nspec()] * 6 + [cpspec(Cp)]
    out_shape = ([jax.ShapeDtypeStruct((W, N), f32)] * 6
                 + [jax.ShapeDtypeStruct((W, Cp, M), f32)])
    if compact:
        out_specs += [cpspec(Cs), cpspec(2)]
        out_shape += [jax.ShapeDtypeStruct((W, Cs, M), i32),
                      jax.ShapeDtypeStruct((W, 2, M), f32)]
    outs = pl.pallas_call(
        kernel,
        grid=(W // Wb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return outs
