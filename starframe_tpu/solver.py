"""XPBD substep solver: integrate → project positions → derive velocities →
velocity solve.

The TPU-native rebuild of starframe's solver core (SURVEY.md §2 rows 7-9;
pipeline order is driver-normative, BASELINE.json:5 / SURVEY.md §3.2 step 5),
following Müller et al. 2020 "Detailed Rigid Body Simulation with XPBD"
(small steps): ~10 substeps per 60 Hz frame, one projection per substep,
velocities re-derived from pose deltas, restitution + dynamic friction in a
velocity pass.

Parallelization: instead of the reference's scalar Gauss-Seidel loop, every
constraint row is solved simultaneously (one fused VPU pass over the whole
constraint buffer) and the position corrections are scatter-accumulated per
body, normalized by the per-body constraint count ("mass-splitting" averaged
Jacobi) with optional under-relaxation — the known-good GPU-engine pattern
chosen in SURVEY.md §7.5. No two constraints ever race: the scatter-add is
the only write, and XLA's segment-sum is deterministic on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import math2d as m2
from .config import SolverConfig
from .contacts import Contacts
from .state import (
    BODY_KINEMATIC,
    JOINT_ANGLE_RANGE,
    JOINT_ANGULAR_MOTOR,
    JOINT_DISTANCE,
    JOINT_PIN,
    JOINT_WELD,
    Bodies,
    Joints,
)

_EPS = 1e-10


class BodyState(NamedTuple):
    """The mutable part of body state inside the substep loop."""

    pos: jax.Array  # [N, 2]
    angle: jax.Array  # [N]
    vel: jax.Array  # [N, 2]
    ang_vel: jax.Array  # [N]


def _safe_div(num, den):
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


@jax.named_scope("integrate")
def integrate(s: BodyState, bodies: Bodies, gravity, h: float) -> BodyState:
    """Semi-implicit Euler: v += g h (dynamic bodies); pose += v h."""
    dyn = (bodies.inv_mass > 0.0)[:, None]
    vel = s.vel + jnp.where(dyn, gravity[None, :] * h, 0.0)
    pos = s.pos + vel * h
    angle = s.angle + s.ang_vel * h
    return BodyState(pos, angle, vel, s.ang_vel)


# ---------------------------------------------------------------------------
# Position projection
# ---------------------------------------------------------------------------


class _Accum(NamedTuple):
    dpos: jax.Array  # [N, 2]
    dang: jax.Array  # [N]
    count: jax.Array  # [N]


def _accum_init(n: int) -> _Accum:
    return _Accum(
        dpos=jnp.zeros((n, 2), jnp.float32),
        dang=jnp.zeros((n,), jnp.float32),
        count=jnp.zeros((n,), jnp.float32),
    )


def _apply_accum(s: BodyState, acc: _Accum, relaxation: float, max_dpos: float,
                 dx=None, dang_tot=None):
    """Apply count-normalized corrections. When ``dx``/``dang_tot`` running
    totals are passed, also returns them updated — the substep reconstructs
    velocities from these *applied deltas* instead of ``(pos - pos0)/h``,
    which suffers catastrophic f32 cancellation far from the origin."""
    cnt = jnp.maximum(acc.count, 1.0)
    dpos = jnp.clip(acc.dpos * (relaxation / cnt)[:, None], -max_dpos, max_dpos)
    dang = jnp.clip(acc.dang * (relaxation / cnt), -max_dpos, max_dpos)
    s = BodyState(s.pos + dpos, s.angle + dang, s.vel, s.ang_vel)
    if dx is None:
        return s
    return s, dx + dpos, dang_tot + dang


def _contact_kinematics(s: BodyState, contacts: Contacts):
    """Current-pose world geometry of every contact point."""
    ba, bb = contacts.body_a, contacts.body_b
    pos_a, ang_a = s.pos[ba], s.angle[ba]
    pos_b, ang_b = s.pos[bb], s.angle[bb]
    n_w = m2.rotate(ang_a, contacts.normal_a)  # [P, 2]
    wa = m2.transform(pos_a[:, None, :], ang_a[:, None], contacts.anchor_a)  # [P,2,2]
    wb = m2.transform(pos_b[:, None, :], ang_b[:, None], contacts.anchor_b)
    ra = wa - pos_a[:, None, :]
    rb = wb - pos_b[:, None, :]
    return n_w, wa, wb, ra, rb


@jax.named_scope("solve_contacts")
def solve_contact_positions(
    s: BodyState,
    s0: BodyState,
    bodies: Bodies,
    contacts: Contacts,
    acc: _Accum,
    h: float,
    cfg: SolverConfig,
):
    """XPBD non-penetration + static-friction position projection.

    Returns (acc, lambda_n[P,2]) — the per-point normal impulse magnitudes
    for this substep, consumed by the velocity pass (restitution/friction
    clamping), as in the small-steps paper.
    """
    ba, bb = contacts.body_a, contacts.body_b
    im_a = bodies.inv_mass[ba][:, None]  # [P, 1]
    im_b = bodies.inv_mass[bb][:, None]
    ii_a = bodies.inv_inertia[ba][:, None]
    ii_b = bodies.inv_inertia[bb][:, None]

    n_w, wa, wb, ra, rb = _contact_kinematics(s, contacts)
    n_p = n_w[:, None, :]  # [P, 1, 2]

    c = m2.dot2(wb - wa, n_p)  # [P, 2] signed separation
    active = (c < 0.0) & contacts.solve_mask

    cr_a = m2.cross2(ra, n_p)  # [P, 2]
    cr_b = m2.cross2(rb, n_p)
    w_a = im_a + ii_a * cr_a * cr_a
    w_b = im_b + ii_b * cr_b * cr_b
    alpha_t = cfg.contact_compliance / (h * h)
    dlam = jnp.where(active, _safe_div(-c, w_a + w_b + alpha_t), 0.0)  # [P, 2] >= 0
    p_imp = dlam[..., None] * n_p  # [P, 2, 2]

    # -- static friction at position level (BASELINE.json:5) --
    wa0 = m2.transform(s0.pos[ba][:, None, :], s0.angle[ba][:, None], contacts.anchor_a)
    wb0 = m2.transform(s0.pos[bb][:, None, :], s0.angle[bb][:, None], contacts.anchor_b)
    dp = (wa - wa0) - (wb - wb0)  # [P, 2, 2] relative tangential slide
    dp_t = dp - m2.dot2(dp, n_p)[..., None] * n_p
    ct = m2.norm(dp_t)  # [P, 2]
    t_hat = dp_t / jnp.maximum(ct, _EPS)[..., None]
    cr_at = m2.cross2(ra, t_hat)
    cr_bt = m2.cross2(rb, t_hat)
    w_at = im_a + ii_a * cr_at * cr_at
    w_bt = im_b + ii_b * cr_bt * cr_bt
    dlam_t = _safe_div(-ct, w_at + w_bt)  # <= 0
    stick = active & (jnp.abs(dlam_t) < contacts.friction[:, None] * dlam)
    pt = jnp.where(stick[..., None], dlam_t[..., None] * t_hat, 0.0)  # [P, 2, 2]

    # combined per-body contributions (sum over the 2 manifold points)
    contrib_a = (-p_imp + pt).sum(axis=1)  # [P, 2]
    contrib_b = (p_imp - pt).sum(axis=1)
    dang_a = (ii_a * (-m2.cross2(ra, p_imp) + m2.cross2(ra, pt))).sum(axis=1)
    dang_b = (ii_b * (m2.cross2(rb, p_imp) - m2.cross2(rb, pt))).sum(axis=1)
    n_active = active.sum(axis=1).astype(jnp.float32)

    acc = _Accum(
        dpos=acc.dpos.at[ba].add(contrib_a * im_a).at[bb].add(contrib_b * im_b),
        dang=acc.dang.at[ba].add(dang_a).at[bb].add(dang_b),
        count=acc.count.at[ba].add(n_active).at[bb].add(n_active),
    )
    return acc, dlam


@jax.named_scope("solve_joints")
def solve_joint_positions(
    s: BodyState, bodies: Bodies, joints: Joints, acc: _Accum, h: float,
    mask=None,
) -> _Accum:
    """Position projection for distance/pin/weld joints and angle limits
    (starframe's user constraints — SURVEY.md §2 row 8). ``mask`` restricts
    the pass to one color batch (graph-colored Gauss-Seidel)."""
    ba, bb = joints.body_a, joints.body_b
    im_a, im_b = bodies.inv_mass[ba], bodies.inv_mass[bb]
    ii_a, ii_b = bodies.inv_inertia[ba], bodies.inv_inertia[bb]
    jt = joints.jtype

    pos_a, ang_a = s.pos[ba], s.angle[ba]
    pos_b, ang_b = s.pos[bb], s.angle[bb]
    wa = m2.transform(pos_a, ang_a, joints.anchor_a)
    wb = m2.transform(pos_b, ang_b, joints.anchor_b)
    ra = wa - pos_a
    rb = wb - pos_b

    delta = wb - wa
    d = m2.norm(delta)
    n = delta / jnp.maximum(d, _EPS)[..., None]
    # pin/weld behave like a distance constraint with lo = hi = 0; a zero
    # distance makes the direction ill-defined, but then C = 0 too.
    is_dist = jt == JOINT_DISTANCE
    is_point = (jt == JOINT_PIN) | (jt == JOINT_WELD)
    lo = jnp.where(is_point, 0.0, joints.lo)
    hi = jnp.where(is_point, 0.0, joints.hi)
    c_lin = jnp.where(d > hi, d - hi, jnp.where(d < lo, d - lo, 0.0))
    sel = jnp.ones_like(jt, bool) if mask is None else mask
    lin_active = (is_dist | is_point) & (jnp.abs(c_lin) > 0.0) & (d > _EPS) & sel

    cr_a = m2.cross2(ra, n)
    cr_b = m2.cross2(rb, n)
    w_a = im_a + ii_a * cr_a * cr_a
    w_b = im_b + ii_b * cr_b * cr_b
    alpha_t = joints.compliance / (h * h)
    dlam = jnp.where(lin_active, _safe_div(-c_lin, w_a + w_b + alpha_t), 0.0)
    p_imp = dlam[:, None] * n

    # angular rows: weld locks relative angle at rest; angle_range limits it
    phi = m2.angle_wrap(ang_b - ang_a - joints.rest)
    is_weld = jt == JOINT_WELD
    is_rng = jt == JOINT_ANGLE_RANGE
    c_ang = jnp.where(
        is_weld, phi, jnp.where(phi > joints.hi, phi - joints.hi, jnp.where(phi < joints.lo, phi - joints.lo, 0.0))
    )
    ang_active = (is_weld | is_rng) & (jnp.abs(c_ang) > 0.0) & sel
    dlam_ang = jnp.where(ang_active, _safe_div(-c_ang, ii_a + ii_b + alpha_t), 0.0)

    n_active = lin_active.astype(jnp.float32) + ang_active.astype(jnp.float32)
    acc = _Accum(
        dpos=acc.dpos.at[ba].add(-p_imp * im_a[:, None]).at[bb].add(p_imp * im_b[:, None]),
        dang=acc.dang.at[ba]
        .add(-ii_a * m2.cross2(ra, p_imp) - dlam_ang * ii_a)
        .at[bb]
        .add(ii_b * m2.cross2(rb, p_imp) + dlam_ang * ii_b),
        count=acc.count.at[ba].add(n_active).at[bb].add(n_active),
    )
    return acc


# ---------------------------------------------------------------------------
# Velocity pass
# ---------------------------------------------------------------------------


@jax.named_scope("velocity_pass")
def velocity_pass(
    s: BodyState,
    v_tilde: BodyState,
    bodies: Bodies,
    contacts: Contacts,
    joints: Joints,
    lam_n: jax.Array,
    h: float,
    cfg: SolverConfig,
) -> BodyState:
    """Restitution + dynamic friction (+ motors, joint damping) on velocities,
    after velocities were re-derived from pose deltas (SURVEY.md §3.2 5d)."""
    n_bodies = s.pos.shape[0]
    dvel = jnp.zeros((n_bodies, 2), jnp.float32)
    dang = jnp.zeros((n_bodies,), jnp.float32)
    count = jnp.zeros((n_bodies,), jnp.float32)

    # ---- contacts ----
    ba, bb = contacts.body_a, contacts.body_b
    im_a = bodies.inv_mass[ba][:, None]
    im_b = bodies.inv_mass[bb][:, None]
    ii_a = bodies.inv_inertia[ba][:, None]
    ii_b = bodies.inv_inertia[bb][:, None]

    n_w, wa, wb, ra, rb = _contact_kinematics(s, contacts)
    n_p = n_w[:, None, :]

    def point_vel(vel, ang_vel, r):
        return vel[:, None, :] + m2.cross_sv(ang_vel[:, None], r)

    u_rel = point_vel(s.vel[bb], s.ang_vel[bb], rb) - point_vel(s.vel[ba], s.ang_vel[ba], ra)
    vn = m2.dot2(u_rel, n_p)  # [P, 2]
    ut = u_rel - vn[..., None] * n_p
    vt = m2.norm(ut)

    u_rel0 = point_vel(v_tilde.vel[bb], v_tilde.ang_vel[bb], rb) - point_vel(
        v_tilde.vel[ba], v_tilde.ang_vel[ba], ra
    )
    vn0 = m2.dot2(u_rel0, n_p)

    active = (lam_n > 0.0) & contacts.solve_mask

    cr_a = m2.cross2(ra, n_p)
    cr_b = m2.cross2(rb, n_p)
    w_n = im_a + ii_a * cr_a * cr_a + im_b + ii_b * cr_b * cr_b

    e = jnp.where(vn0 < -cfg.restitution_threshold, contacts.restitution[:, None], 0.0)
    dv_n = jnp.where(active, -vn + jnp.maximum(-e * vn0, 0.0), 0.0)
    lam_v = _safe_div(dv_n, w_n)
    p_n = lam_v[..., None] * n_p  # applied +p to b, -p to a

    # dynamic friction, clamped by the substep normal impulse (mu * lam_n / h)
    t_hat = ut / jnp.maximum(vt, _EPS)[..., None]
    cr_at = m2.cross2(ra, t_hat)
    cr_bt = m2.cross2(rb, t_hat)
    w_t = im_a + ii_a * cr_at * cr_at + im_b + ii_b * cr_bt * cr_bt
    lam_f = jnp.minimum(_safe_div(vt, w_t), contacts.friction[:, None] * lam_n / h)
    lam_f = jnp.where(active, lam_f, 0.0)
    p_f = lam_f[..., None] * t_hat  # applied -p to b, +p to a (oppose slide)

    imp = p_n - p_f  # net impulse applied to b at each point; a gets the negative
    contrib_b = imp.sum(axis=1)
    contrib_a = -contrib_b
    dang_b = (ii_b * m2.cross2(rb, imp)).sum(axis=1)
    dang_a = -(ii_a * m2.cross2(ra, imp)).sum(axis=1)
    n_act = active.sum(axis=1).astype(jnp.float32)

    dvel = dvel.at[ba].add(contrib_a * im_a).at[bb].add(contrib_b * im_b)
    dang = dang.at[ba].add(dang_a).at[bb].add(dang_b)
    count = count.at[ba].add(n_act).at[bb].add(n_act)

    # ---- joints: angular motors + damping ----
    jba, jbb = joints.body_a, joints.body_b
    j_ii_a = bodies.inv_inertia[jba]
    j_ii_b = bodies.inv_inertia[jbb]
    is_motor = joints.jtype == JOINT_ANGULAR_MOTOR
    err = joints.motor_speed - (s.ang_vel[jbb] - s.ang_vel[jba])
    lam_m = _safe_div(err, j_ii_a + j_ii_b)
    lam_m = jnp.clip(lam_m, -joints.motor_max * h, joints.motor_max * h)
    lam_m = jnp.where(is_motor, lam_m, 0.0)

    # joint damping: bleed relative anchor-point velocity (all joint types)
    damped = joints.active & (joints.damping > 0.0)
    pos_a, ang_a = s.pos[jba], s.angle[jba]
    pos_b, ang_b = s.pos[jbb], s.angle[jbb]
    jwa = m2.transform(pos_a, ang_a, joints.anchor_a)
    jwb = m2.transform(pos_b, ang_b, joints.anchor_b)
    jra = jwa - pos_a
    jrb = jwb - pos_b
    ju_rel = (
        s.vel[jbb]
        + m2.cross_sv(s.ang_vel[jbb], jrb)
        - s.vel[jba]
        - m2.cross_sv(s.ang_vel[jba], jra)
    )
    j_im_a = bodies.inv_mass[jba]
    j_im_b = bodies.inv_mass[jbb]
    w_lin = j_im_a + j_im_b
    damp_f = jnp.minimum(joints.damping * h, 1.0)
    p_d = jnp.where(damped[:, None], -ju_rel * _safe_div(damp_f, w_lin)[:, None], 0.0)

    j_act = (is_motor | damped).astype(jnp.float32)
    dvel = dvel.at[jba].add(-p_d * j_im_a[:, None]).at[jbb].add(p_d * j_im_b[:, None])
    dang = (
        dang.at[jba]
        .add(-lam_m * j_ii_a - j_ii_a * m2.cross2(jra, p_d))
        .at[jbb]
        .add(lam_m * j_ii_b + j_ii_b * m2.cross2(jrb, p_d))
    )
    count = count.at[jba].add(j_act).at[jbb].add(j_act)

    cnt = jnp.maximum(count, 1.0)
    vel = s.vel + dvel / cnt[:, None]
    ang_vel = s.ang_vel + dang / cnt

    # global damping
    if cfg.linear_damping > 0.0:
        vel = vel * (1.0 / (1.0 + h * cfg.linear_damping))
    if cfg.angular_damping > 0.0:
        ang_vel = ang_vel * (1.0 / (1.0 + h * cfg.angular_damping))
    return BodyState(s.pos, s.angle, vel, ang_vel)


# ---------------------------------------------------------------------------
# One substep
# ---------------------------------------------------------------------------


def substep(
    s: BodyState,
    bodies: Bodies,
    colliders,
    pair_a,
    pair_b,
    pair_valid,
    joints: Joints,
    gravity,
    h: float,
    cfg: SolverConfig,
) -> tuple[BodyState, Contacts]:
    """One XPBD substep with per-substep contact refresh.

    Collision *pairs* come from the frame-level broadphase; *manifolds* are
    regenerated here at the integrated pose (TGS-style). Frame-long stored
    anchors on rotating bodies displace the normal's application point and
    pump angular momentum into rolling contact — regenerating is both more
    accurate and branch-free-cheap on the VPU.
    """
    from .narrowphase import narrowphase  # local import to avoid cycle

    s0 = s  # pose at substep start (for velocity reconstruction + friction)
    s = integrate(s, bodies, gravity, h)
    v_tilde = s  # velocities after external forces, before projection

    contacts = narrowphase(
        colliders, s.pos, s.angle, pair_a, pair_b, pair_valid, cfg.contact_margin
    )

    n_b = s.pos.shape[0]
    dx = jnp.zeros((n_b, 2), jnp.float32)  # applied position corrections
    dth = jnp.zeros((n_b,), jnp.float32)  # applied angle corrections
    lam_n = jnp.zeros(contacts.point_mask.shape, jnp.float32)
    for _ in range(cfg.iterations):
        # contacts: averaged Jacobi over the whole (dynamic-topology) buffer
        acc2 = _accum_init(n_b)
        acc2, lam_i = solve_contact_positions(s, s0, bodies, contacts, acc2, h, cfg)
        lam_n = lam_n + lam_i
        # joints: graph-colored Gauss-Seidel — each color batch has no shared
        # dynamic bodies, so corrections apply exactly (BASELINE.json:5);
        # falls back to one averaged-Jacobi pass when coloring is disabled
        if cfg.joint_solver == "colored":
            s, dx, dth = _apply_accum(s, acc2, cfg.relaxation, cfg.max_dpos, dx, dth)
            for color in range(cfg.max_joint_colors):
                # final batch sweeps any colors beyond the static bound;
                # count-normalization in _apply_accum keeps that tail safe
                last = color == cfg.max_joint_colors - 1
                msk = (joints.color >= color) if last else (joints.color == color)
                accj = _accum_init(n_b)
                accj = solve_joint_positions(s, bodies, joints, accj, h, mask=msk)
                s, dx, dth = _apply_accum(s, accj, 1.0, cfg.max_dpos, dx, dth)
        else:
            acc2 = solve_joint_positions(s, bodies, joints, acc2, h)
            s, dx, dth = _apply_accum(s, acc2, cfg.relaxation, cfg.max_dpos, dx, dth)

    # velocity reconstruction: v = ṽ + (applied corrections)/h — identical to
    # the paper's (pos - pos0)/h but free of f32 cancellation at large |pos|
    kin = ((bodies.flags & BODY_KINEMATIC) != 0)[:, None]
    vel = jnp.where(kin, s.vel, v_tilde.vel + dx / h)
    ang_vel = jnp.where(kin[:, 0], s.ang_vel, v_tilde.ang_vel + dth / h)
    s = BodyState(s.pos, s.angle, vel, ang_vel)

    s = velocity_pass(s, v_tilde, bodies, contacts, joints, lam_n, h, cfg)
    return s, contacts
