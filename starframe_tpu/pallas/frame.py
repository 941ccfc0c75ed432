"""Whole-frame Pallas kernel: all XPBD substeps, G worlds fused per program.

Grid = (n_worlds / G,). G independent worlds are flattened into one
"super-world" per program — bodies concatenated (N' = G*N), pairs
concatenated (P' = G*P) with body indices offset by g*N on the host — so the
block-diagonal structure lives inside ONE one-hot matrix and every
gather/scatter in the substep loop is a single MXU dot. (Measured: the
per-world small dots, not the physics math, dominated this kernel — ~97% of
runtime at per-world dot granularity.)

Per program, everything lives in VMEM:

- body state ([1, N'] rows)
- frame-constant pair data ([V, P'] verts, [1, P'] scalars)
- one merged one-hot matrix [N', 2P'] (A columns then B columns), built in
  VMEM from the pair body indices (shipping it via HBM would cost N*P floats
  per world per frame and dominate bandwidth)

The substep loop (``lax.fori_loop``) runs entirely on-core: integrate →
manifolds (kernels.manifold_batch — the same P-last math as the XLA path) →
contact projection → velocity reconstruction → restitution/friction pass,
with integrated/corrected *pair* poses derived algebraically from gathered
deltas (the body updates are linear), so each substep issues only:
1 gather dot + iterations * (1 scatter + 1 delta-gather dot) + 1 velocity
scatter dot.

Joints are NOT handled here (the batched-RL north-star scene has none);
worlds with joints take the XLA path (solver.substep). SURVEY.md §7.5 is the
design mandate for the Pallas tier.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import (
    ContactsB,
    PairPose,
    PairVel,
    manifold_batch,
    solve_contacts_b,
    velocity_contacts_b,
)

# per-program VMEM budget for the [N', 2P'] one-hot matrix
_ONEHOT_BUDGET = 2 * 1024 * 1024


def pick_group_size(n_bodies: int, max_pairs: int, n_worlds: int) -> int:
    """Worlds fused per program: the one-hot is [G*N, 2*G*P] f32 — quadratic
    in G, so budget-bounded."""
    g = 8
    while g > 1 and (g * n_bodies) * (2 * g * max_pairs) * 4 > _ONEHOT_BUDGET:
        g -= 1
    g = min(g, n_worlds)
    while n_worlds % g != 0:
        g -= 1
    return max(g, 1)


def _dot(a, b, dn=(((1,), (0,)), ((), ()))):
    # HIGHEST precision is load-bearing: DEFAULT rounds f32 operands to bf16
    # on the MXU, which quantizes gathered *positions* (0.39 -> 0.390625) and
    # broke stacking (pyramids collapsed from phantom penetration jitter)
    return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _frame_kernel(
    posx_r, posy_r, ang_r, velx_r, vely_r, angvel_r,
    invm_r, invi_r, dyn_r, kin_r,
    vax_r, vay_r, vbx_r, vby_r,
    nva_r, nvb_r, rada_r, radb_r, fric_r, rest_r,
    ima_r, imb_r, iia_r, iib_r, solve_allow_r, valid_r,
    body_a_r, body_b_r,
    grav_r,
    oposx_r, oposy_r, oang_r, ovelx_r, ovely_r, oangvel_r,
    *, substeps: int, iterations: int, h: float, margin: float,
    compliance: float, relaxation: float, max_dpos: float,
    rest_threshold: float, lin_damp: float, ang_damp: float,
):
    N = invm_r.shape[2]  # N' = G*N bodies in the fused super-world
    P = body_a_r.shape[2]  # P' = G*P pairs

    pd = SimpleNamespace(
        verts_ax=vax_r[0],  # [V, P]
        verts_ay=vay_r[0],
        verts_bx=vbx_r[0],
        verts_by=vby_r[0],
        nverts_a=nva_r[0, 0],  # [P]
        nverts_b=nvb_r[0, 0],
        radius_a=rada_r[0, 0],
        radius_b=radb_r[0, 0],
        friction=fric_r[0, 0],
        restitution=rest_r[0, 0],
        inv_mass_a=ima_r[0, 0],
        inv_mass_b=imb_r[0, 0],
        inv_inertia_a=iia_r[0, 0],
        inv_inertia_b=iib_r[0, 0],
    )
    solve_allow = solve_allow_r[0, 0]  # [P] f32 0/1
    valid = valid_r[0, 0]
    gx = grav_r[0, 0]
    gy = grav_r[0, 1]
    dyn = dyn_r[0, 0, :]  # [N'] f32 1/0: inv_mass > 0
    kin = kin_r[0, 0, :]

    # merged one-hot [N', 2P'] (A columns then B columns), built in VMEM —
    # worlds don't mix because host-side indices are offset per world
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, P), 0)
    oh_ab = jnp.concatenate(
        [
            (iota_n == body_a_r[0, 0][None, :]).astype(jnp.float32),
            (iota_n == body_b_r[0, 0][None, :]).astype(jnp.float32),
        ],
        axis=1,
    )

    def gather(rows):  # [K, N'] -> ([K, P'] via A, [K, P'] via B): ONE dot
        out = _dot(rows, oh_ab)  # [K, 2P']
        return out[:, :P], out[:, P:]

    def accumulate(vals_a, vals_b):  # [4, P'] each -> [4, N']: ONE dot
        dn = (((1,), (1,)), ((), ()))
        return _dot(jnp.concatenate([vals_a, vals_b], axis=1), oh_ab, dn)

    # frame-constant per-pair dynamic masks
    dpa, dpb = gather(dyn[None, :])
    dyn_a = dpa[0]
    dyn_b = dpb[0]

    def substep(_, carry):
        px, py, an, vx, vy, om = carry  # [N']
        ga, gb = gather(jnp.stack([px, py, an, vx, vy, om]))
        pax0, pay0, aa0, gvax, gvay, goa = (ga[k] for k in range(6))
        pbx0, pby0, ab0, gvbx, gvby, gob = (gb[k] for k in range(6))
        pose0 = PairPose(pax0, pay0, jnp.cos(aa0), jnp.sin(aa0),
                         pbx0, pby0, jnp.cos(ab0), jnp.sin(ab0))

        # integrate bodies...
        vx = vx + gx * h * dyn
        vy = vy + gy * h * dyn
        px = px + vx * h
        py = py + vy * h
        an = an + om * h
        vtx, vty, vtom = vx, vy, om  # v_tilde

        # ...and derive integrated pair values algebraically (the per-body
        # update is linear, so no second gather is needed)
        vax_t = gvax + gx * h * dyn_a
        vay_t = gvay + gy * h * dyn_a
        vbx_t = gvbx + gx * h * dyn_b
        vby_t = gvby + gy * h * dyn_b
        pax = pax0 + vax_t * h
        pay = pay0 + vay_t * h
        pbx = pbx0 + vbx_t * h
        pby = pby0 + vby_t * h
        aa = aa0 + goa * h
        ab = ab0 + gob * h
        pose = PairPose(pax, pay, jnp.cos(aa), jnp.sin(aa),
                        pbx, pby, jnp.cos(ab), jnp.sin(ab))

        wvax = pose.pax[None] + pose.ca[None] * pd.verts_ax - pose.sa[None] * pd.verts_ay
        wvay = pose.pay[None] + pose.sa[None] * pd.verts_ax + pose.ca[None] * pd.verts_ay
        wvbx = pose.pbx[None] + pose.cb[None] * pd.verts_bx - pose.sb[None] * pd.verts_by
        wvby = pose.pby[None] + pose.sb[None] * pd.verts_bx + pose.cb[None] * pd.verts_by
        m = manifold_batch(wvax, wvay, pd.nverts_a, pd.radius_a,
                           wvbx, wvby, pd.nverts_b, pd.radius_b, margin)
        # body-local anchors/normal (same as kernels.narrowphase_b tail)
        dxa = m.wa_x - pose.pax[None]
        dya = m.wa_y - pose.pay[None]
        a_ax = pose.ca[None] * dxa + pose.sa[None] * dya
        a_ay = -pose.sa[None] * dxa + pose.ca[None] * dya
        dxb = m.wb_x - pose.pbx[None]
        dyb = m.wb_y - pose.pby[None]
        b_ax = pose.cb[None] * dxb + pose.sb[None] * dyb
        b_ay = -pose.sb[None] * dxb + pose.cb[None] * dyb
        n_ax = pose.ca * m.n_x + pose.sa * m.n_y
        n_ay = -pose.sa * m.n_x + pose.ca * m.n_y
        pmask = m.pmask * valid[None, :]
        smask = pmask * solve_allow[None, :]
        cb_ = ContactsB(n_ax, n_ay, a_ax, a_ay, b_ax, b_ay, smask, pmask, m.sep)

        dx_x = jnp.zeros_like(px)
        dx_y = jnp.zeros_like(py)
        dth = jnp.zeros_like(an)
        cax = jnp.zeros_like(pax)
        cay = jnp.zeros_like(pay)
        caa = jnp.zeros_like(aa)
        cbx = jnp.zeros_like(pbx)
        cby = jnp.zeros_like(pby)
        cab = jnp.zeros_like(ab)
        lam_n = jnp.zeros_like(m.sep)
        for _it in range(iterations):
            aa_it = aa + caa
            ab_it = ab + cab
            pose_it = PairPose(pax + cax, pay + cay, jnp.cos(aa_it), jnp.sin(aa_it),
                               pbx + cbx, pby + cby, jnp.cos(ab_it), jnp.sin(ab_it))
            vals_a, vals_b, lam_i = solve_contacts_b(
                pose_it, pose0, pd, cb_, h, compliance
            )
            lam_n = lam_n + lam_i
            acc = accumulate(vals_a, vals_b)  # [4, N']
            cnt = jnp.maximum(acc[3], 1.0)
            ddx = jnp.clip(acc[0] * relaxation / cnt, -max_dpos, max_dpos)
            ddy = jnp.clip(acc[1] * relaxation / cnt, -max_dpos, max_dpos)
            dda = jnp.clip(acc[2] * relaxation / cnt, -max_dpos, max_dpos)
            px = px + ddx
            py = py + ddy
            an = an + dda
            dx_x = dx_x + ddx
            dx_y = dx_y + ddy
            dth = dth + dda
            da, db = gather(jnp.stack([ddx, ddy, dda]))
            cax = cax + da[0]
            cay = cay + da[1]
            caa = caa + da[2]
            cbx = cbx + db[0]
            cby = cby + db[1]
            cab = cab + db[2]

        # velocity reconstruction (kinematic bodies keep their velocity)
        nk = 1.0 - kin
        vx = kin * vx + nk * (vtx + dx_x / h)
        vy = kin * vy + nk * (vty + dx_y / h)
        om = kin * om + nk * (vtom + dth / h)

        # velocity pass — pair velocities derived from the same totals
        aa_v = aa + caa
        ab_v = ab + cab
        pose_v = PairPose(pax + cax, pay + cay, jnp.cos(aa_v), jnp.sin(aa_v),
                          pbx + cbx, pby + cby, jnp.cos(ab_v), jnp.sin(ab_v))
        inv_h = 1.0 / h
        pvel = PairVel(
            vax_t + cax * inv_h * dyn_a, vay_t + cay * inv_h * dyn_a,
            goa + caa * inv_h * dyn_a,
            vbx_t + cbx * inv_h * dyn_b, vby_t + cby * inv_h * dyn_b,
            gob + cab * inv_h * dyn_b,
        )
        pvel0 = PairVel(vax_t, vay_t, goa, vbx_t, vby_t, gob)
        cv_a, cv_b = velocity_contacts_b(
            pose_v, pvel, pvel0, pd, cb_, lam_n, h, rest_threshold,
        )
        accv = accumulate(cv_a, cv_b)
        cntv = jnp.maximum(accv[3], 1.0)
        vx = vx + accv[0] / cntv
        vy = vy + accv[1] / cntv
        om = om + accv[2] / cntv
        if lin_damp > 0.0:
            s = 1.0 / (1.0 + h * lin_damp)
            vx = vx * s
            vy = vy * s
        if ang_damp > 0.0:
            om = om * (1.0 / (1.0 + h * ang_damp))
        return px, py, an, vx, vy, om

    carry = (posx_r[0, 0, :], posy_r[0, 0, :], ang_r[0, 0, :],
             velx_r[0, 0, :], vely_r[0, 0, :], angvel_r[0, 0, :])
    px, py, an, vx, vy, om = jax.lax.fori_loop(0, substeps, substep, carry)
    oposx_r[0, 0, :] = px
    oposy_r[0, 0, :] = py
    oang_r[0, 0, :] = an
    ovelx_r[0, 0, :] = vx
    ovely_r[0, 0, :] = vy
    oangvel_r[0, 0, :] = om


@functools.partial(
    jax.jit,
    static_argnames=(
        "substeps", "iterations", "h", "margin", "compliance", "relaxation",
        "max_dpos", "rest_threshold", "lin_damp", "ang_damp",
    ),
)
def run_frame_batched(
    pos, angle, vel, ang_vel, inv_mass, inv_inertia, flags,
    verts_ax, verts_ay, verts_bx, verts_by,
    nverts_a, nverts_b, radius_a, radius_b, friction, restitution,
    im_a, im_b, ii_a, ii_b, solve_allow, valid,
    body_a, body_b, gravity,
    *, substeps, iterations, h, margin, compliance, relaxation,
    max_dpos, rest_threshold, lin_damp, ang_damp,
):
    """Run one frame's substeps for a batch of worlds (leading axis W).

    Assumes uniform gravity across the batch (world 0's is used), which
    holds for replicated batched scenes. Returns (pos, angle, vel, ang_vel).
    """
    W, N = pos.shape[0], pos.shape[1]
    V, P = verts_ax.shape[1], verts_ax.shape[2]
    G = pick_group_size(N, P, W)
    Wg, Ng, Pg = W // G, G * N, G * P

    kernel = functools.partial(
        _frame_kernel,
        substeps=substeps, iterations=iterations, h=h, margin=margin,
        compliance=compliance, relaxation=relaxation, max_dpos=max_dpos,
        rest_threshold=rest_threshold, lin_damp=lin_damp, ang_damp=ang_damp,
    )

    f32 = jnp.float32
    dyn = (inv_mass > 0.0).astype(f32)
    kin = ((flags & 2) != 0).astype(f32)

    # ---- fuse G worlds into super-worlds (pure reshapes + index offsets) ----
    def fuse_n(x):  # [W, N] -> [Wg, 1, Ng] (middle singleton satisfies the
        # pallas block rule: 2nd-to-last block dim must equal the array dim)
        return x.reshape(Wg, 1, Ng)

    def fuse_p(x):  # [W, P] -> [Wg, 1, Pg]
        return x.reshape(Wg, 1, Pg)

    def fuse_verts(x):  # [W, V, P] -> [Wg, V, Pg]
        return x.reshape(Wg, G, V, P).swapaxes(1, 2).reshape(Wg, V, Pg)

    offs = (jnp.arange(G, dtype=body_a.dtype) * N)[None, :, None]  # [1, G, 1]
    body_a_g = (body_a.reshape(Wg, G, P) + offs).reshape(Wg, 1, Pg)
    body_b_g = (body_b.reshape(Wg, G, P) + offs).reshape(Wg, 1, Pg)

    def bspec(*shape):
        return pl.BlockSpec((1, 1) + shape, lambda w: (w,) + (0,) * (len(shape) + 1),
                            memory_space=pltpu.VMEM)

    def vspec():
        return pl.BlockSpec((1, V, Pg), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [bspec(Ng)] * 10
        + [vspec()] * 4
        + [bspec(Pg)] * 14
        + [pl.BlockSpec((1, 2), lambda w: (0, 0), memory_space=pltpu.VMEM)]
    )
    out_specs = tuple(bspec(Ng) for _ in range(6))
    out_shape = tuple(jax.ShapeDtypeStruct((Wg, 1, Ng), f32) for _ in range(6))

    px, py, an, vx, vy, om = pl.pallas_call(
        kernel,
        grid=(Wg,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        fuse_n(pos[..., 0]), fuse_n(pos[..., 1]), fuse_n(angle),
        fuse_n(vel[..., 0]), fuse_n(vel[..., 1]), fuse_n(ang_vel),
        fuse_n(inv_mass), fuse_n(inv_inertia), fuse_n(dyn), fuse_n(kin),
        fuse_verts(verts_ax), fuse_verts(verts_ay),
        fuse_verts(verts_bx), fuse_verts(verts_by),
        fuse_p(nverts_a), fuse_p(nverts_b), fuse_p(radius_a), fuse_p(radius_b),
        fuse_p(friction), fuse_p(restitution),
        fuse_p(im_a), fuse_p(im_b), fuse_p(ii_a), fuse_p(ii_b),
        fuse_p(solve_allow.astype(f32)), fuse_p(valid.astype(f32)),
        body_a_g, body_b_g,
        gravity[:1],
    )

    def unfuse(x):  # [Wg, 1, Ng] -> [W, N]
        return x.reshape(W, N)

    return (
        jnp.stack([unfuse(px), unfuse(py)], -1),
        unfuse(an),
        jnp.stack([unfuse(vx), unfuse(vy)], -1),
        unfuse(om),
    )
