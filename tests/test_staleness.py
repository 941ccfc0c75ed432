"""Bounded-staleness contract under REAL speculative pressure (VERDICT r3
item 2).

The flagship pile bench ships tens of thousands of ``spec_dropped``
candidates per run on the argument that dropping SPECULATIVE (swept-margin)
candidates is bounded staleness, not corruption: close-first ranking keeps
touching/imminent contacts in-slot, and a dropped speculative pair re-enters
at the next rebuild (<= K-1 frames) — before it can become a contact, thanks
to the positional staleness guard. SURVEY.md §4.6 calls silent truncation
the #1 hazard of the fixed-capacity design, so that argument must be TESTED:
these scenes force ``spec_dropped > 0`` with hard counters 0 and pin the
trajectory against the K=1 fresh-tables rollout.

Both fast tiers are covered: the batched slot kernel (frame2) and the
single-world tile engine. If close-first ranking regressed (a live contact
dropped instead of a speculative one) the chains/lattices here would collapse
and the trajectory comparison fails; if re-admission regressed (drops not
re-entering at rebuild) the approacher body would tunnel instead of bouncing.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import starframe_tpu as sf
from starframe_tpu import parallel as par
from starframe_tpu.config import Capacity, SolverConfig
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


# ---------------------------------------------------------------------------
# batched slot-kernel tier (pallas/slots.py + frame2.py)
# ---------------------------------------------------------------------------


def _drifting_chain_scene(n=128, chain=24, drift=(6.0, 0.0)):
    """A touching chain of circles drifting uniformly (contacts persist, no
    relative motion) + an approacher closing on the chain at ~3 m/s.

    The uniform drift inflates every K-frame swept box by ~|v|*K*dt, pulling
    SECOND neighbors into the candidate set as speculative-only candidates:
    with slot_capacity=3 each interior chain row has 2 close (touching)
    candidates + 2 speculative ones -> count=4 > C=3 > count_close=2, i.e.
    guaranteed spec pressure with zero hard overflow. The dropped pairs are
    second neighbors that NEVER touch (the chain moves rigidly), so the
    trajectory must track the fresh-tables rollout tightly."""
    b = WorldBuilder(gravity=(0.0, 0.0))
    r = 0.45
    spacing = 2 * r  # exactly touching
    for i in range(chain):
        body = b.add_body(pos=(i * spacing, 0.0), vel=drift)
        b.add_collider(body, Shape.circle(r), friction=0.0, restitution=0.6)
    # approacher: above the chain center, closing at 3 m/s relative
    app = b.add_body(pos=(chain // 2 * spacing, 2 * r + 0.55),
                     vel=(drift[0], drift[1] - 3.0))
    b.add_collider(app, Shape.circle(r), friction=0.0, restitution=0.6)
    # spectators far away (keep N at a lane multiple)
    for i in range(n - chain - 1):
        body = b.add_body(pos=(500.0 + 10.0 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap, chain


def test_frame2_spec_drops_are_bounded_staleness():
    world, cap, chain = _drifting_chain_scene()
    worlds = par.replicate_world(world, 8)
    n_frames = 16

    cfgK = SolverConfig(substeps=4, slot_capacity=3, frames_per_broadphase=4)
    cfg1 = dataclasses.replace(cfgK, frames_per_broadphase=1)
    assert par.frame2_shapes_ok(worlds, cfgK)

    out, _, diag = jax.jit(
        lambda w: par.batched_rollout(w, cfgK, cap.max_pairs, n_frames,
                                      interpret=True))(worlds)
    ref, _, diag1 = jax.jit(
        lambda w: par.batched_rollout(w, cfg1, cap.max_pairs, n_frames,
                                      interpret=True))(worlds)

    # the whole point: REAL speculative pressure, zero hard overflow
    assert int(np.asarray(diag["spec_dropped"])) > 0, (
        "scene must actually drop speculative candidates or this test "
        "pins nothing")
    assert int(np.asarray(diag["slot_overflow"])) == 0, (
        "close-first ranking must keep live contacts in-slot")
    assert int(np.asarray(diag1["slot_overflow"])) == 0

    # bounded staleness: the K-frame rollout with drops tracks the
    # fresh-tables trajectory (dropped pairs never became contacts; the
    # approacher's pair was re-admitted before impact)
    np.testing.assert_allclose(
        np.asarray(out.bodies.pos[:, :chain + 1]),
        np.asarray(ref.bodies.pos[:, :chain + 1]), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.bodies.vel[:, :chain + 1]),
        np.asarray(ref.bodies.vel[:, :chain + 1]), atol=2e-2)

    # physical sanity: the approacher actually hit the chain and bounced
    # (vertical velocity reversed from -3 towards positive)
    vy = float(np.asarray(out.bodies.vel[0, chain, 1]))
    assert vy > 0.5, f"approacher never bounced (vy={vy})"


# ---------------------------------------------------------------------------
# tile-engine tier (pallas/tiles.py)
# ---------------------------------------------------------------------------


def _drifting_lattice_scene(n=1024, side=30, drift=6.0):
    """A touching square lattice of circles drifting along +x + an
    approacher ahead of the front face being overtaken at 1.5 m/s relative.

    Same construction as the chain scene at tile-engine scale: the drift
    inflates every swept box so the lattice's SECOND ring becomes
    speculative candidates (count ~12-16) while only the 4 touching
    neighbors are close -> slot_capacity=8 gives guaranteed spec drops with
    hard counters 0."""
    b = WorldBuilder(gravity=(0.0, 0.0))
    r = 0.45
    spacing = 2 * r
    count = 0
    for row in range(side):
        for col in range(side):
            if count >= n - 1:
                break
            b_i = b.add_body(pos=(col * spacing, row * spacing),
                             vel=(drift, 0.0))
            b.add_collider(b_i, Shape.circle(r), friction=0.0,
                           restitution=0.5)
            count += 1
    # approacher: ahead of the lattice's front column, mid-height, slower
    app_x = side * spacing + 0.35
    app = b.add_body(pos=(app_x, (side // 2) * spacing),
                     vel=(drift - 1.5, 0.0))
    b.add_collider(app, Shape.circle(r), friction=0.0, restitution=0.5)
    count += 1
    # pad with far spectators to exactly n bodies == n colliders
    for i in range(n - count):
        body = b.add_body(pos=(5000.0 + 10.0 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=16 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap


def test_tiled_spec_drops_are_bounded_staleness():
    from starframe_tpu.tiled import tiled_rollout

    (world, cap) = _drifting_lattice_scene()
    n_frames = 8

    cfgK = SolverConfig(substeps=4, slot_capacity=8, broadphase="grid",
                        grid_cell_capacity=10, frames_per_broadphase=4)
    cfg1 = dataclasses.replace(cfgK, frames_per_broadphase=1)

    out, diag = jax.jit(
        lambda w: tiled_rollout(w, cfgK, n_frames, interpret=True))(world)
    ref, diag1 = jax.jit(
        lambda w: tiled_rollout(w, cfg1, n_frames, interpret=True))(world)

    assert int(np.asarray(diag["spec_dropped"])) > 0, (
        "lattice must actually drop speculative candidates")
    assert int(np.asarray(diag["slot_overflow"])) == 0
    assert int(np.asarray(diag["window_overflow"])) == 0
    assert int(np.asarray(diag1["slot_overflow"])) == 0

    np.testing.assert_allclose(
        np.asarray(out.bodies.pos), np.asarray(ref.bodies.pos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.bodies.vel), np.asarray(ref.bodies.vel), atol=2e-2)

    # the approacher (body 900) was overtaken and pushed forward: its
    # velocity picked up from the impact rather than being tunneled through
    app_idx = 900
    vx = float(np.asarray(out.bodies.vel[app_idx, 0]))
    assert vx > 4.6, f"approacher was never hit (vx={vx})"
