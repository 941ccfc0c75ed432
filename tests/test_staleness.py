"""Bounded-staleness contract under REAL speculative pressure (VERDICT r3
item 2).

The flagship pile bench ships tens of thousands of ``spec_dropped``
candidates per run on the argument that dropping SPECULATIVE (swept-margin)
candidates is bounded staleness, not corruption. SURVEY.md §4.6 calls silent
truncation the #1 hazard of the fixed-capacity design, so that argument must
be TESTED. These scenes force ``spec_dropped > 0`` with hard counters 0 on
both fast tiers (the batched slot kernel and the tile engine) and pin the
documented contract against the K=1 fresh-tables rollout:

- bodies whose dropped pairs never become contacts track the fresh-tables
  trajectory TIGHTLY (a dropped never-touching pair is exactly free);
- a dropped pair that DOES become a contact forms it at most K-1 frames
  late (possibly solved one-sided for those frames when only one row kept
  it — see the note in parallel.batched_rollout), so the impacted bodies
  match within ~closing_speed * (K-1) * dt, and the impactor NEVER tunnels;
- close-first ranking keeps live contacts in-slot: gravity presses every
  chain/lattice body into its ground contact each substep, so a ranking
  regression (a live contact evicted by a speculative candidate) sends
  bodies through the floor and fails the tight comparison immediately.
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


def _sliding_chain_scene(n=128, chain=24, drift=6.0):
    """A touching chain of circles resting on a frictionless ground, sliding
    uniformly at ``drift`` + an approacher descending onto the chain center
    at 3 m/s.

    The uniform drift + gravity headroom inflate every K-frame swept box,
    pulling SECOND neighbors in as speculative-only candidates: each
    interior chain row has 3 close candidates (ground + 2 touching
    neighbors) and 2+ speculative ones, so slot_capacity=4 guarantees spec
    pressure with zero hard overflow."""
    b = WorldBuilder(gravity=(0.0, -9.81))
    r = 0.45
    spacing = 2 * r
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(500.0, 0.5), friction=0.0)
    for i in range(chain):
        body = b.add_body(pos=(i * spacing, r), vel=(drift, 0.0))
        b.add_collider(body, Shape.circle(r), friction=0.0, restitution=0.5)
    # approacher: above the chain center, descending at 3 m/s; surface gap
    # 0.55 -> impact around frame 11 of 16 (mid-window for K=4)
    app = b.add_body(pos=(chain // 2 * spacing, 3 * r + 0.55),
                     vel=(drift, -3.0))
    b.add_collider(app, Shape.circle(r), friction=0.0, restitution=0.5)
    for i in range(n - chain - 2):
        body = b.add_body(pos=(500.0 + 10.0 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap, chain


def test_frame2_spec_drops_are_bounded_staleness():
    world, cap, chain = _sliding_chain_scene()
    worlds = par.replicate_world(world, 8)
    n_frames = 16

    cfgK = SolverConfig(substeps=4, slot_capacity=4, frames_per_broadphase=4)
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

    pos_k = np.asarray(out.bodies.pos)
    pos_1 = np.asarray(ref.bodies.pos)

    # world indexing: the static ground is body 0, chain bodies are
    # 1..chain, the approacher is chain+1
    # uninvolved chain bodies (away from the impact) track the fresh-tables
    # trajectory tightly: their dropped pairs (second neighbors moving in
    # lockstep) never became contacts. A close-first regression would evict
    # their ground contact and fail this hard.
    mid = chain // 2 + 1  # world index of the chain body under the approacher
    far = [i for i in range(1, chain + 1) if abs(i - mid) > 3]
    np.testing.assert_allclose(pos_k[:, far], pos_1[:, far], atol=5e-3)
    # every chain body stays ON the ground (nothing fell through)
    assert (pos_k[:, 1:chain + 1, 1] > 0.40).all()

    # the impact region: contact may form up to K-1 frames late (and can be
    # one-sided until the rebuild re-admits it), so the bound is the drift
    # over those frames: 3 m/s * 3 frames / 60 Hz = 0.15, doubled for the
    # post-bounce lever arm
    app = chain + 1
    near = [mid - 1, mid, mid + 1, app]
    np.testing.assert_allclose(pos_k[:, near], pos_1[:, near], atol=0.3)

    # no tunneling: the approacher ends ON/above the chain in BOTH rollouts
    # (it impacts ~frame 10, bounces against the recoiling chain body and
    # settles onto the chain top by frame 16), and the K-run's terminal
    # vertical velocity matches the fresh-tables run
    assert (pos_k[:, app, 1] > 2 * 0.45).all(), "approacher tunneled (K)"
    assert (pos_1[:, app, 1] > 2 * 0.45).all(), "approacher tunneled (K=1)"
    vy_k = np.asarray(out.bodies.vel[:, app, 1])
    vy_1 = np.asarray(ref.bodies.vel[:, app, 1])
    np.testing.assert_allclose(vy_k, vy_1, atol=0.5)


# ---------------------------------------------------------------------------
# tile-engine tier (pallas/tiles.py)
# ---------------------------------------------------------------------------


def _sliding_lattice_scene(n=768, side=26, drift=6.0):
    """A touching square lattice of circles resting on a ground slab (large
    set), sliding along +x + an approacher ahead of the front face being
    overtaken at 1.5 m/s relative. Tile-engine twin of the chain scene:
    second-ring lattice neighbors are speculative-only candidates, the 4
    touching neighbors + ground are close."""
    b = WorldBuilder(gravity=(0.0, -9.81))
    r = 0.45
    spacing = 2 * r
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(3000.0, 0.5), friction=0.0)
    count = 1  # the ground occupies slot 0 (n colliders == n bodies)
    rows = 4
    cols = side
    for row in range(rows):
        for col in range(cols):
            if count >= n - 200:
                break
            b_i = b.add_body(pos=(col * spacing, r + row * spacing),
                             vel=(drift, 0.0))
            b.add_collider(b_i, Shape.circle(r), friction=0.0,
                           restitution=0.5)
            count += 1
    lattice_end = count
    # approacher: ahead of the front column at lattice mid-height, slower
    app = b.add_body(pos=(cols * spacing + 0.35, r + spacing),
                     vel=(drift - 1.5, 0.0))
    b.add_collider(app, Shape.circle(r), friction=0.0, restitution=0.5)
    count += 1
    for i in range(n - count):
        body = b.add_body(pos=(8000.0 + 10.0 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=16 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap, lattice_end


def test_tiled_spec_drops_are_bounded_staleness():
    from starframe_tpu.tiled import tiled_rollout

    world, cap, lattice_end = _sliding_lattice_scene()
    n_frames = 20  # impact ~frame 14 (gap 0.35 at 1.5 m/s relative)

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

    pos_k = np.asarray(out.bodies.pos)
    pos_1 = np.asarray(ref.bodies.pos)
    app = lattice_end  # approacher body index

    # the lattice interior (everything except the front column the
    # approacher hits) tracks the fresh-tables run tightly; nothing falls
    # through the ground
    front = {1 + row * 26 + 25 for row in range(4)}  # front column bodies
    interior = [i for i in range(1, lattice_end) if i not in front]
    np.testing.assert_allclose(pos_k[interior], pos_1[interior], atol=5e-3)
    assert (pos_k[1:lattice_end, 1] > 0.40).all(), "lattice fell through"

    # impacted region: bounded lateness (1.5 m/s * 3 frames / 60 = 0.075,
    # with slack for the post-impact shuffle)
    np.testing.assert_allclose(pos_k[app], pos_1[app], atol=0.2)

    # the approacher was overtaken and picked up speed from the impact in
    # both rollouts (never tunneled through the front face)
    vx_k = float(np.asarray(out.bodies.vel[app, 0]))
    vx_1 = float(np.asarray(ref.bodies.vel[app, 0]))
    assert vx_k > 4.6 and vx_1 > 4.6, (
        f"approacher was never hit (vx K={vx_k:.2f}, K1={vx_1:.2f})")


# ---------------------------------------------------------------------------
# margin tier (r4): close-but-not-touching candidates drop SOFTLY
# ---------------------------------------------------------------------------


def _margin_crowd_scene(n=128, gap=0.02):
    """A row of circles resting on ground, spaced with a ``gap`` surface
    separation that is inside the close box (0.5 * margin = 0.025) but
    outside the touch box (0.1 * margin = 0.005): each interior row has ONE
    touching candidate (the ground) and two margin-close neighbors, so
    slot_capacity=2 forces margin drops with zero touch overflow. A kicker
    circle descends onto the row center to prove a dropped margin pair that
    closes re-enters as a touch candidate at the rebuild (no tunneling)."""
    b = WorldBuilder(gravity=(0.0, -9.81))
    r = 0.45
    spacing = 2 * r + gap
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(500.0, 0.5), friction=0.0)
    row = 12
    for i in range(row):
        body = b.add_body(pos=(i * spacing, r))
        b.add_collider(body, Shape.circle(r), friction=0.0, restitution=0.3)
    kick = b.add_body(pos=(row // 2 * spacing, 3 * r + 0.3), vel=(0.0, -2.0))
    b.add_collider(kick, Shape.circle(r), friction=0.0, restitution=0.3)
    for i in range(n - row - 2):
        body = b.add_body(pos=(500.0 + 10.0 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap, row


def test_frame2_margin_drops_are_soft():
    """margin_dropped > 0 with slot_overflow == 0: dropping a close-but-not-
    touching candidate is bounded staleness — the pair re-enters as a TOUCH
    candidate once it actually closes (next rebuild), so the kicker lands on
    the row without tunneling and the row never falls through its (touching,
    always-in-slot) ground contacts."""
    world, cap, row = _margin_crowd_scene()
    worlds = par.replicate_world(world, 8)
    n_frames = 16

    cfg = SolverConfig(substeps=4, slot_capacity=2, frames_per_broadphase=4)
    assert par.frame2_shapes_ok(worlds, cfg)
    out, _, diag = jax.jit(
        lambda w: par.batched_rollout(w, cfg, cap.max_pairs, n_frames,
                                      interpret=True))(worlds)

    assert int(np.asarray(diag["margin_dropped"])) > 0, (
        "scene must actually drop margin-close candidates")
    assert int(np.asarray(diag["slot_overflow"])) == 0, (
        "touch-first ranking must keep touching contacts in-slot")

    pos = np.asarray(out.bodies.pos)
    # world indexing: ground is body 0, row bodies 1..row, kicker row+1
    # the row rests on its ground contacts (touch tier never dropped)
    assert (pos[:, 1:row + 1, 1] > 0.40).all(), "row fell through the ground"
    # the kicker landed ON the row (its pair entered as touch at a rebuild),
    # never tunneled into/past it
    assert (pos[:, row + 1, 1] > 2 * 0.45).all(), "kicker tunneled into the row"
