"""v2 slot-kernel correctness: lane_gather, slot tables vs brute-force
oracle, and whole-frame kernel vs the XLA path — all in Pallas interpret
mode so they run on any backend (the TPU-compiled path is exercised by
bench.py and the TPU parity test in this file when a TPU is present)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starframe_tpu as sf
from starframe_tpu.config import Capacity, SolverConfig
from starframe_tpu.parallel import _frame2_arrays, frame2_step, replicate_world
from starframe_tpu.shapes import Shape
from starframe_tpu.state import WorldBuilder


# ---------------------------------------------------------------------------
# lane_gather
# ---------------------------------------------------------------------------


def test_lane_gather_matches_take_along_axis(rng):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from starframe_tpu.pallas.lanegather import lane_gather

    src = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, size=(8, 384)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = lane_gather(s_ref[:], i_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# ---------------------------------------------------------------------------
# shared scene: 1 static ground + 127 mixed dynamic bodies (M == N == 128)
# ---------------------------------------------------------------------------


def _scene(n=128, seed=0, sensor_idx=None):
    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(40.0, 0.5), friction=0.5)
    cols = int(np.ceil(np.sqrt((n - 1) * 2)))
    for i in range(n - 1):
        row, col = divmod(i, cols)
        pos = (-(cols - 1) * 0.55 + col * 1.1 + rng.uniform(-0.05, 0.05),
               0.7 + row * 1.1)
        is_sensor = sensor_idx is not None and i == sensor_idx
        # a body whose only collider is a sensor gets no mass from it
        body = b.add_body(pos=pos, vel=rng.normal(scale=0.3, size=2),
                          ang_vel=float(rng.normal(scale=0.2)),
                          mass=1.0 if is_sensor else None,
                          inertia=0.1 if is_sensor else None)
        shape = Shape.circle(0.45) if i % 2 == 0 else Shape.box(0.4, 0.35)
        b.add_collider(body, shape, friction=0.5, restitution=0.2,
                       sensor=is_sensor)
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap


# ---------------------------------------------------------------------------
# slot tables vs brute-force numpy oracle
# ---------------------------------------------------------------------------


def test_slot_tables_match_bruteforce_oracle():
    from starframe_tpu.pallas.slots import build_slot_tables

    world, cap = _scene(n=128, seed=3)
    cfg = SolverConfig(slot_capacity=8)
    worlds = replicate_world(world, 2)
    body, col = _frame2_arrays(worlds, cfg)
    C = cfg.slot_capacity
    partner, slot_act, count, _touch, count_close, _budget = jax.tree.map(
        np.asarray,
        build_slot_tables(
            body["posx"], body["posy"], body["ang"], body["velx"], body["vely"],
            body["responds"], body["moves"],
            col["cbody"], col["vlx"], col["vly"], col["radius"],
            col["layer"], col["lmask"], col["active"], col["sensor"],
            C=C, margin=cfg.contact_margin, dt=cfg.dt, interpret=True,
        ),
    )

    # numpy oracle: swept AABBs + full pair scan
    from starframe_tpu.broadphase import compute_aabbs
    from starframe_tpu.narrowphase import world_verts

    lo, hi = jax.tree.map(
        np.asarray,
        compute_aabbs(world, world_verts(world), cfg.contact_margin, cfg.dt),
    )
    cbody = np.asarray(world.colliders.body_idx)
    inv_mass = np.asarray(world.bodies.inv_mass)
    inv_inertia = np.asarray(world.bodies.inv_inertia)
    responds = (inv_mass > 0) | (inv_inertia > 0)
    M = len(cbody)
    for i in range(M):
        if not responds[cbody[i]]:
            assert count[0, i] == 0, f"static collider {i} owns slots"
            continue
        expect = [
            j for j in range(M)
            if j != i and cbody[j] != cbody[i]
            and np.all(lo[i] <= hi[j]) and np.all(lo[j] <= hi[i])
        ]
        assert count[0, i] == len(expect), f"row {i} count"
        got = sorted(partner[0, c, i] for c in range(min(C, len(expect)))
                     if slot_act[0, c, i] > 0)
        assert got == sorted(expect)[: len(got)], f"row {i} partners"
    # close candidates are a subset of all candidates
    assert np.all(count_close <= count)
    # both worlds identical
    np.testing.assert_array_equal(partner[0], partner[1])


# ---------------------------------------------------------------------------
# whole-frame kernel vs XLA path (both manifold_refresh='frame')
# ---------------------------------------------------------------------------


def _run_parity(n_frames=3, seed=0, interpret=True):
    from starframe_tpu.step import step

    world, cap = _scene(n=128, seed=seed)
    cfg = SolverConfig(substeps=4, slot_capacity=8, manifold_refresh="frame")
    worlds = replicate_world(world, 2)
    # diversify the two worlds a bit
    vel = worlds.bodies.vel.at[1].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(1), worlds.bodies.vel.shape[1:])
        * (worlds.bodies.inv_mass[1] > 0)[:, None]
    )
    worlds = dataclasses.replace(
        worlds, bodies=dataclasses.replace(worlds.bodies, vel=vel)
    )

    w_ker = worlds
    count_max = 0
    for _ in range(n_frames):
        w_ker, touched, partner, (count, _t, _close), _ = frame2_step(
            w_ker, cfg, interpret=interpret)
        count_max = max(count_max, int(np.asarray(count).max()))
    assert count_max <= cfg.slot_capacity, "slot overflow during parity run"

    w_xla = worlds
    step_v = jax.jit(jax.vmap(lambda w: step(w, cfg, cap.max_pairs)[0]))
    for _ in range(n_frames):
        w_xla = step_v(w_xla)
    return w_ker, w_xla, touched, partner, cfg


def test_frame2_matches_xla_path():
    w_ker, w_xla, *_ = _run_parity()
    pk = np.asarray(w_ker.bodies.pos)
    px = np.asarray(w_xla.bodies.pos)
    np.testing.assert_allclose(pk, px, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.angle), np.asarray(w_xla.bodies.angle), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.vel), np.asarray(w_xla.bodies.vel), atol=2e-2)


def test_frame2_touch_events_match_xla_contacts():
    """VERDICT r1 item 4: in-frame touch events must agree across paths."""
    from starframe_tpu.step import step

    world, cap = _scene(n=128, seed=7)
    cfg = SolverConfig(substeps=4, slot_capacity=8, manifold_refresh="frame")
    worlds = replicate_world(world, 2)
    w = worlds
    for _ in range(2):
        w, touched, partner, count, _ = frame2_step(w, cfg, interpret=True)

    # slot touches -> set of unordered collider pairs, world 0
    t = np.asarray(touched[0])  # [C, M]
    p = np.asarray(partner[0])
    M = p.shape[1]
    keys_ker = set()
    for c in range(t.shape[0]):
        for i in range(M):
            if t[c, i] > 0:
                a, b = sorted((i, int(p[c, i])))
                keys_ker.add(a * M + b)

    # XLA path: step twice, collect touching contacts of the final frame
    w_xla = worlds
    step_c = jax.jit(jax.vmap(lambda wd: step(wd, cfg, cap.max_pairs)[:2]))
    for _ in range(2):
        w_xla, contacts = step_c(w_xla)
    touching = np.asarray(contacts.touching[0])
    ca = np.asarray(contacts.collider_a[0])
    cb = np.asarray(contacts.collider_b[0])
    keys_xla = {
        int(min(a, b)) * M + int(max(a, b))
        for a, b, tch in zip(ca, cb, touching) if tch
    }
    assert keys_ker == keys_xla


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_frame2_compiled_matches_xla_on_tpu():
    w_ker, w_xla, *_ = _run_parity(interpret=False)
    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.pos), np.asarray(w_xla.bodies.pos), atol=5e-4)


# ---------------------------------------------------------------------------
# joints in the kernel (fused-Jacobi tier) vs XLA jacobi path
# ---------------------------------------------------------------------------


def _jointed_scene(n=128, seed=11):
    """Ground + mixed bodies, plus joints covering every type: a rope chain
    (distance), a pendulum (pin), a weld pair, an angle-limited pair, and a
    motorized pair."""
    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(60.0, 0.5), friction=0.5)
    anchor = b.add_static(pos=(0.0, 14.0))
    b.add_collider(anchor, Shape.circle(0.1), mask=0)

    # rope chain of particles hanging from the anchor
    chain = []
    for k in range(6):
        p = b.add_body(pos=(0.3 * k, 13.0 - 0.6 * k), mass=0.5, inertia=np.inf)
        b.add_collider(p, Shape.circle(0.1), mask=0)
        chain.append(p)
    b.distance_joint(anchor, chain[0], rest=1.0)
    for a_, b_ in zip(chain, chain[1:]):
        b.distance_joint(a_, b_, rest=0.7)

    # pendulum (pin), weld pair, angle-range pair, motor pair
    pl_ = b.add_body(pos=(6.0, 12.0))
    b.add_collider(pl_, Shape.box(0.8, 0.2))
    b.pin_joint(anchor, pl_, world_point=(6.0, 13.0))
    w1 = b.add_body(pos=(-6.0, 5.0))
    b.add_collider(w1, Shape.box(0.5, 0.5))
    w2 = b.add_body(pos=(-6.0, 6.1))
    b.add_collider(w2, Shape.box(0.5, 0.5))
    b.weld_joint(w1, w2, world_point=(-6.0, 5.55))
    r1 = b.add_body(pos=(9.0, 8.0))
    b.add_collider(r1, Shape.box(0.6, 0.2))
    r2 = b.add_body(pos=(10.3, 8.0))
    b.add_collider(r2, Shape.box(0.6, 0.2))
    b.pin_joint(r1, r2, world_point=(9.65, 8.0))
    b.angle_limit(r1, r2, -0.4, 0.4)
    m1 = b.add_body(pos=(-10.0, 4.0))
    b.add_collider(m1, Shape.circle(0.5))
    m2 = b.add_body(pos=(-10.0, 4.0))
    b.add_collider(m2, Shape.box(1.2, 0.1), mask=0)
    b.pin_joint(m1, m2, world_point=(-10.0, 4.0))
    b.angular_motor(m1, m2, speed=2.0, max_torque=50.0)

    # filler dynamic bodies so N hits the 128 alignment
    i = 0
    while len(b._bodies) < n:
        body = b.add_body(pos=(14.0 + (i % 8) * 1.1, 0.7 + (i // 8) * 1.1))
        b.add_collider(body, Shape.circle(0.45), friction=0.5)
        i += 1
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=len(b._joints), max_verts=4)
    return b.build(cap)


@pytest.mark.parametrize("interpret", [True])
def test_frame2_joints_match_xla_jacobi(interpret):
    from starframe_tpu.step import step

    world, cap = _jointed_scene()
    cfg = SolverConfig(substeps=4, slot_capacity=8, joint_solver="jacobi",
                       manifold_refresh="frame")
    worlds = replicate_world(world, 2)

    w_ker = worlds
    for _ in range(3):
        w_ker, touched, partner, count, _ = frame2_step(
            w_ker, cfg, interpret=interpret)

    w_xla = worlds
    step_v = jax.jit(jax.vmap(lambda w: step(w, cfg, cap.max_pairs)[0]))
    for _ in range(3):
        w_xla = step_v(w_xla)

    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.pos), np.asarray(w_xla.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.angle), np.asarray(w_xla.bodies.angle),
        atol=1e-3)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_frame2_joints_compiled_on_tpu():
    test_frame2_joints_match_xla_jacobi(interpret=False)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_broadphase_reuse_matches_per_frame_tables():
    """cfg.frames_per_broadphase=K rebuilds slot tables every K-th frame
    with K-inflated sweeps — a candidate SUPERSET, so trajectories must
    match the every-frame-tables rollout (only fp summation order differs
    via slot ordering)."""
    import starframe_tpu.parallel as par

    world, cap = _scene(n=128, seed=9)
    worlds = replicate_world(world, 8)
    cfg1 = SolverConfig(substeps=4, slot_capacity=10, frames_per_broadphase=1)
    cfg4 = SolverConfig(substeps=4, slot_capacity=10, frames_per_broadphase=4)

    r1 = jax.jit(lambda w: par.batched_rollout(w, cfg1, cap.max_pairs, 30)[0])
    r4 = jax.jit(lambda w: par.batched_rollout(w, cfg4, cap.max_pairs, 30)[0])
    w1 = r1(worlds)
    w4 = r4(worlds)
    np.testing.assert_allclose(
        np.asarray(w4.bodies.pos), np.asarray(w1.bodies.pos), atol=2e-3)


@pytest.mark.parametrize("interpret", [True])
def test_frame2_joints_match_xla_colored(interpret):
    """VERDICT r2 item 6: the kernel's graph-colored Gauss-Seidel joint tier
    (sequential color passes inside the substep) must match the XLA colored
    path — the default, stiffer joint solver."""
    from starframe_tpu.step import step

    world, cap = _jointed_scene()
    cfg = SolverConfig(substeps=4, slot_capacity=8, joint_solver="colored",
                       manifold_refresh="frame")
    worlds = replicate_world(world, 2)

    w_ker = worlds
    for _ in range(3):
        w_ker, *_ = frame2_step(w_ker, cfg, interpret=interpret)

    w_xla = worlds
    step_v = jax.jit(jax.vmap(lambda w: step(w, cfg, cap.max_pairs)[0]))
    for _ in range(3):
        w_xla = step_v(w_xla)

    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.pos), np.asarray(w_xla.bodies.pos), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(w_ker.bodies.angle), np.asarray(w_xla.bodies.angle),
        atol=1e-3)


def test_frame2_colored_chain_stiffer_than_jacobi():
    """Long hanging chain: colored GS holds rest lengths visibly better than
    averaged Jacobi (the reason colored is the default)."""
    import dataclasses as dc

    b = WorldBuilder(gravity=(0.0, -9.81))
    anchor = b.add_static(pos=(0.0, 10.0))
    b.add_collider(anchor, Shape.circle(0.1), mask=0)
    prev = anchor
    n_links = 24
    for i in range(n_links):
        link = b.add_body(pos=(0.4 * (i + 1), 10.0), mass=1.0)
        b.add_collider(link, Shape.circle(0.15), mask=0)
        b.distance_joint(prev, link, rest=0.4)
        prev = link
    n = 128
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=4 * n,
                   max_joints=n_links, max_verts=4)
    world, cap = b.build(cap)
    worlds = replicate_world(world, 2)

    def total_stretch(w):
        pos = np.asarray(w.bodies.pos[0])
        d = np.linalg.norm(np.diff(pos[:n_links + 1], axis=0), axis=1)
        return float(np.abs(d - 0.4).sum())

    results = {}
    for solver in ("colored", "jacobi"):
        cfg = SolverConfig(substeps=6, slot_capacity=8, joint_solver=solver,
                           manifold_refresh="frame")
        w = worlds
        for _ in range(10):
            w, *_ = frame2_step(w, cfg, interpret=True)
        results[solver] = total_stretch(w)
    assert results["colored"] < 0.6 * results["jacobi"], results


def test_lane_gather_debug_oob_poisons():
    """DEBUG_OOB turns the silent out-of-range contract (reads src[0]) into
    NaN poison — and a full frame on real data stays NaN-free under it,
    proving every shipped call site masks correctly (VERDICT r2 item 10)."""
    from starframe_tpu.pallas import lanegather

    src = jnp.arange(256, dtype=jnp.float32)[None].repeat(8, 0)
    idx = jnp.full((8, 128), 999, jnp.int32)  # all out of range
    ok = lanegather.lane_gather(src, idx)
    np.testing.assert_array_equal(np.asarray(ok), 0.0)  # deterministic src[0]

    lanegather.DEBUG_OOB = True
    try:
        # The poison check below INTENDS to produce NaN; suspend the suite's
        # jax_debug_nans guard (tests/conftest.py) around just that call.
        jax.config.update("jax_debug_nans", False)
        try:
            bad = lanegather.lane_gather(src, idx)
            assert np.isnan(np.asarray(bad)).all()
        finally:
            jax.config.update("jax_debug_nans", True)

        # representative frame under poison mode: no NaN may escape
        world, cap = _scene(n=128, seed=2)
        cfg = SolverConfig(substeps=2, slot_capacity=8,
                           manifold_refresh="frame")
        worlds = replicate_world(world, 2)
        w2, *_ = frame2_step(worlds, cfg, interpret=True)
        assert np.isfinite(np.asarray(w2.bodies.pos)).all()
        assert np.isfinite(np.asarray(w2.bodies.vel)).all()
    finally:
        lanegather.DEBUG_OOB = False


def test_precomputed_elig_matches_inkernel():
    """The rollout-amortized static eligibility mask (build_elig_mask) must
    reproduce the slot tables bit-for-bit vs the builder's in-kernel
    eligibility path — including the partner-aware K-frame mode and with a
    sensor in the scene (row-ownership rules differ for sensors)."""
    from starframe_tpu.parallel import frame2_elig, frame2_tables

    world, cap = _scene(n=128, seed=5, sensor_idx=3)
    cfg = SolverConfig(slot_capacity=8, frames_per_broadphase=4)
    worlds = replicate_world(world, 2)
    elig = frame2_elig(worlds, cfg, interpret=True)
    for frames in (1, 4):
        a = frame2_tables(worlds, cfg, frames=frames, interpret=True)
        b = frame2_tables(worlds, cfg, frames=frames, interpret=True,
                          elig=elig)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_tighten_joint_colors_clamps_and_preserves_physics():
    """Scenes clamp max_joint_colors to the actual chromatic count; running
    the colored solver with the tight bound matches the loose default
    exactly (the dropped passes are all-masked no-ops)."""
    from starframe_tpu.scenes import rope_bridge
    from starframe_tpu.step import step

    scene = rope_bridge(n_particles=12, n_loads=1)
    assert scene.config.max_joint_colors < 8
    loose = dataclasses.replace(scene.config, max_joint_colors=8)
    wa = wb = scene.world
    for _ in range(5):
        wa, _, _ = step(wa, scene.config, scene.capacity.max_pairs)
        wb, _, _ = step(wb, loose, scene.capacity.max_pairs)
    np.testing.assert_allclose(np.asarray(wa.bodies.pos),
                               np.asarray(wb.bodies.pos), atol=1e-6)


# ---------------------------------------------------------------------------
# heterogeneous-topology batches (VERDICT r3 item 10): per-world owner tables
# ---------------------------------------------------------------------------


def _compound_scene(n=128, seed=3):
    """Same Capacity as _scene but a DIFFERENT collider->body topology:
    every 4th dynamic body is a compound owning 3 colliders (an L of boxes
    + a circle cap), so cbody is non-iota and bodies outnumber... rather,
    colliders outnumber bodies."""
    rng = np.random.default_rng(seed)
    b = WorldBuilder(gravity=(0.0, -9.81))
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(40.0, 0.5), friction=0.5)
    n_col = 1
    n_bod = 1
    cols = 12
    i = 0
    while True:
        compound = i % 4 == 0
        need = 3 if compound else 1
        if n_col + need > n or n_bod + 1 > n:
            break
        row, col = divmod(i, cols)
        pos = (-(cols - 1) * 0.55 + col * 1.1 + rng.uniform(-0.05, 0.05),
               0.7 + row * 1.1)
        body = b.add_body(pos=pos, vel=rng.normal(scale=0.3, size=2),
                          ang_vel=float(rng.normal(scale=0.2)))
        if compound:
            b.add_collider(body, Shape.box(0.3, 0.12), friction=0.5,
                           restitution=0.2)
            b.add_collider(body, Shape.box(0.12, 0.3), friction=0.5,
                           restitution=0.2, offset=(0.18, 0.2))
            b.add_collider(body, Shape.circle(0.14), friction=0.5,
                           restitution=0.2, offset=(-0.25, 0.0))
        else:
            b.add_collider(body, Shape.circle(0.4) if i % 2 else
                           Shape.box(0.35, 0.3), friction=0.5,
                           restitution=0.2)
        n_col += need
        n_bod += 1
        i += 1
    cap = Capacity(max_bodies=n, max_colliders=n, max_pairs=8 * n,
                   max_joints=0, max_verts=4)
    world, cap = b.build(cap)
    return world, cap


def test_frame2_heterogeneous_topology_batch():
    """TWO DIFFERENT topologies in ONE kernel batch
    (cfg.batch_uniform_topology=False): world 0 is the iota scene, world 1
    mixes 3-collider compounds — parity against each world run SEPARATELY
    through the uniform-dot kernel (there world 0's topology IS that
    world's topology, so the MXU-dot reduction is correct per world).

    Why kernel-vs-kernel and not kernel-vs-vmap(step): the only code under
    test is the owner-table reduction; the uniform kernel is already pinned
    against the XLA path by test_frame2_matches_xla_path, so parity here is
    transitive. The two reductions (MXU one-hot dot vs VPU gather-sum) are
    bitwise identical until first contact, then differ at f32
    summation-order level (~1e-6) and amplify chaotically in a pile — so
    the horizon stops a few frames past first contact, not 20."""
    from starframe_tpu.parallel import frame2_shapes_ok

    wa, cap = _scene(n=128, seed=0)
    wb, _ = _compound_scene(n=128, seed=3)
    assert not np.array_equal(np.asarray(wa.colliders.body_idx),
                              np.asarray(wb.colliders.body_idx)), (
        "test needs genuinely different topologies")
    worlds = jax.tree.map(lambda a, b_: jnp.stack([a, b_]), wa, wb)
    cfg = SolverConfig(substeps=4, slot_capacity=8, manifold_refresh="frame",
                       batch_uniform_topology=False,
                       max_colliders_per_body=3)
    cfg_uni = dataclasses.replace(cfg, batch_uniform_topology=True)
    assert frame2_shapes_ok(worlds, cfg)

    # first ground contact happens ~frame 9 of free fall; run a few frames
    # past it so the per-world owner reduction actually carries contact
    # corrections — a shorter run would compare pure gravity integration
    # and prove nothing
    n_frames = 13
    w_ker = worlds
    any_touch = 0.0
    for _ in range(n_frames):
        w_ker, touched, partner, (count, count_touch, _), aux = frame2_step(
            w_ker, cfg, interpret=True)
        any_touch = max(any_touch, float(np.asarray(touched).max()))
        assert int(np.asarray(count_touch).max()) <= cfg.slot_capacity
        assert int(np.asarray(aux["owner_overflow"])) == 0
    assert any_touch > 0, "scene never made contact — parity run is vacuous"

    for w_idx, w1 in enumerate((wa, wb)):
        wu = jax.tree.map(lambda a: jnp.stack([a]), w1)
        for _ in range(n_frames):
            wu, *_ = frame2_step(wu, cfg_uni, interpret=True)
        np.testing.assert_allclose(
            np.asarray(w_ker.bodies.pos[w_idx]),
            np.asarray(wu.bodies.pos[0]), atol=1e-3,
            err_msg=f"world {w_idx}: owner-table reduction diverged")
        np.testing.assert_allclose(
            np.asarray(w_ker.bodies.vel[w_idx]),
            np.asarray(wu.bodies.vel[0]), atol=5e-2,
            err_msg=f"world {w_idx}: owner-table reduction diverged")


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_frame2_heterogeneous_compiled_on_tpu():
    """The owner-table reduction lowered through Mosaic: compiled
    heterogeneous batch vs compiled per-world uniform runs (same backend,
    same horizon/tolerance rationale as the interpret test above)."""
    wa, _ = _scene(n=128, seed=0)
    wb, _ = _compound_scene(n=128, seed=3)
    worlds = jax.tree.map(lambda a, b_: jnp.stack([a, b_]), wa, wb)
    cfg = SolverConfig(substeps=4, slot_capacity=8, manifold_refresh="frame",
                       batch_uniform_topology=False,
                       max_colliders_per_body=3)
    cfg_uni = dataclasses.replace(cfg, batch_uniform_topology=True)

    n_frames = 13
    stepk = jax.jit(lambda w: frame2_step(w, cfg)[0])
    w_ker = worlds
    for _ in range(n_frames):
        w_ker = stepk(w_ker)

    stepu = jax.jit(lambda w: frame2_step(w, cfg_uni)[0])
    for w_idx, w1 in enumerate((wa, wb)):
        wu = jax.tree.map(lambda a: jnp.stack([a, a]), w1)
        for _ in range(n_frames):
            wu = stepu(wu)
        np.testing.assert_allclose(
            np.asarray(w_ker.bodies.pos[w_idx]),
            np.asarray(wu.bodies.pos[0]), atol=1e-3,
            err_msg=f"world {w_idx}: compiled owner-table path diverged")


def test_owner_tables_and_overflow_counter():
    """collider_owner_tables lists each body's collider rows exactly, and a
    too-small max_colliders_per_body surfaces as the HARD owner_overflow
    counter instead of silently dropping corrections."""
    from starframe_tpu.parallel import collider_owner_tables

    wb_, _ = _compound_scene(n=128, seed=3)
    worlds = replicate_world(wb_, 2)
    cfg = SolverConfig(batch_uniform_topology=False, max_colliders_per_body=3)
    bcol, bmask, ovf = jax.jit(
        lambda w: collider_owner_tables(w, cfg))(worlds)
    assert int(np.asarray(ovf)) == 0
    cb = np.asarray(wb_.colliders.body_idx)
    from starframe_tpu.state import COL_ACTIVE

    act = (np.asarray(wb_.colliders.flags) & COL_ACTIVE) != 0
    bcol0, bmask0 = np.asarray(bcol[0]), np.asarray(bmask[0])
    for nb in range(wb_.bodies.n):
        mine = sorted(np.nonzero((cb == nb) & act)[0].tolist())
        got = sorted(bcol0[k, nb] for k in range(3) if bmask0[k, nb] > 0)
        assert got == mine, f"body {nb}: {got} != {mine}"

    cfg1 = SolverConfig(batch_uniform_topology=False,
                        max_colliders_per_body=1)
    _, _, ovf1 = jax.jit(
        lambda w: collider_owner_tables(w, cfg1))(worlds)
    assert int(np.asarray(ovf1)) > 0, "3-collider compounds must overflow"
