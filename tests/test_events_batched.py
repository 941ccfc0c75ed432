"""Contact events + batched rollout + Pallas-path determinism
(BASELINE.json:11 "deterministic replay")."""

import numpy as np

import starframe_tpu as sf
from starframe_tpu.shapes import Shape


def test_contact_events_started_and_ended():
    b = sf.WorldBuilder()
    g = b.add_static(pos=(0.0, -0.5))
    b.add_collider(g, Shape.box(10.0, 0.5), restitution=0.9)
    ball = b.add_body(pos=(0.0, 1.2))
    b.add_collider(ball, Shape.circle(0.3), restitution=0.9)
    world, cap = b.build()
    step = sf.make_step(sf.SolverConfig(restitution_threshold=0.1),
                        cap.max_pairs, with_contacts=True, donate=False)
    ev = sf.ContactEvents()
    history = []
    for _ in range(90):
        world, contacts, diag = step(world)
        ev.update(contacts)
        if ev.started:
            history.append("start")
        if ev.ended:
            history.append("end")
    # restitution 0.9 from 1.2: bounces -> at least one start AND one end
    assert "start" in history and "end" in history
    pair = (0, 1)
    assert all(s == {pair} or s == set() for s in [ev.started, ev.ended])


def test_touching_keys_unique():
    """Regression (ADVICE r1, medium): with x64 disabled, an int64 shift-pack
    truncates to the low word and keys (1,5) and (3,5) collide. Keys must be
    unique per canonical pair."""
    import itertools

    import jax.numpy as jnp

    from starframe_tpu.contacts import Contacts
    from starframe_tpu.events import touching_keys

    import dataclasses

    n = 13
    pairs = list(itertools.combinations(range(n), 2))
    p = len(pairs)
    ca = jnp.array([q[0] for q in pairs], jnp.int32)
    cb = jnp.array([q[1] for q in pairs], jnp.int32)
    zp = jnp.zeros((p,), jnp.float32)
    zp2 = jnp.zeros((p, 2), jnp.float32)
    z22 = jnp.zeros((p, 2, 2), jnp.float32)
    mask = jnp.ones((p, 2), bool)
    c = Contacts(
        body_a=ca, body_b=cb, collider_a=ca, collider_b=cb,
        normal_a=zp2, anchor_a=z22, anchor_b=z22,
        point_mask=mask, solve_mask=mask, friction=zp, restitution=zp,
        touching=jnp.ones((p,), bool), separation=zp2,
    )
    keys, touching = touching_keys(c, n_colliders=n)
    keys = np.asarray(keys)
    assert len(np.unique(keys)) == p
    # swapped order produces the same canonical key
    c_swapped = dataclasses.replace(c, collider_a=cb, collider_b=ca)
    keys2, _ = touching_keys(c_swapped, n_colliders=n)
    np.testing.assert_array_equal(keys, np.asarray(keys2))


def test_batched_rollout_and_determinism():
    scene = sf.scenes.batched_worlds(n_worlds=8, n_bodies=16, substeps=4)
    roll = sf.parallel.make_batched_rollout(scene.config, scene.capacity.max_pairs, 20)
    final1, traj1, diag1 = roll(scene.world)
    final2, traj2, _ = roll(scene.world)
    assert int(np.asarray(diag1["slot_overflow"])) == 0
    # bit-exact determinism across runs (BASELINE.json:11)
    np.testing.assert_array_equal(np.asarray(final1.bodies.pos), np.asarray(final2.bodies.pos))
    np.testing.assert_array_equal(np.asarray(traj1[0]), np.asarray(traj2[0]))
    assert traj1[0].shape == (20, 8, 16, 2)
    assert np.isfinite(np.asarray(final1.bodies.pos)).all()


def test_pallas_path_determinism_on_tpu():
    """On TPU the batched path runs the Pallas kernel; replays must be
    bit-exact. (On CPU this exercises the XLA path instead — still useful.)"""
    scene = sf.scenes.batched_worlds(n_worlds=4, n_bodies=32, substeps=6, seed=3)
    step = sf.make_batched_step(scene.config, scene.capacity.max_pairs, donate=False)

    def run():
        w = scene.world
        for _ in range(30):
            w = step(w)
        return np.asarray(w.bodies.pos), np.asarray(w.bodies.angle)

    p1, a1 = run()
    p2, a2 = run()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(a1, a2)


def test_kernel_event_masks_match_xla_diffs():
    """VERDICT r2 item 8: started/ended events computed entirely on the
    kernel path (touch tables + key diff) match the XLA path's
    with_contacts diff, frame by frame."""
    import jax
    import jax.numpy as jnp

    from starframe_tpu.config import SolverConfig
    from starframe_tpu.events import (diff_contacts, key_event_masks,
                                      keys_to_set, touching_keys)
    from starframe_tpu.parallel import batched_step_events, replicate_world
    from starframe_tpu.step import step

    from test_frame2 import _scene

    world, cap = _scene(n=128, seed=21)
    cfg = SolverConfig(substeps=4, slot_capacity=8, manifold_refresh="frame")
    worlds = replicate_world(world, 2)
    M = world.colliders.m

    w_k = worlds
    w_x = world
    step_x = jax.jit(
        lambda w: step(w, cfg, cap.max_pairs, allow_tiled=False)[:2])
    prev_keys = None
    prev_contacts = None
    for frame in range(3):
        w_k, keys, diag = batched_step_events(w_k, cfg, interpret=True)
        assert int(np.asarray(diag["slot_overflow"])) == 0
        w_x, contacts = step_x(w_x)

        kset = keys_to_set(np.asarray(keys[0]), M)
        ck, touching = touching_keys(contacts, M)
        xset = keys_to_set(np.asarray(jnp.where(touching, ck, -1)), M)
        assert kset == xset, f"frame {frame}: touching sets differ"

        if prev_keys is not None:
            started, ended = key_event_masks(prev_keys[0], keys[0])
            k_started = keys_to_set(
                np.asarray(jnp.where(started, keys[0], -1)), M)
            k_ended = keys_to_set(
                np.asarray(jnp.where(ended, prev_keys[0], -1)), M)
            x_started, _, x_ended = diff_contacts(prev_contacts, contacts)
            assert k_started == x_started, f"frame {frame}: started differ"
            assert k_ended == x_ended, f"frame {frame}: ended differ"
        prev_keys = keys
        prev_contacts = jax.tree.map(lambda x: np.asarray(x), contacts)


def test_batched_rollout_with_keys_matches_per_step_events():
    """batched_rollout(with_keys=True) stacks the same canonical touch keys
    per frame (as SETS — slot ordering may differ across table builds) that
    batched_step_events produces step by step, on both the K=1 inline path
    and the K>1 guarded path."""
    import jax

    from starframe_tpu.config import SolverConfig
    from starframe_tpu.events import keys_to_set
    from starframe_tpu.parallel import (batched_rollout, batched_step_events,
                                        replicate_world)

    from test_frame2 import _scene

    world, cap = _scene(n=128, seed=11)
    worlds = replicate_world(world, 2)
    M = world.colliders.m
    n_frames = 4
    for K in (1, 3):
        cfg = SolverConfig(substeps=4, slot_capacity=8,
                           manifold_refresh="frame", frames_per_broadphase=K)
        final, traj, diag = jax.jit(
            lambda w: batched_rollout(w, cfg, cap.max_pairs, n_frames,
                                      interpret=True, with_keys=True))(worlds)
        (_, keys) = traj
        assert keys.shape[0] == n_frames
        w_s = worlds
        for f in range(n_frames):
            w_s, keys_s, dg = batched_step_events(w_s, cfg, interpret=True)
            assert int(np.asarray(dg["slot_overflow"])) == 0
            for wi in range(2):
                roll_set = keys_to_set(np.asarray(keys[f][wi]), M)
                step_set = keys_to_set(np.asarray(keys_s[wi]), M)
                assert roll_set == step_set, (K, f, wi)
