"""Awake-prefix compaction (config.tile_awake_compaction — the
finer-than-tile island work saving, SURVEY.md §2 row 11): tiled rollouts
re-sort by (awake-neighborhood, x) so sleepers no awake body can reach
cluster into trailing tiles whose whole windows sleep and skip all kernel
work. These tests pin the soundness contract:

- trajectories match the un-compacted rollout (same sleep semantics; the
  skipped work is provably zero — frozen-frozen contacts),
- the keep set preserves awake-sleeper contacts and wake signals across the
  partition boundary (an impactor plowing into the sleeping mass behaves
  like the un-compacted engine),
- untouched tail sleepers stay bit-frozen, and the window-completeness
  counter stays silent (the live partition keeps its sort invariant).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starframe_tpu.tiled import tiled_rollout
from test_sleep_tiers import _cfg, _presleep, _sleep_scene


def _run(world, cfg, n_frames):
    final, diag = jax.jit(
        lambda w: tiled_rollout(w, cfg, n_frames, interpret=True))(world)
    return final, diag


def test_compaction_matches_uncompacted():
    """Same scene, compaction on vs off: trajectories agree to f32
    summation-order tolerance, and the compacted run actually partitioned
    (compacted_rows > 0) with a silent window counter."""
    world, cap, sleepers = _sleep_scene()
    cfg = _cfg(frames_per_broadphase=2)
    world = _presleep(world, sleepers, cfg.sleep_frames)

    f_on, d_on = _run(world, cfg, 6)
    f_off, d_off = _run(
        world, dataclasses.replace(cfg, tile_awake_compaction=False), 6)

    assert int(np.asarray(d_on["compacted_rows"])) > 0
    assert int(np.asarray(d_off["compacted_rows"])) == 0
    for d in (d_on, d_off):
        assert int(np.asarray(d["slot_overflow"])) == 0
        assert int(np.asarray(d["window_overflow"])) == 0
    np.testing.assert_allclose(np.asarray(f_on.bodies.pos),
                               np.asarray(f_off.bodies.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_on.bodies.vel),
                               np.asarray(f_off.bodies.vel), atol=1e-3)
    # tail sleepers (never in any awake body's reach) are bit-frozen
    far = sleepers[3 * len(sleepers) // 4:]
    np.testing.assert_array_equal(
        np.asarray(f_on.bodies.pos)[far], np.asarray(world.bodies.pos)[far])


def test_impactor_wakes_across_partition_boundary():
    """A fast body aimed at the sleeping (tail-partitioned) mass: the keep
    set + positional guard must deliver the contact and the wake signal just
    like the un-compacted engine — the struck sleeper wakes and moves, and
    both runs agree."""
    world, cap, sleepers = _sleep_scene()
    cfg = _cfg(frames_per_broadphase=4)
    world = _presleep(world, sleepers, cfg.sleep_frames)
    # drop an awake body fast onto a sleeper DEEP in the sleeping side (far
    # from every other awake body, so at the first partition its target
    # region sits in the tail unless the keep set pulls it back in)
    b = world.bodies
    awake_idx = sleepers[-1] + 1
    target = sleepers[7 * len(sleepers) // 8]
    tpos = np.asarray(b.pos)[target]
    pos = b.pos.at[awake_idx].set(jnp.asarray([float(tpos[0]), 2.2]))
    vel = b.vel.at[awake_idx].set(jnp.asarray([0.0, -9.0]))
    world = dataclasses.replace(
        world, bodies=dataclasses.replace(b, pos=pos, vel=vel))

    f_on, d_on = _run(world, cfg, 8)
    f_off, d_off = _run(
        world, dataclasses.replace(cfg, tile_awake_compaction=False), 8)

    assert int(np.asarray(d_on["slot_overflow"])) == 0
    assert int(np.asarray(d_on["window_overflow"])) == 0
    # the struck sleeper woke under compaction, exactly as without it
    sc_on = int(np.asarray(f_on.bodies.sleep_count)[target])
    sc_off = int(np.asarray(f_off.bodies.sleep_count)[target])
    assert sc_on < cfg.sleep_frames
    assert sc_on == sc_off
    np.testing.assert_allclose(np.asarray(f_on.bodies.pos),
                               np.asarray(f_off.bodies.pos), atol=1e-3)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu"
    and "TPU" not in getattr(jax.devices()[0], "device_kind", ""),
    reason="compiled Mosaic path needs a TPU",
)
def test_compaction_compiled_on_tpu_with_buckets():
    """Compiled path: compaction (including the precompiled grid-size
    buckets — interpret mode skips them) vs the un-compacted engine on a
    part-sleeping scene. Hard counters silent, trajectories agree, tail
    bit-frozen."""
    world, cap, sleepers = _sleep_scene()
    cfg = _cfg(frames_per_broadphase=2)
    world = _presleep(world, sleepers, cfg.sleep_frames)

    f_on, d_on = jax.jit(lambda w: tiled_rollout(w, cfg, 6))(world)
    f_off, d_off = jax.jit(lambda w: tiled_rollout(
        w, dataclasses.replace(cfg, tile_awake_compaction=False), 6))(world)

    assert int(np.asarray(d_on["compacted_rows"])) > 0
    assert int(np.asarray(d_on["slot_overflow"])) == 0
    assert int(np.asarray(d_on["window_overflow"])) == 0
    np.testing.assert_allclose(np.asarray(f_on.bodies.pos),
                               np.asarray(f_off.bodies.pos), atol=1e-4)
    far = sleepers[3 * len(sleepers) // 4:]
    np.testing.assert_array_equal(
        np.asarray(f_on.bodies.pos)[far], np.asarray(world.bodies.pos)[far])
