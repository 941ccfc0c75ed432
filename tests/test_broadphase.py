"""Broadphase tests: pair completeness vs a brute-force O(n²) oracle on
random scenes (SURVEY.md §4.1), for both the dense and grid paths."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import starframe_tpu as sf
from starframe_tpu.broadphase import broadphase, compute_aabbs, dense_pairs, grid_pairs
from starframe_tpu.narrowphase import world_verts
from starframe_tpu.shapes import Shape


import functools

# one shared capacity so every parametrized case reuses the same compiled
# program (this image has 1 CPU core and ~20s/XLA-compile; compile frugality
# is a hard requirement for the suite)
N_BODIES = 60
CAP = sf.Capacity(max_bodies=N_BODIES + 2, max_colliders=N_BODIES + 2,
                  max_pairs=4096, max_verts=4)


def random_world(rng, n_bodies=N_BODIES, spread=12.0, with_large=False):
    b = sf.WorldBuilder()
    for i in range(n_bodies):
        pos = rng.uniform(-spread, spread, 2)
        body = b.add_body(pos=pos, angle=rng.uniform(0, 2 * np.pi))
        kind = rng.integers(0, 3)
        if kind == 0:
            b.add_collider(body, Shape.circle(rng.uniform(0.2, 0.8)))
        elif kind == 1:
            b.add_collider(body, Shape.box(rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8)))
        else:
            b.add_collider(body, Shape.capsule(rng.uniform(0.3, 1.0), rng.uniform(0.1, 0.4)))
    if with_large:
        g = b.add_static(pos=(0.0, -spread))
        b.add_collider(g, Shape.box(3 * spread, 0.5))
        w = b.add_static(pos=(-spread, 0.0))
        b.add_collider(w, Shape.box(0.5, 2 * spread))
    world, cap = b.build(CAP)
    return world, cap


@functools.lru_cache(maxsize=None)
def _jitted_path(cap, cfg, which):
    import jax

    def fn(world):
        wv = world_verts(world)
        lo, hi = compute_aabbs(world, wv, cfg.contact_margin, cfg.dt)
        pb = (dense_pairs(world, lo, hi, cap) if which == "dense"
              else grid_pairs(world, lo, hi, cap, cfg))
        return pb, lo, hi

    return jax.jit(fn)


def oracle_pairs(world, lo, hi):
    """Brute-force O(n²) reference pair set."""
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    c = world.colliders
    active = np.asarray(c.active)
    body = np.asarray(c.body_idx)
    inv_m = np.asarray(world.bodies.inv_mass)
    inv_i = np.asarray(world.bodies.inv_inertia)
    kin = (np.asarray(world.bodies.flags) & 2) != 0
    m = len(active)
    out = set()
    for i in range(m):
        for j in range(i + 1, m):
            if not (active[i] and active[j]):
                continue
            if body[i] == body[j]:
                continue
            dyn = lambda k: inv_m[body[k]] > 0 or inv_i[body[k]] > 0 or kin[body[k]]
            if not (dyn(i) or dyn(j)):
                continue
            if np.all(lo[i] <= hi[j]) and np.all(lo[j] <= hi[i]):
                out.add((i, j))
    return out


def found_pairs(pb):
    pa = np.asarray(pb.pair_a)
    pbb = np.asarray(pb.pair_b)
    valid = np.asarray(pb.valid)
    return {tuple(sorted((int(a), int(b)))) for a, b, v in zip(pa, pbb, valid) if v}


@pytest.mark.parametrize("seed", range(5))
def test_dense_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    world, cap = random_world(rng)
    cfg = sf.SolverConfig()
    pb, lo, hi = _jitted_path(cap, cfg, "dense")(world)
    got = found_pairs(pb)
    want = oracle_pairs(world, lo, hi)
    assert got == want


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("with_large", [False, True])
def test_grid_matches_oracle(seed, with_large):
    rng = np.random.default_rng(100 + seed)
    world, cap = random_world(rng, with_large=with_large)
    cfg = sf.SolverConfig(grid_cell_capacity=16)
    pb, lo, hi = _jitted_path(cap, cfg, "grid")(world)
    assert int(pb.cell_overflow) == 0
    assert int(pb.overflow) == 0
    got = found_pairs(pb)
    want = oracle_pairs(world, lo, hi)
    missing = want - got
    extra = got - want
    assert not missing, f"grid missed pairs: {sorted(missing)[:10]}"
    assert not extra, f"grid fabricated pairs: {sorted(extra)[:10]}"


def test_grid_mixed_sizes_no_missed_pairs():
    """Regression (ADVICE r1, high): mid-size colliders — extent between 1x
    and 3x the cell size — used to be classified 'small' yet sit 2 cells
    apart with overlapping AABBs, so the 9-neighborhood center scan missed
    the pair with zero overflow signal. Anything wider than one cell must
    take the dense large-set path."""
    b = sf.WorldBuilder()
    # many tiny colliders pin the mean extent (hence cell size) low
    rng = np.random.default_rng(7)
    for i in range(58):
        body = b.add_body(pos=rng.uniform(-12, 12, 2))
        b.add_collider(body, Shape.circle(0.08))
    # two mid-size boxes whose AABBs overlap but whose centers are ~2 cells
    # apart (the exact miss window of the old 3x-cell threshold)
    b1 = b.add_body(pos=(50.0, 0.0))
    b.add_collider(b1, Shape.box(0.4, 0.4))
    b2 = b.add_body(pos=(50.7, 0.0))
    b.add_collider(b2, Shape.box(0.4, 0.4))
    world, cap = b.build(CAP)
    cfg = sf.SolverConfig(grid_cell_capacity=16)
    pb, lo, hi = _jitted_path(cap, cfg, "grid")(world)
    assert int(pb.cell_overflow) == 0
    assert int(pb.overflow) == 0
    got = found_pairs(pb)
    want = oracle_pairs(world, lo, hi)
    assert (58, 59) in want, "test setup: the two boxes must overlap"
    assert want - got == set(), f"grid missed pairs: {sorted(want - got)[:10]}"
    assert got - want == set()


def test_grid_dense_cluster_overflow_detected():
    """A cluster denser than the fan-out must raise the overflow counter,
    never silently miss pairs without saying so."""
    b = sf.WorldBuilder()
    for i in range(30):
        body = b.add_body(pos=(0.01 * i, 0.0))
        b.add_collider(body, Shape.circle(0.3))
    for i in range(30):  # pad to shared capacity for compile reuse
        b.add_body(pos=(100.0 + 3 * i, 0.0), mass=1.0)
    world, cap = b.build(
        sf.Capacity(max_bodies=62, max_colliders=62, max_pairs=4096, max_verts=4)
    )
    cfg = sf.SolverConfig(grid_cell_capacity=4)
    pb, lo, hi = _jitted_path(cap, cfg, "grid")(world)
    got = found_pairs(pb)
    want = oracle_pairs(world, lo, hi)
    if got != want:
        assert int(pb.cell_overflow) > 0, "missed pairs without overflow signal"


def test_layer_masks_respected():
    b = sf.WorldBuilder()
    b1 = b.add_body(pos=(0, 0))
    b.add_collider(b1, Shape.circle(1.0), layer=1, mask=~(1 << 2))
    b2 = b.add_body(pos=(0.5, 0))
    b.add_collider(b2, Shape.circle(1.0), layer=2, mask=-1)
    b3 = b.add_body(pos=(-0.5, 0))
    b.add_collider(b3, Shape.circle(1.0), layer=3, mask=-1)
    world, cap = b.build()
    cfg = sf.SolverConfig()
    wv = world_verts(world)
    lo, hi = compute_aabbs(world, wv, cfg.contact_margin, cfg.dt)
    got = found_pairs(dense_pairs(world, lo, hi, cap))
    # collider 0 (layer1, excludes layer2) never pairs with collider 1
    assert (0, 1) not in got
    assert (0, 2) in got
    assert (1, 2) in got


def test_static_static_skipped():
    b = sf.WorldBuilder()
    s1 = b.add_static(pos=(0, 0))
    b.add_collider(s1, Shape.box(1, 1))
    s2 = b.add_static(pos=(0.5, 0))
    b.add_collider(s2, Shape.box(1, 1))
    world, cap = b.build()
    cfg = sf.SolverConfig()
    wv = world_verts(world)
    lo, hi = compute_aabbs(world, wv, cfg.contact_margin, cfg.dt)
    assert found_pairs(dense_pairs(world, lo, hi, cap)) == set()
