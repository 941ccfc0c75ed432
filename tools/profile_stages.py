#!/usr/bin/env python
"""Per-stage wall-time ablation for a bench scene (default: the 10k pile).

The driver's primary metric is body-steps/sec at the 10k pile
(BASELINE.json:2); round 1 ran it at 441 ms/frame. This tool times each
pipeline stage as its own on-device scan chunk (chunk + checksum timing per
the relay methodology in bench.py) so the frame cost can be attributed:

    python tools/profile_stages.py --config pile --bodies 10000

Stages:
  full        the complete step()
  prep        compute_aabbs + broadphase + build_pair_data
  broadphase  compute_aabbs + broadphase only
  pairdata    build_pair_data on a frozen pair buffer
  manifold    narrowphase_b once at fixed poses
  substeps    the substep loop on frozen PairData (solver only)
  gathers     the per-substep pair-pose gathers alone
  scatter     the scatter accumulation alone at pair scale
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, x0, frames, reps=3):
    def chunk(c):
        def body(c, _):
            return fn(c), ()

        c, _ = jax.lax.scan(body, c, None, length=frames)
        leaves = [l for l in jax.tree.leaves(c) if jnp.issubdtype(l.dtype, jnp.floating)]
        return c, sum(jnp.sum(l) for l in leaves)

    run = jax.jit(chunk)
    t0 = time.perf_counter()
    c, cs = run(x0)
    float(np.asarray(cs))
    comp = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, cs = run(c)
        float(np.asarray(cs))
        times.append(time.perf_counter() - t0)
    per = min(times) / frames
    log(f"[stage] {name:12s} {per * 1e3:9.3f} ms/frame  (compile {comp:.0f}s)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="pile")
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--settle", type=int, default=30,
                    help="frames to advance before measuring (pair density)")
    ap.add_argument("--stages", default="full,prep,broadphase,manifold,substeps,gathers,scatter")
    args = ap.parse_args()

    import starframe_tpu as sf
    from starframe_tpu.broadphase import broadphase, compute_aabbs
    from starframe_tpu.narrowphase import build_pair_data, world_verts
    from starframe_tpu.solver import BodyState, _use_matmul_accum, substep
    from starframe_tpu.step import frame_prep, speculative_margin, step

    if args.config == "pile":
        scene = sf.scenes.pile(n_bodies=args.bodies)
    else:
        scene = getattr(sf.scenes, args.config)()
    cfg, cap = scene.config, scene.capacity
    mp = cap.max_pairs
    log(f"[stage] scene={scene.name} bodies={scene.n_bodies} max_pairs={mp} "
        f"substeps={cfg.substeps} accum="
        f"{'matmul' if _use_matmul_accum(scene.world.bodies.n, cfg) else 'scatter'}")

    # settle so pair density is representative
    stepj = jax.jit(lambda w: step(w, cfg, mp)[0])
    w = scene.world
    for _ in range(args.settle):
        w = stepj(w)
    w = jax.block_until_ready(w)
    pairs, pd = jax.jit(lambda w: frame_prep(w, cfg, mp))(w)
    n_pairs = int(np.asarray(pairs.count))
    log(f"[stage] live pairs after settle: {n_pairs} / {mp} "
        f"(overflow {int(np.asarray(pairs.overflow))})")

    want = set(args.stages.split(","))
    h = cfg.dt / cfg.substeps

    if "full" in want:
        timeit("full", lambda w: step(w, cfg, mp)[0], w, args.frames)

    if "prep" in want:
        def prep_only(w):
            import dataclasses

            _, pd2 = frame_prep(w, cfg, mp)
            b = w.bodies
            drift = dataclasses.replace(
                b, pos=b.pos + 1e-6 * pd2.friction[: b.n, None])
            return dataclasses.replace(w, bodies=drift)

        timeit("prep", prep_only, w, args.frames)

    if "broadphase" in want:
        import dataclasses

        def bp_only(w):
            wverts = world_verts(w)
            lo, hi = compute_aabbs(w, wverts, cfg.contact_margin, cfg.dt)
            pb = broadphase(w, lo, hi,
                            dataclasses.replace(
                                sf.config.Capacity(
                                    max_bodies=w.bodies.n,
                                    max_colliders=w.colliders.m,
                                    max_pairs=mp,
                                    max_joints=w.joints.j,
                                    max_verts=w.colliders.max_verts),
                            ), cfg)
            b = w.bodies
            drift = dataclasses.replace(
                b, pos=b.pos + 1e-9 * pb.pair_a[: b.n, None].astype(jnp.float32))
            return dataclasses.replace(w, bodies=drift)

        timeit("broadphase", bp_only, w, args.frames)

    if "manifold" in want:
        from starframe_tpu.kernels import gather_pair_pose, narrowphase_b

        def mani(s):
            cb = narrowphase_b(pd, gather_pair_pose(pd, s.pos, s.angle),
                               cfg.contact_margin)
            return BodyState(s.pos + 1e-9 * cb.sep[0, : s.pos.shape[0], None],
                             s.angle, s.vel, s.ang_vel)

        s0 = BodyState(w.bodies.pos, w.bodies.angle, w.bodies.vel, w.bodies.ang_vel)
        timeit("manifold", mani, s0, args.frames)

    if "substeps" in want:
        from starframe_tpu.kernels import gather_pair_pose, narrowphase_b

        def subs(s):
            cb = None
            if cfg.manifold_refresh == "frame":
                cb = narrowphase_b(pd, gather_pair_pose(pd, s.pos, s.angle),
                                   speculative_margin(pd, w.bodies, cfg))

            def body(i, s):
                s2, _, _ = substep(s, w.bodies, pd, w.joints, w.gravity, h,
                                   cfg, cb=cb)
                return s2

            return jax.lax.fori_loop(0, cfg.substeps, body, s)

        s0 = BodyState(w.bodies.pos, w.bodies.angle, w.bodies.vel, w.bodies.ang_vel)
        timeit("substeps", subs, s0, args.frames)

    if "gathers" in want:
        from starframe_tpu.kernels import gather_pair_pose

        def gath(s):
            acc = s.pos
            for _ in range(cfg.substeps):
                pp = gather_pair_pose(pd, acc, s.angle)
                acc = acc + 1e-9 * jnp.stack(
                    [jnp.sum(pp.pax) + jnp.sum(pp.pbx),
                     jnp.sum(pp.pay) + jnp.sum(pp.pby)])[None, :]
            return BodyState(acc, s.angle, s.vel, s.ang_vel)

        s0 = BodyState(w.bodies.pos, w.bodies.angle, w.bodies.vel, w.bodies.ang_vel)
        timeit("gathers", gath, s0, args.frames)

    if "scatter" in want:
        n = w.bodies.n
        vals = jnp.ones((4, mp), jnp.float32)

        def scat(x):
            out = x
            for _ in range(cfg.substeps):
                acc = jnp.zeros((n, 4), jnp.float32)
                acc = acc.at[pd.body_a].add(vals.T * out[0, 0])
                acc = acc.at[pd.body_b].add(vals.T)
                out = out + 1e-9 * acc[:4, :4]
            return out

        timeit("scatter", scat, jnp.ones((4, 4), jnp.float32), args.frames)


if __name__ == "__main__":
    main()
