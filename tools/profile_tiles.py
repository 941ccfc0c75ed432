#!/usr/bin/env python
"""Stage attribution for the sorted-sweep tile engine (the 10k pile — the
driver's PRIMARY metric, BASELINE.json:2).

Times each component of the tile-resident frame as its own scan chunk with a
per-iteration-varying input (the two r3 measurement traps: loop-invariant
work is hoisted out of a scan, and constant-predicate conds fold — see
PROFILE.md round-3 addendum), checksum-materialized per the relay
methodology in bench.py.

    python tools/profile_tiles.py --bodies 10000

Variants:
  frame_sN   one tile-layout frame with reused tables, substeps=N
             (N in 0/2/5/10: the slope is the per-substep project+apply
             cost, the intercept the manifold kernel + glue)
  build      build_tile_tables alone (the amortized K-frame broadphase)
  edge       _edge_rows alone (window-completeness bounds, XLA)
  resort     _resort alone (argsort + permute of the tile layout)
  rollout    tiled_rollout end-to-end (what bench.py measures)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, frames, reps=3):
    """fn(i: f32 scalar) -> f32 scalar (checksum of the work)."""

    def chunk(c):
        def body(c, _):
            i, acc = c
            s = fn(i)
            return (i + 1.0, acc + s), ()

        c, _ = jax.lax.scan(body, c, None, length=frames)
        return c, c[1]

    run = jax.jit(chunk)
    c = (jnp.float32(0), jnp.float32(0))
    t0 = time.perf_counter()
    c, cs = run(c)
    float(np.asarray(cs))
    comp = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, cs = run(c)
        float(np.asarray(cs))
        times.append(time.perf_counter() - t0)
    per = min(times) / frames
    log(f"[tiles] {name:16s} {per * 1e3:9.3f} ms/iter  (compile {comp:.0f}s)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--settle", type=int, default=30)
    ap.add_argument("--variants",
                    default="frame_s10,frame_s5,frame_s2,frame_s0,build,"
                            "edge,resort,rollout")
    ap.add_argument("--fuse", type=int, default=1,
                    help="1: whole-frame megakernel (default); 0: the "
                         "per-substep kernel pair (the sharded path)")
    ap.add_argument("--solve-cap", type=int, default=0,
                    help="override cfg.tile_solve_capacity (0 = scene cfg)")
    args = ap.parse_args()

    import starframe_tpu as sf
    from starframe_tpu import tiled
    from starframe_tpu.pallas.tiles import build_tile_tables
    from starframe_tpu.tiled import _edge_rows, _enter_tiles, _resort, _run_frame

    scene = sf.scenes.pile(n_bodies=args.bodies)
    cfg = scene.config
    if args.solve_cap:
        cfg = dataclasses.replace(cfg, tile_solve_capacity=args.solve_cap)
    log(f"[tiles] pile bodies={args.bodies} substeps={cfg.substeps} "
        f"C={cfg.slot_capacity} K={cfg.frames_per_broadphase}")

    # settle to a representative mid-pile state (cost is shape-static, but
    # keep the data honest)
    world, _ = jax.jit(
        lambda w: tiled.tiled_rollout(w, cfg, args.settle))(scene.world)
    state, consts, large, body_id, _ = jax.jit(
        lambda w: _enter_tiles(w, cfg))(world)
    state = jax.tree.map(np.asarray, state)  # materialize
    state = jax.tree.map(jnp.asarray, state)

    g = np.asarray(world.gravity)
    K = max(cfg.frames_per_broadphase, 1)
    Cs = -(-cfg.slot_capacity // 8) * 8
    V = consts["vlx"].shape[1]

    def perturb(i):
        # vary the input every iteration (anti-hoisting) without changing
        # the workload shape
        return dict(state, px=state["px"] + i * 1e-7)

    def build(st):
        edge_lo, edge_hi, _ = _edge_rows(st, consts, cfg)
        kc = dict(consts, edge_lo=edge_lo, edge_hi=edge_hi)
        return build_tile_tables(
            {k: st[k] for k in ("px", "py", "an", "vx", "vy", "om")},
            kc, large, jnp.asarray(g, jnp.float32)[None],
            C=Cs, V=V, margin=cfg.contact_margin, dt=cfg.dt,
            sort_axis=0, sweep_frames=K,
            sweep_slack=cfg.broadphase_speed_slack,
            sweep_floor=cfg.tile_sweep_floor, sweep_cap=cfg.tile_sweep_cap)

    tbl = jax.jit(lambda st: build(st)[:2])(state)
    tbl = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, tbl))

    want = set(args.variants.split(","))

    from starframe_tpu.pallas.tiles import run_tiled_frame

    Nt = state["px"].shape[0]
    T_ = state["px"].shape[2]
    live_ones = jnp.ones((Nt, 1, T_), jnp.float32)

    def run_s(i, s):
        """One frame through the raw kernel composition (no sleep glue —
        the pile config has sleeping off, so this is the whole frame minus
        _edge_rows + diag packaging)."""
        st = perturb(i)
        edge_lo, edge_hi, _ = _edge_rows(st, consts, cfg)
        kc = dict(consts, edge_lo=edge_lo, edge_hi=edge_hi,
                  tile_live=live_ones)
        from starframe_tpu.tiled import _solve_cap

        ns, touched, *_rest = run_tiled_frame(
            {k: st[k] for k in ("px", "py", "an", "vx", "vy", "om")},
            kc, large, jnp.asarray(g, jnp.float32)[None], tbl,
            C=Cs, Cs=_solve_cap(cfg), V=V, substeps=s,
            h=cfg.dt / max(s, 1), dt=cfg.dt, margin=cfg.contact_margin,
            compliance=cfg.contact_compliance, relaxation=cfg.relaxation,
            max_dpos=cfg.max_dpos_eff,
            rest_threshold=cfg.restitution_threshold,
            lin_damp=cfg.linear_damping, ang_damp=cfg.angular_damping,
            sleep_velocity=cfg.sleep_velocity, sort_axis=0,
            fuse=bool(args.fuse))
        return jnp.sum(ns["px"][0]) + jnp.sum(touched[0])

    for s in (10, 5, 2, 0):
        if f"frame_s{s}" not in want:
            continue
        timeit(f"frame_s{s}", lambda i, s=s: run_s(i, s), args.frames)

    if "floor" in want:
        # the relay's fixed per-scan-iteration cost: trivial body
        timeit("floor", lambda i: i * 1.0001 + jnp.sum(state["px"][0]) * 0.0,
               args.frames)

    if "perturb" in want:
        # perturb + a reduction over the perturbed state (the probe harness
        # itself): anything above `floor` here is harness cost shared by all
        # frame_s variants
        timeit("perturb", lambda i: jnp.sum(perturb(i)["px"][0]), args.frames)

    if "build" in want:
        def bl(i):
            out = build(perturb(i))
            return jnp.sum(out[0][0].astype(jnp.float32)) * 1e-6

        timeit("build", bl, args.frames)

    if "edge" in want:
        def ed(i):
            lo, hi, stale = _edge_rows(perturb(i), consts, cfg)
            return jnp.sum(lo[0]) * 1e-6 + stale.astype(jnp.float32)

        timeit("edge", ed, args.frames)

    if "resort" in want:
        def rs(i):
            st2, c2, bid = _resort(perturb(i), consts, body_id)
            return jnp.sum(st2["px"][0]) + jnp.float32(bid[0])

        timeit("resort", rs, args.frames)

    if "rollout" in want:
        def chunk(w):
            w2, diag = tiled.tiled_rollout(w, cfg, args.frames)
            return w2, jnp.sum(w2.bodies.pos)

        run = jax.jit(chunk)
        t0 = time.perf_counter()
        w2, cs = run(world)
        float(np.asarray(cs))
        comp = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            w2, cs = run(w2)
            float(np.asarray(cs))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.frames
        log(f"[tiles] {'rollout':16s} {per * 1e3:9.3f} ms/frame  "
            f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
