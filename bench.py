#!/usr/bin/env python
"""Benchmark CLI: prints ONE JSON line with the headline metric.

Headline = body-steps/sec on the batched-worlds config (BASELINE.json:11,
the north-star workload: 4096 independent 256-body worlds on one chip).
``vs_baseline`` is measured against this chip's proportional share of the
driver's 1e8 body-steps/sec v5e-8 target (i.e. 1.25e7 per chip), since no
published reference numbers exist (SURVEY.md §6).

Other configs: --config {batched,pile,box_stack,rope_bridge,mechanism}.
Secondary metrics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np


NORTH_STAR_V5E8 = 1e8  # body-steps/sec over 8 chips (BASELINE.json:5)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_scene(scene, frames: int, batched: bool):
    import starframe_tpu as sf

    if batched:
        step = sf.make_batched_step(scene.config, scene.capacity.max_pairs, donate=True)
    else:
        step = sf.make_step(scene.config, scene.capacity.max_pairs, donate=True)
    # count active bodies from the raw flags leaf on host (no eager device op)
    flags = np.asarray(jax.device_get(scene.world.bodies.flags))
    n_body_per_frame = int(((flags & 1) != 0).sum())

    w = scene.world
    log(f"[bench] scene={scene.name} bodies/frame={n_body_per_frame} "
        f"max_pairs={scene.capacity.max_pairs} substeps={scene.config.substeps}")

    t0 = time.perf_counter()
    w = step(w)
    jax.block_until_ready(w.bodies.pos)
    log(f"[bench] compile+first step: {time.perf_counter() - t0:.1f}s")

    # timed run with per-frame latencies
    lat = []
    t_start = time.perf_counter()
    for _ in range(frames):
        t1 = time.perf_counter()
        w = step(w)
        jax.block_until_ready(w.bodies.pos)
        lat.append(time.perf_counter() - t1)
    elapsed = time.perf_counter() - t_start

    lat = np.array(lat)
    body_steps_per_sec = n_body_per_frame * frames / elapsed
    log(f"[bench] {frames} frames in {elapsed:.3f}s | "
        f"p50 {np.percentile(lat, 50)*1e3:.2f}ms p99 {np.percentile(lat, 99)*1e3:.2f}ms | "
        f"{body_steps_per_sec:.3e} body-steps/s")
    return body_steps_per_sec, lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="batched",
                    choices=["batched", "pile", "box_stack", "rope_bridge", "mechanism"])
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--bodies", type=int, default=256)
    ap.add_argument("--pile-bodies", type=int, default=10_000)
    args = ap.parse_args()

    import starframe_tpu as sf

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
        f"x{jax.device_count()}")

    if args.config == "batched":
        scene = sf.scenes.batched_worlds(n_worlds=args.worlds, n_bodies=args.bodies)
        bps, lat = bench_scene(scene, args.frames, batched=True)
        per_chip_target = NORTH_STAR_V5E8 / 8.0
        out = {
            "metric": f"body-steps/sec ({args.worlds}x{args.bodies}-body worlds, 1 chip)",
            "value": round(bps, 1),
            "unit": "body-steps/s",
            "vs_baseline": round(bps / per_chip_target, 4),
        }
    elif args.config == "pile":
        scene = sf.scenes.pile(n_bodies=args.pile_bodies)
        bps, lat = bench_scene(scene, args.frames, batched=False)
        out = {
            "metric": f"body-steps/sec ({args.pile_bodies}-body pile)",
            "value": round(bps, 1),
            "unit": "body-steps/s",
            "vs_baseline": round(bps / (NORTH_STAR_V5E8 / 8.0), 4),
        }
    else:
        scene = getattr(sf.scenes, args.config)()
        bps, lat = bench_scene(scene, args.frames, batched=False)
        out = {
            "metric": f"p50 step latency ({scene.name}, 60Hz scene)",
            "value": round(float(np.percentile(lat, 50) * 1e3), 4),
            "unit": "ms",
            "vs_baseline": round(16.666 / max(float(np.percentile(lat, 50) * 1e3), 1e-9), 4),
        }

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
