#!/usr/bin/env python
"""Benchmark CLI: prints ONE JSON line with the headline metric.

Headline = body-steps/sec on the batched-worlds config (BASELINE.json:11,
the north-star workload). ``vs_baseline`` is measured against this chip's
proportional share of the driver's 1e8 body-steps/sec v5e-8 target (i.e.
1.25e7 per chip), since no published reference numbers exist (SURVEY.md §6).

Methodology note: on this TPU-relay environment ``block_until_ready`` does
NOT guarantee execution completed (measured: a no-op), so every timing here
runs N frames as ONE on-device ``lax.scan`` chunk and forces completion by
materializing a checksum — wall time per chunk / N is the true per-frame
cost. This is also the deployment-realistic shape (SURVEY.md §3.5: one
host↔device round trip per rollout).

Other configs: --config {batched,pile,box_stack,rope_bridge,mechanism}.
Secondary metrics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_V5E8 = 1e8  # body-steps/sec over 8 chips (BASELINE.json:5)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _chunk_runner(scene, n_frames: int, batched: bool):
    import starframe_tpu as sf
    from starframe_tpu.step import step as step_fn

    cfg, cap = scene.config, scene.capacity

    def chunk(w):
        def body(w, _):
            if batched:
                return sf.parallel.batched_step(w, cfg, cap.max_pairs), ()
            return step_fn(w, cfg, cap.max_pairs)[0], ()

        w, _ = jax.lax.scan(body, w, None, length=n_frames)
        return w, jnp.sum(w.bodies.pos)

    return jax.jit(chunk)


def bench_scene(scene, frames: int, batched: bool, reps: int = 3):
    flags = np.asarray(jax.device_get(scene.world.bodies.flags))
    n_body_per_frame = int(((flags & 1) != 0).sum())
    log(f"[bench] scene={scene.name} bodies/frame={n_body_per_frame} "
        f"max_pairs={scene.capacity.max_pairs} substeps={scene.config.substeps}")

    run = _chunk_runner(scene, frames, batched)
    t0 = time.perf_counter()
    w, cs = run(scene.world)
    cs_v = float(np.asarray(cs))
    log(f"[bench] compile+first {frames}-frame chunk: "
        f"{time.perf_counter() - t0:.1f}s (checksum {cs_v:.3f})")

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        w, cs = run(w)
        float(np.asarray(cs))  # force completion
        times.append(time.perf_counter() - t0)
    per_frame = min(times) / frames
    bps = n_body_per_frame / per_frame
    log(f"[bench] best of {reps}: {per_frame * 1e3:.3f} ms/frame | "
        f"{bps:.3e} body-steps/s")
    return bps, per_frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="batched",
                    choices=["batched", "pile", "box_stack", "rope_bridge", "mechanism"])
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--bodies", type=int, default=256)
    ap.add_argument("--pile-bodies", type=int, default=10_000)
    args = ap.parse_args()

    import starframe_tpu as sf

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
        f"x{jax.device_count()}")

    per_chip_target = NORTH_STAR_V5E8 / 8.0
    if args.config == "batched":
        scene = sf.scenes.batched_worlds(n_worlds=args.worlds, n_bodies=args.bodies)
        # big workloads: short scan chunks — the TPU relay kills single
        # executions much past ~1-2 minutes
        n_chunk = 5 if args.worlds * args.bodies >= 2 ** 18 else args.frames
        bps, per_frame = bench_scene(scene, n_chunk, batched=True)
        out = {
            "metric": f"body-steps/sec ({args.worlds}x{args.bodies}-body worlds, 1 chip)",
            "value": round(bps, 1),
            "unit": "body-steps/s",
            "vs_baseline": round(bps / per_chip_target, 4),
        }
    elif args.config == "pile":
        scene = sf.scenes.pile(n_bodies=args.pile_bodies)
        bps, per_frame = bench_scene(scene, 5, batched=False)
        out = {
            "metric": f"body-steps/sec ({args.pile_bodies}-body pile)",
            "value": round(bps, 1),
            "unit": "body-steps/s",
            "vs_baseline": round(bps / per_chip_target, 4),
        }
    else:
        scene = getattr(sf.scenes, args.config)()
        bps, per_frame = bench_scene(scene, args.frames, batched=False)
        ms = per_frame * 1e3
        out = {
            "metric": f"avg step latency ({scene.name}, 60Hz scene)",
            "value": round(ms, 4),
            "unit": "ms",
            "vs_baseline": round(16.666 / max(ms, 1e-9), 4),
        }

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
