#!/usr/bin/env python
"""Pile-variant throughput sweep on the real TPU (r4 experiments).

Measures the tiled rollout exactly the way bench.py does (one scan chunk,
checksum-forced) across variants: baseline config, sleep enabled (the
reference's island sleeping is on by default — a settling pile's tail
frames should get cheaper as slabs fall asleep), and the jointed pile.

Usage: python tools/pile_sweep.py [--frames 240] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_variant(name, scene, frames, reps):
    from starframe_tpu.tiled import tiled_rollout

    cfg = scene.config

    @jax.jit
    def chunk(w):
        w, d = tiled_rollout(w, cfg, frames)
        ovf = (d["slot_overflow"] + d["window_overflow"]
               + d["large_overflow"])
        return w, jnp.sum(w.bodies.pos), jnp.stack(
            [ovf, d["margin_dropped"], d["spec_dropped"],
             d["forced_rebuilds"]])

    w = scene.world
    t0 = time.perf_counter()
    w, cs, ovf = chunk(w)
    float(np.asarray(cs))
    log(f"[{name}] compile+first chunk {time.perf_counter() - t0:.1f}s")
    times = []
    counters = np.asarray(ovf)
    for _ in range(reps):
        t0 = time.perf_counter()
        w, cs, ovf = chunk(w)
        float(np.asarray(cs))
        times.append(time.perf_counter() - t0)
        counters = np.maximum(counters, np.asarray(ovf))
    n = scene.world.bodies.n
    per = min(times) / frames
    allt = ", ".join(f"{t / frames * 1e3:.3f}" for t in times)
    log(f"[{name}] best {per * 1e3:.3f} ms/frame  {n / per:.3e} bps  "
        f"(reps: {allt})  hard={counters[0]} margin={counters[1]} "
        f"spec={counters[2]} rebuilds={counters[3]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="base,sleep,joints")
    args = ap.parse_args()

    import starframe_tpu as sf

    log(f"[sweep] device {jax.devices()[0].platform}")
    want = set(args.variants.split(","))
    if "base" in want:
        run_variant("base", sf.scenes.pile(), args.frames, args.reps)
    if "sleep" in want:
        s = sf.scenes.pile()
        s.config = dataclasses.replace(s.config, sleep_velocity=0.05,
                                       sleep_frames=30)
        run_variant("sleep", s, args.frames, args.reps)
    if "joints" in want:
        run_variant("joints", sf.scenes.pile_joints(), args.frames,
                    args.reps)


if __name__ == "__main__":
    main()
