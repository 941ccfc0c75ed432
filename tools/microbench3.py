#!/usr/bin/env python
"""Probe 3: amortized in-kernel primitive costs (the ~500us/scan-iteration
relay floor from probe 2 drowns single-op timings; here every scan iteration
runs an in-kernel fori_loop of REP repetitions, so marginal cost per
primitive = slope).

Primitives, all in the worlds-on-sublanes layout (world = sublane row,
entity/pair = lanes):
- pose gather: out [Wb,1024] <- src [Wb,256] (2-chunk decomposed lane gather)
- slot gather: out [Wb,256] <- src [Wb,1024] (8-chunk decomposition)
- elementwise op on [Wb,1024]
- MXU dots [6,256]x[256,2048] (round-1 shape) and [128,256]x[256,1024]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def lane_gather(src, idx):
    """out[r, q] = src[r, idx[r, q]]; 128-lane vreg gather decomposition."""
    S, Q = src.shape[-1], idx.shape[-1]
    cols = []
    for k in range(Q // 128):
        ik = idx[:, 128 * k:128 * (k + 1)]
        acc = None
        for c in range(S // 128):
            ic = ik - c * 128
            inr = (ic >= 0) & (ic < 128)
            chunk = src[:, 128 * c:128 * (c + 1)]
            g = jnp.take_along_axis(chunk, jnp.where(inr, ic, 0), axis=-1)
            acc = g if acc is None else jnp.where(inr, g, acc)
        cols.append(acc)
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)


def timeit(name, fn, x0, T=20, reps=3):
    try:
        def chunk(c):
            def body(c, _):
                return fn(c), ()
            c, _ = jax.lax.scan(body, c, None, length=T)
            return c, jnp.sum(jax.tree.leaves(c)[0])

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
        log(f"[micro3] {name:46s} {min(times) / T * 1e6:10.1f} us/iter (compile {comp:.1f}s)")
        return min(times) / T
    except Exception as e:  # noqa: BLE001
        log(f"[micro3] {name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def make_loop_kernel(body_fn, rep):
    def kernel(x_ref, ip_ref, is_ref, o_ref):
        ip = ip_ref[:]
        isl = is_ref[:]

        def body(_, s):
            return body_fn(s, ip, isl)

        o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])

    return kernel


def run_block(name, body_fn, rep, Wb, W, T=20):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    ip = jax.random.randint(k1, (W, 1024), 0, 256, jnp.int32)
    isl = jax.random.randint(k2, (W, 256), 0, 1024, jnp.int32)
    x = jnp.full((W, 1024), 0.5, jnp.float32)
    kernel = make_loop_kernel(body_fn, rep)

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(W // Wb,),
            in_specs=[
                pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wb, 256), lambda w: (w, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 1024), jnp.float32),
        )(x, ip, isl)

    return timeit(f"{name}_Wb{Wb}_W{W}_rep{rep}", call, x, T=T)


def main():
    dev = jax.devices()[0]
    log(f"[micro3] device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    W, Wb = 1024, 64

    # baseline: loop of nothing-ish
    def b_noop(s, ip, isl):
        return s * 1.0000001

    # pose gather x6: 6 gathers [Wb,1024]<-[Wb,256]
    def b_pose6(s, ip, isl):
        acc = s
        for _ in range(6):
            g = lane_gather(s[:, :256], ip)
            acc = acc + g * 1e-6
        return acc

    # slot gather x4: 4 gathers [Wb,256]<-[Wb,1024]
    def b_slot4(s, ip, isl):
        back = lane_gather(s, isl)
        for _ in range(3):
            back = back + lane_gather(s, isl)
        return jnp.concatenate([s[:, :256] + back * 1e-6, s[:, 256:]], axis=-1)

    # elementwise x50 on [Wb,1024]
    def b_ew50(s, ip, isl):
        for _ in range(25):
            s = s * 1.0000001 + 1e-9
        return s

    for name, fn, rep in (
        ("noop", b_noop, 10),
        ("pose_gather6", b_pose6, 10),
        ("slot_gather4", b_slot4, 10),
        ("ew50", b_ew50, 10),
    ):
        run_block(name, fn, rep, Wb, W)

    # dot shapes, in-kernel loop, one program
    def dot_loop(shape_a, shape_b, rep, name):
        def kernel(a_ref, b_ref, o_ref):
            b = b_ref[:]

            def body(_, a):
                o = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                return a + o[:, : shape_a[1]] * 1e-9

            o_ref[:] = jax.lax.fori_loop(0, rep, body, a_ref[:])

        a = jnp.full(shape_a, 0.5, jnp.float32)
        bm = jnp.full(shape_b, 0.5, jnp.float32)

        def call(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape_a, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, bm)

        timeit(f"{name}_rep{rep}", call, a)

    dot_loop((8, 256), (256, 2048), 100, "dot_8x256x2048")
    dot_loop((128, 256), (256, 1024), 100, "dot_128x256x1024")

    # full-scale composite: the projected v2 frame shape
    # per substep: 12 pose gathers + ~120 ew + 6 slot gathers; 10 substeps
    def b_frame(s, ip, isl):
        acc = s
        for _ in range(12):
            g = lane_gather(s[:, :256], ip)
            acc = acc + g * 1e-6
        for _ in range(60):
            acc = acc * 1.0000001 + 1e-9
        back = lane_gather(acc, isl)
        for _ in range(5):
            back = back + lane_gather(acc, isl)
        return jnp.concatenate([acc[:, :256] + back * 1e-6, acc[:, 256:]], axis=-1)

    for wb in (8, 32, 64, 128):
        run_block("framesub", b_frame, 10, wb, 4096, T=5)


if __name__ == "__main__":
    main()
