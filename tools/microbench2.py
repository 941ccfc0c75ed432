#!/usr/bin/env python
"""Probe 2: Pallas lane-gather semantics + cost scaling, call overhead.

Finding from probe 1: Mosaic lowers ``take_along_axis(x, i, axis=-1)`` only
when x and i have identical shapes and the lane width is 128 (one vreg) —
wider sources crash or fail lowering. So wide gathers must be decomposed
manually: per 128-lane output column, gather each 128-lane source chunk and
select by index range. This probe measures that decomposition's real cost
plus the substep-loop composite shape.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, x0, T=50, reps=3):
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
        log(f"[micro2] {name:44s} {min(times) / T * 1e6:10.1f} us/op (compile {comp:.1f}s)")
    except Exception as e:  # noqa: BLE001
        log(f"[micro2] {name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")


def pcall(kernel, out_sd, n_in):
    return pl.pallas_call(
        kernel,
        out_shape=out_sd,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def lane_gather(src, idx):
    """out[r, q] = src[r, idx[r, q]] built from 128-lane vreg gathers.

    src [R, S], idx [R, Q] int32 in [0, S); S and Q multiples of 128.
    Cost: (Q/128) * (S/128) gathers + selects.
    """
    S, Q = src.shape[-1], idx.shape[-1]
    cols = []
    for k in range(Q // 128):
        ik = jax.lax.slice_in_dim(idx, 128 * k, 128 * (k + 1), axis=-1)
        acc = None
        for c in range(S // 128):
            ic = ik - c * 128
            chunk = jax.lax.slice_in_dim(src, 128 * c, 128 * (c + 1), axis=-1)
            g = jnp.take_along_axis(chunk, jnp.clip(ic, 0, 127), axis=-1)
            if acc is None:
                acc = g
            else:
                acc = jnp.where(ic >= 0, g, acc)
        cols.append(acc)
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dev = jax.devices()[0]
    log(f"[micro2] device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # 1. near-empty kernel: call overhead
    def empty_k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    x = jnp.ones((8, 128), jnp.float32)
    timeit("empty_kernel",
           lambda x: pcall(empty_k, jax.ShapeDtypeStruct((8, 128), jnp.float32), 1)(x), x)

    # 2. same-shape single-vreg-wide gather at scale
    for R in (512, 4096):
        idx = jax.random.randint(ks[0], (R, 128), 0, 128, jnp.int32)

        def g_k(x_ref, i_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.take_along_axis(x_ref[:], i_ref[:], axis=1) * 1e-6

        xr = jnp.ones((R, 128), jnp.float32)
        timeit(f"gather_{R}x128_from128",
               lambda x, idx=idx, R=R: pcall(
                   g_k, jax.ShapeDtypeStruct((R, 128), jnp.float32), 2)(x, idx), xr)

    # 3. manual wide gathers: out [R, Q] <- src [R, S] (src = x[:, :S])
    R = 512
    for S, Q in ((256, 1024), (1024, 256), (2048, 256), (1024, 1024)):
        idx = jax.random.randint(ks[1], (R, Q), 0, S, jnp.int32)

        def gw_k(x_ref, i_ref, o_ref, S=S):
            src = x_ref[:][:, :S]
            g = lane_gather(src, i_ref[:])
            o_ref[:] = x_ref[:].at[:, : g.shape[1]].add(g * 1e-6)

        xr = jnp.ones((R, max(S, Q)), jnp.float32)
        timeit(f"mgather_{R}_out{Q}_from{S}",
               lambda x, idx=idx, S=S, Q=Q: pcall(
                   gw_k, jax.ShapeDtypeStruct((R, max(S, Q)), jnp.float32), 2)(x, idx), xr)

    # 4. dot for comparison: [128,256]x[256,1024]
    def dot_k(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:][:, :256] @ b_ref[:]

    a = jnp.ones((128, 1024), jnp.float32)
    b = jnp.ones((256, 1024), jnp.float32)

    def dot_call(a):
        o = pl.pallas_call(
            dot_k,
            out_shape=jax.ShapeDtypeStruct((128, 1024), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return a + o * 1e-9

    timeit("dot_128x256x1024", dot_call, a)

    # 5. substep-loop composite: per block of Wb worlds (sublanes), 10
    #    substeps x (12 pose gathers out [Wb,1024] from [Wb,256] + 40 ew ops
    #    + 8 slot gathers out [Wb,256] from [Wb,1024])
    Wb = 64
    idxp = jax.random.randint(ks[3], (Wb, 1024), 0, 256, jnp.int32)
    idxs = jax.random.randint(ks[4], (Wb, 256), 0, 1024, jnp.int32)

    def loop_k(x_ref, ip_ref, is_ref, o_ref):
        ip = ip_ref[:]
        islot = is_ref[:]

        def body(_, s):
            acc = s
            for _ in range(12):
                g = lane_gather(s[:, :256], ip)
                acc = acc + g * 1e-6
            for _ in range(40):
                acc = acc * 1.0000001
            back = 0.0
            for _ in range(8):
                back = back + lane_gather(acc, islot)
            return acc.at[:, :256].add(back * 1e-6)

        o_ref[:] = jax.lax.fori_loop(0, 10, body, x_ref[:])

    xr = jnp.ones((Wb, 1024), jnp.float32)

    def loop_call(x):
        return pl.pallas_call(
            loop_k,
            out_shape=jax.ShapeDtypeStruct((Wb, 1024), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idxp, idxs)

    timeit(f"substepish_loop10_Wb{Wb}", loop_call, xr, T=20)

    # 6. grid over 4096/Wb blocks of the same kernel == full-batch frame cost
    W = 4096
    idxpg = jax.random.randint(ks[5], (W, 1024), 0, 256, jnp.int32)
    idxsg = jax.random.randint(ks[6], (W, 256), 0, 1024, jnp.int32)
    xg = jnp.ones((W, 1024), jnp.float32)

    def grid_call(x):
        return pl.pallas_call(
            loop_k,
            grid=(W // Wb,),
            in_specs=[
                pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wb, 256), lambda w: (w, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Wb, 1024), lambda w: (w, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 1024), jnp.float32),
        )(x, idxpg, idxsg)

    timeit("grid64_substepish_full4096", grid_call, xg, T=10)


if __name__ == "__main__":
    main()
