#!/usr/bin/env python
"""Primitive microbenchmarks for the batched-worlds hot path.

Measures the candidate lowerings of the two hot primitives in the XPBD
substep loop — body->pair gather and pair->body scatter-accumulation — plus
supporting ops (sort, cumsum, one-hot matmul, elementwise baseline) on the
real TPU, so architecture choices in solver/pallas are data-driven rather
than guessed (VERDICT.md round-1 task 6: instrument before optimizing).

Methodology: this relay's ``block_until_ready`` is a no-op, so each
primitive runs T times inside ONE ``lax.scan`` with a data dependence, and
completion is forced by materializing a checksum. Reported time = chunk
wall / T, minus nothing (scan overhead is ~us-level, negligible vs targets).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, make_fn, T=50, reps=3):
    """make_fn() -> (step_fn, init_carry); step_fn(carry) -> carry."""
    try:
        step_fn, carry0 = make_fn()

        def chunk(carry):
            def body(c, _):
                return step_fn(c), ()

            c, _ = jax.lax.scan(body, carry, None, length=T)
            return c, jnp.sum(jax.tree.leaves(c)[0])

        run = jax.jit(chunk)
        t0 = time.perf_counter()
        c, cs = run(carry0)
        float(np.asarray(cs))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c, cs = run(c)
            float(np.asarray(cs))
            times.append(time.perf_counter() - t0)
        per_op = min(times) / T
        log(f"[micro] {name:42s} {per_op * 1e6:10.1f} us/op   (compile {compile_s:.1f}s)")
        return per_op
    except Exception as e:  # noqa: BLE001
        log(f"[micro] {name:42s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--bodies", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--only", default="", help="comma-separated benchmark names")
    args = ap.parse_args()
    W, N, P = args.worlds, args.bodies, args.pairs
    only = set(args.only.split(",")) if args.only else None

    dev = jax.devices()[0]
    log(f"[micro] device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
        f"W={W} N={N} P={P}")

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idx_wp = jax.random.randint(k1, (W, P), 0, N, jnp.int32)  # body idx per pair
    idx_w2p = jax.random.randint(k2, (W, 2 * P), 0, N, jnp.int32)

    benches = {}

    def bench(name):
        def deco(fn):
            benches[name] = fn
            return fn
        return deco

    # -- baseline: elementwise chain over [W, P] (50 fused ops)
    @bench("ew50_WP")
    def _():
        x = jnp.ones((W, P), jnp.float32)

        def f(x):
            for _ in range(25):
                x = x * 1.0000001 + 1e-7
            return x

        return f, x

    # -- gather: per-world take_along_axis along last axis [W,P] <- [W,N]
    @bench("gather_tala_lastaxis")
    def _():
        x = jnp.ones((W, N), jnp.float32)

        def f(x):
            y = jnp.take_along_axis(x, idx_wp, axis=1)  # [W, P]
            return x + y[:, :N] * 1e-9

        return f, x

    # -- gather x6 components (realistic substep pose gather)
    @bench("gather_tala_6x")
    def _():
        xs = tuple(jnp.ones((W, N), jnp.float32) for _ in range(6))

        def f(xs):
            ys = [jnp.take_along_axis(x, idx_wp, axis=1) for x in xs]
            return tuple(x + y[:, :N] * 1e-9 for x, y in zip(xs, ys))

        return f, xs

    # -- gather: flat row gather [W*P, 8] <- [W*N, 8]
    @bench("gather_flatrows8")
    def _():
        x = jnp.ones((W * N, 8), jnp.float32)
        flat = (idx_wp + (jnp.arange(W, dtype=jnp.int32) * N)[:, None]).ravel()

        def f(x):
            y = x[flat]  # [W*P, 8]
            return x + y[: W * N] * 1e-9

        return f, x

    # -- gather with transposed layout: [P, W] <- [N, W] along axis 0
    @bench("gather_tala_axis0_T")
    def _():
        x = jnp.ones((N, W), jnp.float32)
        idxT = idx_wp.T  # [P, W]

        def f(x):
            y = jnp.take_along_axis(x, idxT, axis=0)  # [P, W]
            return x + y[:N] * 1e-9

        return f, x

    # -- scatter-add: flat [W*N] <- [W*2P] contributions
    @bench("scatter_add_flat")
    def _():
        v = jnp.ones((W, 2 * P), jnp.float32)
        flat = (idx_w2p + (jnp.arange(W, dtype=jnp.int32) * N)[:, None]).ravel()

        def f(v):
            acc = jnp.zeros((W * N,), jnp.float32).at[flat].add(v.ravel())
            return v + acc.reshape(W, N)[:, :1] * 1e-9

        return f, v

    # -- scatter-add 4 components as [W*2P, 4] rows
    @bench("scatter_add_rows4")
    def _():
        v = jnp.ones((W, 2 * P, 4), jnp.float32)
        flat = (idx_w2p + (jnp.arange(W, dtype=jnp.int32) * N)[:, None]).ravel()

        def f(v):
            acc = jnp.zeros((W * N, 4), jnp.float32).at[flat].add(
                v.reshape(W * 2 * P, 4))
            return v + acc.reshape(W, N, 4)[:, :1, :] * 1e-9

        return f, v

    # -- segment-sum via presorted order: gather into sorted order + cumsum +
    #    boundary gathers (the scatter-free accumulation candidate)
    @bench("segsum_cumsum")
    def _():
        v = jnp.ones((W, 2 * P), jnp.float32)
        srt = jnp.argsort(idx_w2p, axis=1).astype(jnp.int32)
        sidx = jnp.take_along_axis(idx_w2p, srt, axis=1)
        # per body: position of its last contribution in sorted order (or 0)
        iota = jnp.arange(2 * P, dtype=jnp.int32)[None, :]
        is_last = jnp.concatenate(
            [sidx[:, :-1] != sidx[:, 1:], jnp.ones((W, 1), bool)], axis=1)
        # loc_end[n] = index of last slot of body n, else -1
        loc_end = jnp.full((W, N), -1, jnp.int32).at[
            jnp.arange(W)[:, None], jnp.where(is_last, sidx, 0)
        ].max(jnp.where(is_last, iota, -1))
        has = loc_end >= 0
        loc_end_c = jnp.maximum(loc_end, 0)

        def f(v):
            sv = jnp.take_along_axis(v, srt, axis=1)
            cs = jnp.cumsum(sv, axis=1)
            tot = jnp.take_along_axis(cs, loc_end_c, axis=1)
            # body sum = cs[loc_end] - cs[loc_start-1]; approximate cost with
            # a second gather
            tot0 = jnp.take_along_axis(cs, jnp.maximum(loc_end_c - 1, 0), axis=1)
            out = jnp.where(has, tot - tot0, 0.0)
            return v + out[:, :1] * 1e-9

        return f, v

    # -- slot-table accumulation: per-body fixed fan-in C gathers
    @bench("slots_gatherC8")
    def _():
        C = 8
        v = jnp.ones((W, 2 * P), jnp.float32)
        # fake slot table [W, N, C] pointing into 2P contribution slots
        slots = jax.random.randint(k3, (W, N * C), 0, 2 * P, jnp.int32)

        def f(v):
            g = jnp.take_along_axis(v, slots, axis=1).reshape(W, N, C)
            out = g.sum(-1)
            return v + out[:, :1] * 1e-9

        return f, v

    # -- slot-table, 4 components at once via flat row gather
    @bench("slots_flatrows4_C8")
    def _():
        C = 8
        v = jnp.ones((W * 2 * P, 4), jnp.float32)
        slots = jax.random.randint(k3, (W, N * C), 0, 2 * P, jnp.int32)
        flat = (slots + (jnp.arange(W, dtype=jnp.int32) * 2 * P)[:, None]).ravel()

        def f(v):
            g = v[flat].reshape(W, N, C, 4)
            out = g.sum(2)
            return v + out.reshape(W * N, 4)[: W * 2 * P // 2, :1].sum() * 1e-12

        return f, v

    # -- sort per world (frame-level cost)
    @bench("argsort_W2P")
    def _():
        x = idx_w2p.astype(jnp.float32)

        def f(x):
            o = jnp.argsort(x, axis=1)
            return x + o.astype(jnp.float32)[:, :1] * 1e-9

        return f, x

    # -- cumsum along last axis
    @bench("cumsum_W2P")
    def _():
        x = jnp.ones((W, 2 * P), jnp.float32)

        def f(x):
            return x * 0.99999 + jnp.cumsum(x, axis=1) * 1e-12

        return f, x

    # -- one-hot batched matmul accumulation, bf16 one-hot built per call
    @bench("onehot_bmm_bf16_W256")
    def _():
        Wb = 256  # materializing [W,N,2P] for W=4096 is 4.3 GB; scale later
        v = jnp.ones((Wb, 2 * P, 4), jnp.float32)
        idx = idx_w2p[:Wb]
        oh = (idx[:, None, :] == jnp.arange(N, jnp.int32)[None, :, None]
              ).astype(jnp.bfloat16)

        def f(v):
            out = jnp.einsum("wnp,wpc->wnc", oh, v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return v + out[:, : 2 * P // Wb].astype(jnp.float32).reshape(
                Wb, -1, 4)[:, :1] * 1e-9

        return f, v

    # -- pallas: dynamic gather along lanes probe [8, 128] idx within vreg
    @bench("pallas_lane_gather_probe")
    def _():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Wb = 512

        def kernel(x_ref, idx_ref, o_ref):
            x = x_ref[:]  # [Wb, 128]
            idx = idx_ref[:]  # [Wb, 128]
            o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

        x = jnp.ones((Wb, 128), jnp.float32)
        idx = jax.random.randint(k3, (Wb, 128), 0, 128, jnp.int32)

        def f(x):
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Wb, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
            return x + y * 1e-9

        return f, x

    # -- pallas: sublane gather probe (take_along_axis axis=0)
    @bench("pallas_sublane_gather_probe")
    def _():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(x_ref, idx_ref, o_ref):
            x = x_ref[:]  # [N, 128]
            idx = idx_ref[:]  # [P, 128]
            o_ref[:] = jnp.take_along_axis(x, idx, axis=0)

        x = jnp.ones((N, 128), jnp.float32)
        idx = jax.random.randint(k3, (P, 128), 0, N, jnp.int32)

        def f(x):
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
            return x + y[:N] * 1e-9

        return f, x

    for name, make in benches.items():
        if only and name not in only:
            continue
        timeit(name, make)


if __name__ == "__main__":
    main()
