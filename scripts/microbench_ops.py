"""Per-op cost model probes for the fused train kernel's sections.

Measures, each in its own Pallas kernel with a fori_loop of REPS so the
~0.8 ms tunnel dispatch amortises away:

  * dep_fma / ind_fma  — dependent vs 8-way-independent fma chains on the
    render tile shape [8, 1280]: separates VPU op LATENCY from ISSUE
    throughput (if ind >> dep per-op, the render section should be
    restructured for ILP, not fewer ops).
  * sigmoid / sincos   — transcendental cost on render/ladder shapes.
  * lanesum_dot        — [8, 1280] x [1280, 128] lane-mix reduction dot
    (the mxu-lanemix primitive; K=1280 serial MXU passes).
  * strided_sum        — the VPU equivalent (9 adds of [8,128] tiles).
  * fwd_mm             — [128, 384] x [384, 1280] forward-shaped matmul,
    f32 vs bf16 operands.
  * serial_tiles       — 10-step dependent per-tile chain ([8,128]) like
    the cumprod/suffix scans.

Prints ns/op and derived per-iteration costs at the kernel's real op
counts. Usage: python scripts/microbench_ops.py [case ...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _one(body, x_shapes, reps):
    def kernel(*refs):
        out = refs[-1]
        ins = refs[:-1]
        c0 = ins[0][:] * 1.0001

        def step(i, c):
            return body(ins, c, i)

        c = jax.lax.fori_loop(0, reps, step, c0)
        # data-dependent reduce so nothing DCEs; out block is [8, 128]
        out[:] = jnp.broadcast_to(
            jnp.sum(c, axis=1, keepdims=True)[:8, :1], (8, 128))

    xs = [jnp.asarray(np.random.default_rng(0).random(s) * 0.5 + 0.25, f32)
          for s in x_shapes]

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            interpret=jax.default_backend() != "tpu",
        )(*xs)

    out = run(*xs)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            out = run(*xs)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / 20)
    return best * 1e9  # ns total per call


def run_kernel(body, x_shapes, reps):
    """ns per loop step, two-point slope (cancels dispatch + prologue)."""
    t1 = _one(body, x_shapes, reps)
    t4 = _one(body, x_shapes, reps * 4)
    return (t4 - t1) / 3.0  # ns for `reps` steps -> caller divides by reps


def main():
    cases = sys.argv[1:] or ["dep_fma", "ind_fma", "sigmoid", "sincos",
                             "lanesum_dot", "strided_sum", "fwd_mm",
                             "fwd_mm_bf16", "serial_tiles"]
    T = 1280

    for case in cases:
        if case == "dep_fma":
            reps = 4000

            def body(ins, c, i):
                return c * ins[0][:] + ins[0][:]
            ns = run_kernel(body, [(8, T)], reps)
            print(f"dep_fma [8,{T}]: {ns/reps:.0f} ns/op "
                  f"({ns/reps/10:.1f} ns per (8,128) tile)")
        elif case == "ind_fma":
            reps = 500

            def body(ins, c, i):
                a = ins[0][:]
                # 8 independent fmas per step (chains via c only every step)
                outs = [c * (1.0 + 0.01 * k) + a for k in range(8)]
                s = outs[0]
                for o in outs[1:]:
                    s = s + o
                return s * 0.125
            ns = run_kernel(body, [(8, T)], reps)
            print(f"ind_fma [8,{T}] (8 ind + 8 adds)/step: "
                  f"{ns/reps/16:.0f} ns/op")
        elif case == "sigmoid":
            reps = 1000

            def body(ins, c, i):
                return jax.nn.sigmoid(c)
            ns = run_kernel(body, [(8, T)], reps)
            print(f"sigmoid [8,{T}]: {ns/reps:.0f} ns/op")
        elif case == "sincos":
            reps = 500

            def body(ins, c, i):
                return jnp.sin(c) + jnp.cos(c * 0.5)
            ns = run_kernel(body, [(96, T)], reps)
            print(f"sin+cos [96,{T}]: {ns/reps:.0f} ns/op-pair")
        elif case == "lanesum_dot":
            reps = 500

            def body(ins, c, i):
                m = ins[1][:]
                return jnp.broadcast_to(
                    jnp.dot(c, m, preferred_element_type=f32)[:, :1],
                    c.shape)
            ns = run_kernel(body, [(8, T), (T, 128)], reps)
            print(f"lanesum dot [8,{T}]x[{T},128]: {ns/reps:.0f} ns/op")
        elif case == "strided_sum":
            reps = 1000

            def body(ins, c, i):
                acc = c[:, 0:128]
                for s in range(1, 10):
                    acc = acc + c[:, s * 128:(s + 1) * 128]
                return c + jnp.concatenate([acc] * 10, 1) * 1e-6
            ns = run_kernel(body, [(8, T)], reps)
            print(f"strided_sum+bcast [8,{T}] (9 adds + concat): "
                  f"{ns/reps:.0f} ns/op")
        elif case in ("fwd_mm", "fwd_mm_bf16"):
            reps = 500
            dt = jnp.bfloat16 if case.endswith("bf16") else f32

            def body(ins, c, i):
                w = ins[1][:].astype(dt)
                y = jnp.dot(w, c.astype(dt), preferred_element_type=f32)
                return jnp.concatenate([y, y, y], 0) * 0.33333
            ns = run_kernel(body, [(384, T), (128, 384)], reps)
            print(f"{case} [128,384]x[384,{T}] (+concat): {ns/reps:.0f} ns/op")
        elif case == "serial_tiles":
            reps = 1000

            def body(ins, c, i):
                cp = c[:, 0:128] * 0.0 + 1.0
                outs = []
                for s in range(10):
                    outs.append(cp)
                    cp = cp * c[:, s * 128:(s + 1) * 128]
                return c * 0.999 + jnp.concatenate(outs, 1) * 1e-6
            ns = run_kernel(body, [(8, T)], reps)
            print(f"serial_tiles cumprod [8,{T}] (10 dep tile muls "
                  f"+ concat): {ns/reps:.0f} ns/op")
        else:
            print(f"unknown case {case}")


if __name__ == "__main__":
    main()
