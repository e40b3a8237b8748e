"""Probe VPU elementwise throughput in a Pallas kernel: f32 vs bf16.

Times a long chain of elementwise ops over a [8, 1280] tile (the fused
kernel's per-ray array shape) and a [96, 1280] tile (the PE ladder shape),
in f32 and bf16, plus a transcendental (sigmoid) variant. If bf16 runs ~2x
faster, Mosaic packs bf16 2-per-lane and the kernel's render/ladder/Adam
sections should compute in bf16.

Usage: python scripts/microbench_vpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 8000   # must make in-kernel compute >> the ~0.8 ms tunnel dispatch


def make_kernel(rows, dtype, op):
    def kernel(x_ref, o_ref):
        a = x_ref[:].astype(dtype)

        def body(_, b):
            if op == "mul":
                return b * a + a       # fma chain
            if op == "sigmoid":
                return jax.nn.sigmoid(b)
            return jnp.maximum(b * a + a, 0.1 * a)   # render-like mix

        b = jax.lax.fori_loop(0, REPS, body, a * 1.0001)
        o_ref[:] = b.astype(jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(x)

    return run


def timed(fn, x, n=50):
    out = fn(x)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(x)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1e6  # us


def main():
    print(f"backend={jax.devices()[0].platform}", file=sys.stderr)
    for rows in (8, 96):
        x = jnp.asarray(np.random.rand(rows, 1280), jnp.float32)
        # NOTE: sigmoid in bf16 crashes Mosaic lowering ('vector.broadcast'
        # f32 -> bf16 verification error) — bf16 transcendentals are
        # unsupported territory; f32-only for that op.
        for op in ("mul", "mixed"):
            res = {}
            for dt in (jnp.float32, jnp.bfloat16):
                us = timed(make_kernel(rows, dt, op), x)
                res[dt.__name__] = round(us, 1)
            vregs = rows * 1280 // 1024
            ratio = round(res["float32"] / max(res["bfloat16"], 1e-9), 2)
            print(f"[{rows},1280] ({vregs} vregs) {op} x{REPS}: "
                  f"f32={res['float32']}us bf16={res['bfloat16']}us "
                  f"f32/bf16={ratio}")
        us = timed(make_kernel(rows, jnp.float32, "sigmoid"), x)
        print(f"[{rows},1280] sigmoid x{REPS}: f32={round(us, 1)}us")


if __name__ == "__main__":
    main()
