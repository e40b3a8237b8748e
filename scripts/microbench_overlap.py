"""MXU/VPU cross-workload overlap probe.

Question: if the background bank's matmul chain (MXU-heavy) is emitted
interleaved with the object banks' render chain (VPU-heavy) inside ONE
Pallas kernel body — two INDEPENDENT dependency chains — does the Mosaic /
LLO scheduler overlap them, and at what emission granularity?

Workloads per "step" (loop iteration):
  * vpu  — render-like chain: ~24 dependent elementwise ops on [8, 1280].
  * mxu  — bg-like chain: dependent [128, 128] x [128, 1280] matmul
           (weights resident), 2 per step.
  * both — each loop step advances BOTH chains; emission alternates at op
           granularity inside the step (vpu ops and the matmuls are
           independent of each other).

Reports per-variant ms for reps={R1,R2} and the slope (cancels dispatch),
plus overlap = (vpu + mxu - both) / min(vpu, mxu): 1.0 = perfect hiding,
0.0 = fully serial.

Usage: python scripts/microbench_overlap.py
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

f32 = jnp.float32
T = 1280


def vpu_step(v, a, b):
    """~24 dependent elementwise ops on [8, T] (render-like mix)."""
    for _ in range(4):
        v = v * a + b
        v = jnp.abs(v) + 1e-3
        v = jnp.maximum(v * 0.99, b * 0.5)
        v = v - jnp.sign(v) * 1e-4
        v = v * (1.0 - v * 1e-3)
        v = v + a * 1e-3
    return v


def mxu_step(c, w1, w2):
    """Two dependent [128,128] x [128,T] matmuls (bg-like)."""
    c = jnp.dot(w1, c, preferred_element_type=f32) * 1e-2
    c = jnp.dot(w2, c, preferred_element_type=f32) * 1e-2
    return c


def _run(mode, reps):
    def kernel(a_ref, b_ref, w1_ref, w2_ref, c_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        w1 = w1_ref[:]
        w2 = w2_ref[:]
        v0 = a * 1.0001
        c0 = c_ref[:] * 1.0001

        def step(i, carry):
            v, c = carry
            if mode == "vpu":
                v = vpu_step(v, a, b)
            elif mode == "mxu":
                c = mxu_step(c, w1, w2)
            else:   # both: independent chains, interleaved emission
                # alternate: half the vpu ops, matmul 1, rest, matmul 2
                v = v * a + b
                v = jnp.abs(v) + 1e-3
                v = jnp.maximum(v * 0.99, b * 0.5)
                c = jnp.dot(w1, c, preferred_element_type=f32) * 1e-2
                v = v - jnp.sign(v) * 1e-4
                v = v * (1.0 - v * 1e-3)
                v = v + a * 1e-3
                for _ in range(3):
                    v = v * a + b
                    v = jnp.abs(v) + 1e-3
                    v = jnp.maximum(v * 0.99, b * 0.5)
                    v = v - jnp.sign(v) * 1e-4
                    v = v * (1.0 - v * 1e-3)
                    v = v + a * 1e-3
                c = jnp.dot(w2, c, preferred_element_type=f32) * 1e-2
            return (v, c)

        v, c = jax.lax.fori_loop(0, reps, step, (v0, c0))
        o_ref[:] = (jnp.broadcast_to(jnp.sum(v, 1, keepdims=True), (8, 128))
                    + jnp.sum(c[:8, :128]))

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.random((8, T)) * 0.5 + 0.25, f32)
    b = jnp.asarray(rng.random((8, T)) * 0.5 + 0.25, f32)
    w1 = jnp.asarray(rng.random((128, 128)) * 0.1, f32)
    w2 = jnp.asarray(rng.random((128, 128)) * 0.1, f32)
    c = jnp.asarray(rng.random((128, T)) * 0.5, f32)

    @jax.jit
    def run(a, b, w1, w2, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b, w1, w2, c)

    out = run(a, b, w1, w2, c)
    float(out[0, 0])
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(10):
            out = run(a, b, w1, w2, c)
        float(out[0, 0])
        best = min(best, (time.time() - t0) / 10)
    return best * 1000


def main():
    R1, R2 = 200, 600
    res = {}
    for mode in ("vpu", "mxu", "both"):
        t1 = _run(mode, R1)
        t2 = _run(mode, R2)
        slope = (t2 - t1) / (R2 - R1) * 1000   # us/step
        res[mode] = slope
        print(f"{mode:5s}: {t1:7.3f} ms @{R1}  {t2:7.3f} ms @{R2}  "
              f"slope {slope:7.3f} us/step")
    ov = (res["vpu"] + res["mxu"] - res["both"]) / min(res["vpu"],
                                                       res["mxu"])
    print(f"overlap fraction: {ov:.2f}  "
          f"(1 = smaller chain fully hidden, 0 = serial)")


if __name__ == "__main__":
    main()
