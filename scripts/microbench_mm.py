"""MXU rate probe: effective TF/s vs matmul shape, dtype, and dependency.

Chains y = W @ C inside one Pallas kernel (C carried, so steps are
dependent) across shapes, plus an "ind4" variant issuing 4 independent
matmuls per step (models the fused kernel's per-subgroup fwd/bwd mix).
Two-point rep slope cancels dispatch. Prints ns/op and effective TF/s.

Usage: python scripts/microbench_mm.py
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

f32 = jnp.float32


def _one(m, k, n, dt, reps, ind):
    def kernel(w_ref, c_ref, o_ref):
        w = w_ref[:].astype(dt)

        def step(i, c):
            if ind == 1:
                y = jnp.dot(w, c.astype(dt), preferred_element_type=f32)
            else:
                ys = [jnp.dot(w * (1.0 + 0.001 * j), c.astype(dt),
                              preferred_element_type=f32)
                      for j in range(ind)]
                y = ys[0]
                for yy in ys[1:]:
                    y = y + yy
            # keep the carry shape [k, n]: fold y's rows back
            if m == k:
                return y * (1.0 / (1.0 + ind))
            r = -(-k // m)
            return jnp.concatenate([y] * r, 0)[:k] * (1.0 / (1.0 + ind))

        c = jax.lax.fori_loop(0, reps, step, c_ref[:] * 1.0)
        o_ref[:] = jnp.broadcast_to(jnp.sum(c, 1, keepdims=True)[:8, :1],
                                    (8, 128))

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((m, k)) * 0.1, f32)
    c = jnp.asarray(rng.random((k, n)) * 0.1, f32)

    @jax.jit
    def run(w, c):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            interpret=jax.default_backend() != "tpu")(w, c)

    out = run(w, c)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = run(w, c)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / 10)
    return best * 1e9


def probe(m, k, n, dt, ind=1):
    base = 200 if m * k * n < 400 * 1 << 20 else 40
    t1 = _one(m, k, n, dt, base, ind)
    t4 = _one(m, k, n, dt, base * 4, ind)
    ns = (t4 - t1) / 3.0 / base / ind
    tf = 2.0 * m * k * n / ns / 1e3
    name = {f32: "f32", jnp.bfloat16: "bf16"}[dt]
    tag = f" ind{ind}" if ind > 1 else ""
    print(f"[{m},{k}]x[{k},{n}] {name}{tag}: {ns:.0f} ns/op  "
          f"{tf:.0f} TF/s")


def main():
    print(f"backend={jax.devices()[0].platform}", file=sys.stderr)
    for dt in (f32, jnp.bfloat16):
        probe(128, 128, 1280, dt)
        probe(128, 384, 1280, dt)
        probe(256, 256, 1280, dt)
        probe(512, 512, 1280, dt)
        probe(512, 512, 512, dt)
        probe(1280, 1280, 1280, dt)
    probe(128, 384, 1280, f32, ind=4)
    probe(128, 128, 1280, f32, ind=4)


if __name__ == "__main__":
    main()
