"""int8 MXU rate probe: is s8 x s8 -> s32 really 2x the f32/bf16 rate here?

The round-3 roofline (docs/round_notes.md) caps the fused train kernels at
~2,300 steps/s for f32/bf16-rate matmuls; int8 operands at 2x pass rate are
the one remaining 2x-class lever (VERDICT round 3 #1). Before building the
quantised kernel, probe on THIS chip:

  1. raw chained s8 matmul rate vs f32 at the kernel's real shapes,
  2. the same chain with in-loop dynamic (per-row-block) quantisation of
     the activation operand — the realistic cost including the VPU
     abs/max/scale/round work the quantised kernel must pay per layer.

Usage: python scripts/microbench_int8.py
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
i8 = jnp.int8
i32 = jnp.int32


def _time(run, *args):
    out = run(*args)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = run(*args)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / 10)
    return best * 1e9


def _chain(m, k, n, mode, reps):
    """Chained y = W @ C with the carry requantised/folded back each step."""

    def kernel(w_ref, c_ref, o_ref):
        if mode in ("i8", "i8_quant"):
            wq = jnp.round(w_ref[:] * 127.0).astype(i8)

        def step(i, c):
            if mode == "f32":
                y = jnp.dot(w_ref[:], c, preferred_element_type=f32)
            elif mode == "i8":
                # operands quantised outside the loop: pure MXU rate
                cq = c.astype(i8)
                y = jnp.dot(wq, cq, preferred_element_type=i32).astype(f32)
            else:  # i8_quant: realistic — dynamic per-tensor quant in-loop
                cf = c.astype(f32)
                s = jnp.max(jnp.abs(cf)) * (1.0 / 127.0) + 1e-30
                cq = jnp.round(cf * (1.0 / s)).astype(i8)
                y = (jnp.dot(wq, cq, preferred_element_type=i32)
                     .astype(f32) * s)
            # fold rows back to carry shape [k, n]
            if m == k:
                nxt = y * 1e-3
            else:
                r = -(-k // m)
                nxt = jnp.concatenate([y] * r, 0)[:k] * 1e-3
            if mode == "i8":
                nxt = jnp.clip(nxt, -127, 127).astype(i8)
            return nxt

        c0 = c_ref[:]
        if mode == "i8":
            c0 = jnp.clip(c0 * 100.0, -127, 127).astype(i8)
        c = jax.lax.fori_loop(0, reps, step, c0)
        o_ref[:] = jnp.broadcast_to(
            jnp.sum(c.astype(f32), 1, keepdims=True)[:8, :1], (8, 128))

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((m, k)) * 0.1, f32)
    c = jnp.asarray(rng.random((k, n)) * 0.1, f32)

    @jax.jit
    def run(w, c):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            interpret=jax.default_backend() != "tpu")(w, c)

    return _time(run, w, c)


def probe(m, k, n, mode, base=200):
    t1 = _chain(m, k, n, mode, base)
    t4 = _chain(m, k, n, mode, base * 4)
    ns = (t4 - t1) / 3.0 / base
    tf = 2.0 * m * k * n / ns / 1e3
    print(f"[{m:4d},{k:4d}]x[{k:4d},{n:5d}] {mode:9s} "
          f"{ns:9.0f} ns/op  {tf:7.1f} TF/s(eff)", flush=True)
    return ns


def main():
    print("backend:", jax.default_backend(), flush=True)
    shapes = [(128, 128, 1280),   # hidden block (w_mid)
              (128, 384, 1280),   # w_in / w_cat_x (EA=384 at G=4,h=32)
              (512, 512, 1280)]   # bg-bank-ish dense
    for (m, k, n) in shapes:
        for mode in ("f32", "i8", "i8_quant"):
            probe(m, k, n, mode)


if __name__ == "__main__":
    main()
