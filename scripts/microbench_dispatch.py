"""Dispatch-pipelining probe for the axon tunnel (VERDICT r3 #4).

The round-3 trace shows ~1-1.4 ms/frame of wall-device gap. If per-dispatch
submit cost OVERLAPS device execution (normal JAX async dispatch), a chain
of N dependent calls with device time >> submit time costs N * device_time;
if submits SERIALISE with execution (tunnel round trip per call), it costs
N * (device + submit). Probe:

  A. chain of N dependent small matmul steps, one readback at the end,
     at two device-time scales -> slope gives per-call wall cost;
  B. the same chain split across TWO independent state chains, dispatched
     interleaved -> if wall halves vs 2x-N single chain, submits pipeline.

Usage: python scripts/microbench_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(reps_inner: int):
    @jax.jit
    def step(x):
        def body(i, x):
            return x @ x * 1e-3 + 0.1
        return jax.lax.fori_loop(0, reps_inner, body, x)
    return step


def run_chain(step, x, n):
    for _ in range(n):
        x = step(x)
    return float(jnp.sum(x))


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.asarray(np.random.default_rng(0).random((512, 512)),
                    jnp.float32)
    N = 100
    for inner in (50, 400):
        step = chain(inner)
        run_chain(step, x, 2)  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            run_chain(step, x, N)
            best = min(best, (time.time() - t0) / N)
        print(f"inner={inner:4d}: {best * 1e3:7.3f} ms/call", flush=True)
    # device time per call difference reveals pure compute scaling; the
    # OFFSET at inner->0 is the per-call non-overlapped cost.

    # B: two independent chains interleaved (same step fn, two states)
    step = chain(400)
    y = x + 0.5
    run_chain(step, y, 2)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        a, b = x, y
        for _ in range(N):
            a = step(a)
            b = step(b)
        s = float(jnp.sum(a)) + float(jnp.sum(b))
        best = min(best, (time.time() - t0) / (2 * N))
    print(f"interleaved 2-chain inner=400: {best * 1e3:7.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
