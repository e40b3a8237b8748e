"""In-kernel random-access vs XLA gather: the VERDICT-r3 #2 measurement.

Folding the 1.33 ms/frame pool gather into the fused kernel would need the
kernel to fetch each sampled pixel run itself: one `pltpu.make_async_copy`
per gather element ([L, 2] u32 at a random (pid, u, v-block) address).
This probe measures the per-copy ISSUE cost of small HBM->VMEM DMAs inside
a Pallas kernel — the quantity that decides whether 60-70k of them per
frame can beat the XLA gather's measured ~17-21 ns/element.

Usage: python scripts/microbench_dma.py [n_copies_per_call]
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


def build(n_copies: int, n_live: int = 8):
    """Kernel issuing ``n_copies`` [8, 128] u32 HBM->VMEM copies (8 slabs
    rotating through ``n_live`` in-flight buffers), then checksumming."""

    def kernel(src_ref, out_ref, scratch, sems):
        def issue(i, slot):
            # distinct rows per copy so nothing coalesces
            row = (i * 37) % (src_ref.shape[0] - 8)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(row, 8)], scratch.at[slot], sems.at[slot])

        def body(i, acc):
            slot = jax.lax.rem(i, n_live)
            issue(i, slot).wait()          # retire the oldest in-flight
            nxt = i + n_live
            @pl.when(nxt < n_copies)
            def _():
                issue(nxt, jax.lax.rem(nxt, n_live)).start()
            return acc + scratch[slot, 0, 0]

        for s in range(n_live):
            issue(s, s).start()
        acc = jax.lax.fori_loop(0, n_copies, body, jnp.uint32(0))
        out_ref[0, 0] = acc

    @jax.jit
    def run(src):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((n_live, 8, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA((n_live,))],
            interpret=jax.default_backend() != "tpu",
        )(src)

    return run


def timed(run, src, reps=10):
    out = run(src)
    int(np.asarray(out)[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = run(src)
        int(np.asarray(out)[0, 0])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 2 ** 31, (4096, 128)).astype(np.uint32))
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    t1 = timed(build(n1), src)
    t4 = timed(build(4 * n1), src)
    ns = (t4 - t1) / (3 * n1) * 1e9
    print(f"per-DMA issue+wait cost ([8,128] u32, {8} in flight): "
          f"{ns:.0f} ns", flush=True)
    print(f"(XLA pool gather measured ~17-21 ns per [L,2] element; "
          f"62k in-kernel copies/frame would cost ~{62_000 * ns / 1e6:.1f} "
          f"ms vs the 1.33 ms gather)", flush=True)


if __name__ == "__main__":
    main()
