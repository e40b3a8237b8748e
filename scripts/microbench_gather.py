"""Micro-benchmark: pixel-gather strategies on the real TPU.

The frame sampler gathers ~264k random pixels (2xu32 words) from the packed
frame pool per frame; round 1 measured this at ~7.3 ms via a multi-dim
[pid, u, v] gather. Candidates:

  A. multi-dim gather pool[pid, u, v]            (round-1 baseline)
  B. row-gather: reshape pool to [M, L] u32 rows, jnp.take rows, then select
     the 2 wanted lanes with an iota mask (embedding-lookup pattern; XLA TPU
     has a fast path for single-axis row gathers)  for L in {8, 16, 32}
  C. row-gather with one row per pixel ([M, 2])

Timing uses a data-dependent host readback (block_until_ready is unreliable
on the tunneled backend, see docs/round_notes.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

POOL_N, W, H = 50, 1200, 680
N_RAYS = 264_000


def timed(fn, *args, n=20):
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))  # sync + compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    pool_np = rng.integers(0, 2**31, (POOL_N, W, H, 2), dtype=np.int64).astype(np.uint32)
    pool = jnp.asarray(pool_np)
    pid = jnp.asarray(rng.integers(0, POOL_N, N_RAYS), jnp.int32)
    u = jnp.asarray(rng.integers(0, W, N_RAYS), jnp.int32)
    v = jnp.asarray(rng.integers(0, H, N_RAYS), jnp.int32)

    @jax.jit
    def multidim(pool, pid, u, v):
        return pool[pid, u, v]

    ms = timed(multidim, pool, pid, u, v)
    print(f"A multidim [pid,u,v]: {ms:.2f} ms")

    lin_np = (np.asarray(pid, np.int64) * (W * H) + np.asarray(u, np.int64) * H
              + np.asarray(v, np.int64)).astype(np.int32)
    lin = jnp.asarray(lin_np)

    # pool pre-shaped on host — the real pool would be stored 2D natively
    for lanes_px in (4, 16, 64):  # pixels per row
        L = lanes_px * 2
        M = POOL_N * W * H // lanes_px
        rows_j = jnp.asarray(pool_np.reshape(M, L))

        def rowgather(rows, lin, lanes_px=lanes_px, L=L):
            r = lin // lanes_px
            o = (lin % lanes_px) * 2
            g = jnp.take(rows, r, axis=0)              # [N, L]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            w0 = jnp.sum(jnp.where(lane == o[:, None], g, 0), axis=1)
            w1 = jnp.sum(jnp.where(lane == o[:, None] + 1, g, 0), axis=1)
            return jnp.stack([w0, w1], axis=-1)

        ms = timed(jax.jit(rowgather), rows_j, lin)
        print(f"B row-gather L={L:3d} u32/row: {ms:.2f} ms")
        del rows_j

    rows2 = jnp.asarray(pool_np.reshape(POOL_N * W * H, 2))

    def perpixel(rows, lin):
        return jnp.take(rows, lin, axis=0)

    ms = timed(jax.jit(perpixel), rows2, lin)
    print(f"C row-gather [M,2]:   {ms:.2f} ms")

    rows128 = jnp.asarray(pool_np.reshape(POOL_N * W * H // 64, 128))

    def onehotmm(rows, lin):
        # gather 128-lane rows then select 2 lanes, bf16-matmul-free
        r = lin // 64
        o = (lin % 64) * 2
        g = jnp.take(rows, r, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        w0 = jnp.sum(jnp.where(lane == o[:, None], g, 0), axis=1)
        w1 = jnp.sum(jnp.where(lane == o[:, None] + 1, g, 0), axis=1)
        return jnp.stack([w0, w1], axis=-1)

    ms = timed(jax.jit(onehotmm), rows128, lin)
    print(f"D row-gather L=128 + select: {ms:.2f} ms")


if __name__ == "__main__":
    main()
