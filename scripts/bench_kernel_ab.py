"""A/B object-bank kernel variants via env knobs at cap=104 (ng=26).

Each argv item is a comma-separated ENV=VAL spec applied before (re)tracing
the kernel, e.g.:

    python scripts/bench_kernel_ab.py VMAP_NS=1 VMAP_NS=2 \
        VMAP_NS=2,VMAP_UNROLL=1

Knobs: VMAP_NS (render subgroups per invocation), VMAP_UNROLL (static
iteration unroll). Object bank only, readback-synced, best of 5x20."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.core.bank import activate_slot, init_bank
from vmap_tpu.core.step import StepStatics, _sample_bank
from vmap_tpu.kernels.train_step import fused_frame_prepared, prepare_bank


def main():
    CAP, HIDDEN = 104, 32
    W, H, POOL = 1200, 680, 20
    st = StepStatics(
        n_iter=20, win=5, n_px=24, n_b2s=1, n_bins=9, do_bg=False,
        min_depth=0.0, surface_eps=0.1, stop_eps=0.05,
        lr=1e-3, wd=0.013, compute_dtype="bfloat16",
        fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    key = jax.random.PRNGKey(0)
    bank = init_bank(key, CAP, HIDDEN, default_scale=2.0)
    bank = bank.replace(active=jnp.ones((CAP,), bool))
    pb = prepare_bank(bank, 4)

    rng = np.random.default_rng(0)
    depth_mm = rng.integers(500, 7500, (POOL, W, H)).astype(np.uint32)
    inst_b = (rng.integers(-1, CAP, (POOL, W, H)) + 1).astype(np.uint32)
    rgbw = rng.integers(0, 2 ** 24, (POOL, W, H)).astype(np.uint32)
    packed = np.stack([rgbw, depth_mm | (inst_b << 16)], axis=-1)
    pool = (jnp.asarray(packed, jnp.uint32),
            jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (POOL, 1, 1)))
    KF = 20
    kf_pool = jnp.asarray(rng.integers(0, POOL, (CAP, KF)), jnp.int32)
    bbox = jnp.tile(jnp.asarray([0, W, 0, H], jnp.float32), (CAP, KF, 1))
    n_kf = jnp.full((CAP,), KF, jnp.int32)
    latest2 = jnp.tile(jnp.asarray([KF - 2, KF - 1], jnp.int32), (CAP, 1))
    tab = (kf_pool, bbox, n_kf, latest2)
    obj_ids = jnp.arange(CAP, dtype=jnp.int32)
    n_frames = st.n_iter * st.win
    n_per = st.win * st.n_px

    batch = jax.jit(lambda k: _sample_bank(
        k, *pool, *tab, obj_ids, n_frames, st.n_px, st.n_b2s, st))(key)
    batch = jax.device_put({k: v for k, v in batch.items() if k != "pts"})

    def timed(fn, *a, n=20):
        out = fn(*a)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            for _ in range(n):
                out = fn(*a)
            float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            best = min(best, (time.time() - t0) / n)
        return best * 1000

    for spec in sys.argv[1:] or ["VMAP_NS=1", "VMAP_NS=2",
                                 "VMAP_NS=2,VMAP_UNROLL=1"]:
        envs = dict(kv.split("=") for kv in spec.split(","))
        for k, v in envs.items():
            os.environ[k] = v
        policy = os.environ.get("VMAP_POLICY", "f32")  # f32|bf16|int8|...
        fn = jax.jit(lambda pb, b: fused_frame_prepared(
            pb, b, st.n_iter, n_per, lr=st.lr, wd=st.wd, bf16=policy)[1])
        t0 = time.time()
        ms = timed(fn, pb, batch)
        print(f"{spec}: {ms:.2f} ms (compile+run0 {time.time()-t0:.0f}s)")
        jax.clear_caches()
        for k in envs:
            del os.environ[k]


if __name__ == "__main__":
    main()
