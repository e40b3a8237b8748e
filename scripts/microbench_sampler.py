"""Per-section TPU timing of the frame sampler (_sample_bank).

Sections (each timed as its own jit with a host readback sync):
  full      — both banks' _sample_bank (the bench configuration)
  gather    — pool pixel gather only (kf choice + uv draw + [pid,u,v])
  decode    — gather + u32 unpack to rgb/depth/state
  rays      — gather + pinhole dirs + world transform
  zsample   — gather + sample_z (depth-guided 3D sampling)
  rng_only  — the raw random draws (kf/u/v/z uniforms), no gather

The deltas between sections attribute the sampler's cost. Usage:
  python scripts/microbench_sampler.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_workload
from vmap_tpu.core.step import StepStatics, _sample_bank
from vmap_tpu.ops import rays as R
from vmap_tpu.ops import sampling as S


def timed(fn, *args, n=20):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1000


def main():
    step, st, ws = build_workload("float32", fused=True)
    pb_obj, pb_bg, pool, obj_tab, obj_ids, bg_tab = ws
    pool_packed, pool_twc = pool
    n_frames = st.n_iter * st.win
    n_frames_bg = st.n_iter * st.win_bg
    key = jax.random.PRNGKey(0)
    W = pool_packed.shape[1]
    H = pool_packed.shape[2]

    def partial_sampler(upto: str):
        """Reimplements _sample_bank's per-slot body up to a section."""

        def sample_one(key, kf_pool, bbox_tab, n_kf1, latest2_1, obj_id,
                       n_fr, n_px, n_b2s):
            k_kf, k_u, k_v, k_z = jax.random.split(key, 4)
            n_safe = jnp.maximum(n_kf1, 1)
            ids_a = jnp.floor(jax.random.uniform(k_kf, (n_fr,))
                              * n_safe).astype(jnp.int32)
            ids_a = jnp.minimum(ids_a, n_safe - 1)
            ids_b = jnp.concatenate(
                [ids_a[: n_fr - 2], latest2_1.astype(jnp.int32)])
            kf_local = jnp.where(n_kf1 > 2, ids_b, ids_a)
            bbox = bbox_tab[kf_local]
            pool_ids = kf_pool[kf_local]
            uu = jax.random.uniform(k_u, (n_fr, n_px))
            vv = jax.random.uniform(k_v, (n_fr, n_px))
            u = jnp.floor(uu * (bbox[:, 1] - bbox[:, 0])[:, None]
                          + bbox[:, 0][:, None])
            v = jnp.floor(vv * (bbox[:, 3] - bbox[:, 2])[:, None]
                          + bbox[:, 2][:, None])
            u = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            v = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            if upto == "rng_only":
                e = jax.random.uniform(k_z, (n_fr, n_px, 30))
                return (u.astype(jnp.float32).sum()
                        + v.astype(jnp.float32).sum() + e.sum())
            g = pool_packed[pool_ids[:, None], u, v]
            if upto == "gather":
                return g[..., 0].astype(jnp.float32).sum()
            w0, w1 = g[..., 0], g[..., 1]
            depth = (w1 & 0xFFFF).astype(jnp.float32) * 1e-3
            if upto == "decode":
                rgb = jnp.stack([w0 & 255, (w0 >> 8) & 255,
                                 (w0 >> 16) & 255], -1).astype(jnp.float32)
                inst_b = ((w1 >> 16) & 0xFFFF).astype(jnp.int32)
                st2 = jnp.where(inst_b == obj_id + 1, 1,
                                jnp.where(inst_b == 0, 2, 0))
                return rgb.sum() + depth.sum() + st2.astype(jnp.float32).sum()
            if upto == "rays":
                dirs_c = jnp.stack([
                    (u.astype(jnp.float32) - st.cx) / st.fx,
                    (v.astype(jnp.float32) - st.cy) / st.fy,
                    jnp.ones_like(u, jnp.float32)], -1)
                twc = pool_twc[pool_ids]
                o, d = R.origin_dirs_w(twc, dirs_c)
                return o.sum() + d.sum()
            if upto == "zsample":
                inst_b = ((w1 >> 16) & 0xFFFF).astype(jnp.int32)
                st2 = jnp.where(inst_b == obj_id + 1, S.THIS_OBJ,
                                jnp.where(inst_b == 0, S.UNKNOWN_OBJ,
                                          S.OTHER_OBJ))
                z, valid = S.sample_z(k_z, depth, st2, st.min_depth,
                                      jnp.max(depth), n_b2s, st.n_bins,
                                      st.surface_eps, st.stop_eps)
                return z.sum()
            raise ValueError(upto)

        def run(key):
            cap = obj_tab[0].shape[0]
            keys = jax.random.split(key, cap)
            a = jax.vmap(lambda k, kp, bb, nk, l2, oid: sample_one(
                k, kp, bb, nk, l2, oid, n_frames, st.n_px, st.n_b2s))(
                keys, *obj_tab, obj_ids).sum()
            kb = jax.random.fold_in(key, 1)
            b = jax.vmap(lambda k, kp, bb, nk, l2, oid: sample_one(
                k, kp, bb, nk, l2, oid, n_frames_bg, st.n_px_bg,
                st.n_b2s_bg))(
                kb[None], *bg_tab, jnp.zeros((1,), jnp.int32)).sum()
            return a + b

        return jax.jit(run)

    @jax.jit
    def full(key):
        b = _sample_bank(key, pool_packed, pool_twc, *obj_tab, obj_ids,
                         n_frames, st.n_px, st.n_b2s, st)
        bb = _sample_bank(jax.random.fold_in(key, 1), pool_packed, pool_twc,
                          *bg_tab, jnp.zeros((1,), jnp.int32),
                          n_frames_bg, st.n_px_bg, st.n_b2s_bg, st)
        b = {k: v for k, v in b.items()
             if k.endswith("_sm") or k in ("depth", "state", "valid")}
        bb = {k: v for k, v in bb.items()
              if k.endswith("_sm") or k in ("depth", "state", "valid")}
        return b, bb

    names = sys.argv[1:] or ["rng_only", "gather", "decode", "rays",
                             "zsample", "full"]
    for name in names:
        fn = full if name == "full" else partial_sampler(name)
        print(f"{name}: {timed(fn, key):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
