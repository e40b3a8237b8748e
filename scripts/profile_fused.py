"""Per-component TPU timing of the fused frame path.

Times (readback-synced, best of 5 chunks of 20):
  A. sampling only (obj + bg banks)
  B. batch layout transforms only (_prepare_batch, both banks)
  C. object-bank kernel incl. batch prep (sampling done outside)
  D. background-bank kernel incl. batch prep
  E. full fused frame step (sanity: ~A + C + D)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_workload
from vmap_tpu.core.step import _sample_bank
from vmap_tpu.kernels import train_step as TS


def timed(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    sync = jax.tree.leaves(out)[0]
    float(jnp.asarray(sync).ravel()[0])  # compile + sync
    best = 1e9
    for c in range(5):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args, **kw)
        sync = jax.tree.leaves(out)[0]
        float(jnp.asarray(sync).ravel()[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1000, out


def main():
    bf16 = len(sys.argv) > 1 and sys.argv[1] == "bf16"
    step, st, ws = build_workload("bfloat16" if bf16 else "float32",
                                  fused=True)
    pb_obj, pb_bg, pool, obj_tab, obj_ids, bg_tab = ws
    n_frames = st.n_iter * st.win
    n_frames_bg = st.n_iter * st.win_bg
    n_per = st.win * st.n_px
    n_per_bg = st.win_bg * st.n_px_bg
    key = jax.random.PRNGKey(0)
    res = {}
    print(f"backend={jax.devices()[0].platform} bf16={bf16}", file=sys.stderr)

    # ---- A: sampling ----
    @jax.jit
    def sample_both(key):
        k1, k2 = jax.random.split(key)
        b = _sample_bank(k1, *pool, *obj_tab, obj_ids,
                         n_frames, st.n_px, st.n_b2s, st)
        bg_ids = jnp.zeros((1,), jnp.int32)
        bb = _sample_bank(k2, *pool, *bg_tab, bg_ids,
                          n_frames_bg, st.n_px_bg, st.n_b2s_bg, st)
        b = {k: v for k, v in b.items()
             if k.endswith("_sm") or k in ("depth", "state", "valid")}
        bb = {k: v for k, v in bb.items()
              if k.endswith("_sm") or k in ("depth", "state", "valid")}
        # fused path consumes only the sample/channel-major keys
        return b, bb

    ms, (batch, batch_bg) = timed(sample_both, key)
    res["A_sampling_ms"] = round(ms, 2)

    # ---- B: batch layout transforms ----
    ns_obj = TS.pick_ns(pb_obj.G, pb_obj.spec.hidden,
                        pb_obj.capacity // pb_obj.G, n_per)
    ns_bg = TS.pick_ns(pb_bg.G, pb_bg.spec.hidden,
                       pb_bg.capacity // pb_bg.G, n_per_bg)

    @jax.jit
    def bprep(batch, batch_bg):
        b = TS._prepare_batch(batch, pb_obj.scale, pb_obj.active,
                              pb_obj.step, st.n_iter, n_per, pb_obj.G,
                              ns_obj)
        bb = TS._prepare_batch(batch_bg, pb_bg.scale, pb_bg.active,
                               pb_bg.step, st.n_iter, n_per_bg, pb_bg.G,
                               ns_bg)
        return b["od"], bb["od"]

    ms, _ = timed(bprep, batch, batch_bg)
    res["B_batch_prep_ms"] = round(ms, 2)

    # ---- C/D: kernel (incl. batch prep; sampling outside) ----
    def make_kernel_only(pb, n_per):
        def f(pb, batch):
            pb2, losses = TS.fused_frame_prepared(
                pb, batch, st.n_iter, n_per, lr=st.lr, wd=st.wd,
                color_scaling=st.color_scaling,
                opacity_scaling=st.opacity_scaling, bf16=bf16)
            return losses
        return jax.jit(f)

    ms, _ = timed(make_kernel_only(pb_obj, n_per), pb_obj, batch)
    res["C_obj_kernel_ms"] = round(ms, 2)
    ms, _ = timed(make_kernel_only(pb_bg, n_per_bg), pb_bg, batch_bg)
    res["D_bg_kernel_ms"] = round(ms, 2)

    # ---- E: full fused frame step ----
    def full(key):
        nonlocal pb_obj, pb_bg
        pb_obj, pb_bg, m = step(pb_obj, pb_bg, *pool, obj_tab, obj_ids,
                                bg_tab, key)
        return m["loss"]

    ms, _ = timed(full, key)
    res["E_full_frame_ms"] = round(ms, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
