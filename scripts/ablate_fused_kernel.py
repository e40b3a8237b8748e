"""Ablate sections of the REAL monolithic train-frame kernel on TPU.

Uses kernels/train_step.py's _ablate hooks on the production object-bank
workload (G=4, 25 groups, 20 iters):
  full     : everything
  adam     : AdamW replaced by a trivial write     -> adam cost
  bwd      : matmul-bwd kept, dirs-bwd + demb skipped (cheap fake grads)
  bwdall   : forward + render/loss only            -> whole backward cost
  static0  : batch reads pinned to chunk 0         -> dynamic-read cost
Run with arg "bf16" for bfloat16 matmuls; arg "bg" ablates the BACKGROUND
bank kernel (G=1, h=128, 10 ray chunks/iter) instead of the object bank.
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
    bf16 = "bf16" in sys.argv[1:]
    bg = "bg" in sys.argv[1:]
    _, st, ws = build_workload("bfloat16" if bf16 else "float32", fused=True)
    pb_obj, pb_bg, pool, obj_tab, obj_ids, bg_tab = ws
    key = jax.random.PRNGKey(0)
    if bg:
        pb_obj = pb_bg
        n_frames = st.n_iter * st.win_bg
        n_per = st.win_bg * st.n_px_bg
        batch = jax.jit(lambda k: _sample_bank(
            k, *pool, *bg_tab, jnp.zeros((1,), jnp.int32), n_frames,
            st.n_px_bg, st.n_b2s_bg, st))(key)
    else:
        n_frames = st.n_iter * st.win
        n_per = st.win * st.n_px
        batch = jax.jit(lambda k: _sample_bank(
            k, *pool, *obj_tab, obj_ids, n_frames, st.n_px, st.n_b2s, st))(key)
    batch = {k: v for k, v in batch.items() if k != "pts"}
    batch = jax.device_put(batch)

    res = {"bf16": bf16, "bank": "bg" if bg else "obj"}
    for tag, abl in (("full", frozenset()),
                     ("no_adam", frozenset({"adam"})),
                     ("no_dirsbwd", frozenset({"bwd"})),
                     ("fwd_only", frozenset({"bwdall"})),
                     ("static_reads", frozenset({"static0"})),
                     ("no_ladder", frozenset({"ladder", "bwdall"})),
                     ("mm_only", frozenset({"render"})),
                     ("mm_only_no_ladder", frozenset({"render", "ladder"}))):
        fn = jax.jit(lambda pb, b, a=abl: TS.fused_frame_prepared(
            pb, b, st.n_iter, n_per, lr=st.lr, wd=st.wd,
            color_scaling=st.color_scaling,
            opacity_scaling=st.opacity_scaling, bf16=bf16, _ablate=a)[1])
        res[tag + "_ms"] = round(timed(fn, pb_obj, batch), 2)
        print(tag, res[tag + "_ms"], file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
