"""TPU A/B benchmark: monolithic fused train-frame kernel vs the XLA scan
step, on the bench.py 100-object Replica workload shape.

Usage: python scripts/bench_fused_frame.py [frames] [mode]
  mode: fused | xla | both (default both)

Timing is readback-synced (see CLAUDE.md): every timed region ends with a
host readback of a data-dependent scalar.
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
from vmap_tpu.core.step import StepStatics, _sample_bank
from vmap_tpu.kernels.train_step import fused_bank_frame


def make_fused_frame(st: StepStatics, bf16: bool):
    n_frames = st.n_iter * st.win
    n_frames_bg = st.n_iter * st.win_bg
    n_per = st.win * st.n_px
    n_per_bg = st.win_bg * st.n_px_bg

    def frame(bank_obj, bank_bg, pool_packed, pool_twc,
              obj_tab, obj_ids, bg_tab, key):
        k_obj, k_bg = jax.random.split(key)
        batch = _sample_bank(k_obj, pool_packed, pool_twc, *obj_tab,
                             obj_ids, n_frames, st.n_px, st.n_b2s, st)
        G = max(128 // bank_obj.spec.hidden, 1)
        bank_obj, losses_o = fused_bank_frame(
            bank_obj, batch, st.n_iter, n_per, G, lr=st.lr, wd=st.wd,
            color_scaling=st.color_scaling, opacity_scaling=st.opacity_scaling,
            bf16=bf16, interpret=False)
        bg_ids = jnp.zeros((1,), jnp.int32)
        batch_bg = _sample_bank(k_bg, pool_packed, pool_twc, *bg_tab,
                                bg_ids, n_frames_bg, st.n_px_bg,
                                st.n_b2s_bg, st)
        bank_bg, losses_b = fused_bank_frame(
            bank_bg, batch_bg, st.n_iter, n_per_bg, 1, lr=st.lr, wd=st.wd,
            color_scaling=st.color_scaling, opacity_scaling=st.opacity_scaling,
            bf16=bf16, interpret=False)
        loss = losses_o[:, -1].sum() + losses_b[:, -1].sum()
        return bank_obj, bank_bg, {"loss": loss}

    return jax.jit(frame, donate_argnums=(0, 1))


def time_loop(step_fn, bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab,
              frames: int):
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    bank_obj, bank_bg, m = step_fn(bank_obj, bank_bg, *pool, obj_tab,
                                   obj_ids, bg_tab, key)
    first_loss = float(m["loss"])
    compile_s = time.time() - t0

    n_chunks = 5
    per_chunk = max(frames // n_chunks, 1)
    chunk_times = []
    for c in range(n_chunks):
        t0 = time.time()
        for i in range(per_chunk):
            key = jax.random.fold_in(key, c * per_chunk + i)
            bank_obj, bank_bg, m = step_fn(bank_obj, bank_bg, *pool,
                                           obj_tab, obj_ids, bg_tab, key)
        float(m["loss"])
        chunk_times.append((time.time() - t0) / per_chunk)
    return {
        "compile_s": round(compile_s, 1),
        "frame_ms_best": round(1000 * min(chunk_times), 2),
        "frame_ms_median": round(1000 * sorted(chunk_times)[len(chunk_times) // 2], 2),
        "chunks_ms": [round(1000 * t, 2) for t in chunk_times],
        "loss_first": first_loss,
        "loss_last": float(m["loss"]),
    }


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    bf16 = len(sys.argv) > 3 and sys.argv[3] == "bf16"

    step_xla, st, ws = build_workload("float32")
    bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab = ws
    print(f"backend={jax.devices()[0].platform}", file=sys.stderr)

    out = {}
    if mode in ("xla", "both"):
        r = time_loop(step_xla, bank_obj, bank_bg, pool, obj_tab, obj_ids,
                      bg_tab, frames)
        out["xla"] = r
        print("xla:", json.dumps(r), file=sys.stderr)
    if mode in ("fused", "both"):
        # rebuild banks (donated above)
        _, _, ws = build_workload("float32")
        bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab = ws
        step_fused = make_fused_frame(st, bf16)
        r = time_loop(step_fused, bank_obj, bank_bg, pool, obj_tab, obj_ids,
                      bg_tab, frames)
        out["fused"] = r
        print("fused:", json.dumps(r), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
