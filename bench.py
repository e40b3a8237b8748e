"""Benchmark: vectorised optimisation steps/sec for the Replica vMAP
workload shape (100 object MLPs h=32 + background h=128).

One "optimisation step" = one inner iteration of the per-frame loop: PE +
ensemble MLP forward/backward + volume render + masked losses + masked
AdamW for all 100 objects (120 rays x 10 samples each) AND the background
field (1200 rays x 14 samples) — the unit the reference performs 20x per
frame in Python (train.py:270-326). Sampling is included (amortised across
the jitted frame step), so this is end-to-end step throughput, not just the
matmul.

The measured path is the production one: the monolithic fused Pallas
train-frame kernel over persistently-prepared banks
(kernels/train_step.py), exactly what Mapper.train_frame dispatches when
tpu.fused_train_step resolves on. Pass mode "xla" to time the scan-based
XLA step instead.

Prints exactly one JSON line:
  {"metric": "train_steps_per_sec_100obj", "value": N, "unit": "steps/s",
   "vs_baseline": N / 5000.0}
(baseline: >= 5000 steps/s on one TPU v5e chip, BASELINE.md). ``value`` is
the best sustained 20-frame chunk (the tunnel frontend adds 2-4x noise
swings); the median chunk is reported alongside in detail. Default dtype is
float32 — the quality-validated configuration (docs/quality_study.json);
bf16 measures within noise anyway (the kernel is VPU-bound) and
intermittently faults the tunneled worker on long runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_workload(compute_dtype: str = "float32", fused: bool = True,
                   px_block: int = int(os.environ.get("BENCH_PX_BLOCK", "1")),
                   px_block_bg: int = int(os.environ.get("BENCH_PX_BLOCK_BG",
                                                         "4")),
                   sample_reuse: int = int(os.environ.get("BENCH_REUSE", "1")),
                   burst: int = 1, n_iter: int = 20):
    import jax
    import jax.numpy as jnp
    from vmap_tpu.core.bank import activate_slot, init_bank
    from vmap_tpu.core.step import StepStatics, make_frame_step, pick_group

    # Replica room0 vMAP config shapes (configs/Replica/..._vMAP.json).
    # The bank allocates SLOTS = 104 (capacity rounds to the G*8 = 32-ray
    # render-merge granule) but only the 100 workload objects are ACTIVE —
    # the 4 inactive pad slots still flow through the kernel fully masked,
    # i.e. the measured work covers >= the 100-object workload.
    CAP, HIDDEN, HIDDEN_BG = 100, 32, 128
    SLOTS = -(-CAP // 8) * 8
    W, H, KF = 1200, 680, 20
    # Pool slot count. The production room runs carry 512 slots (3.3 GB
    # packed pool) — BENCH_POOL=512 reproduces that memory shape; the
    # default 16 keeps bench start-up light (throughput is identical: the
    # step only ever gathers from the slots the keyframe tables name).
    POOL = int(os.environ.get("BENCH_POOL", "16"))

    st = StepStatics(
        n_iter=n_iter, win=5, n_px=24, n_b2s=1, n_bins=9,
        do_bg=True, win_bg=10, n_px_bg=120, n_b2s_bg=5,
        min_depth=0.0, surface_eps=0.1, stop_eps=0.05,
        lr=1e-3, wd=0.013, compute_dtype=compute_dtype,
        fx=600.0, fy=600.0, cx=599.5, cy=339.5,
        use_fused_frame=fused, px_block=px_block, px_block_bg=px_block_bg,
        sample_reuse=sample_reuse,
        dispatch_burst=burst if fused else 1,
    )

    key = jax.random.PRNGKey(0)
    # init_bank already gives every slot fresh per-key params
    bank_obj = init_bank(key, SLOTS, HIDDEN, 2.0)
    bank_obj = bank_obj.replace(
        active=jnp.arange(SLOTS) < CAP)        # 100 active, 4 masked pads
    bank_bg = init_bank(jax.random.fold_in(key, 1), 1, HIDDEN_BG, 5.0)
    bank_bg = activate_slot(bank_bg, 0, jax.random.fold_in(key, 2), 5.0, HIDDEN_BG)
    if fused:
        from vmap_tpu.kernels.train_step import prepare_bank
        bank_obj = prepare_bank(bank_obj, pick_group(SLOTS, HIDDEN))
        bank_bg = prepare_bank(bank_bg, pick_group(1, HIDDEN_BG))

    rng = np.random.default_rng(0)
    depth_mm = rng.integers(500, 7500, (POOL, W, H)).astype(np.uint32)
    inst_b = (rng.integers(-1, CAP, (POOL, W, H)) + 1).astype(np.uint32)
    rgbw = rng.integers(0, 2**24, (POOL, W, H)).astype(np.uint32)
    pool = (
        jnp.asarray(np.stack([rgbw, depth_mm | (inst_b << 16)], axis=-1),
                    jnp.uint32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (POOL, 1, 1)),
    )
    kf_pool = jnp.asarray(rng.integers(0, POOL, (SLOTS, KF)), jnp.int32)
    bbox = jnp.tile(jnp.asarray([100, 500, 100, 400], jnp.float32), (SLOTS, KF, 1))
    n_kf = jnp.full((SLOTS,), KF - 1, jnp.int32)
    latest2 = jnp.tile(jnp.asarray([KF - 3, KF - 2], jnp.int32), (SLOTS, 1))
    obj_tab = (kf_pool, bbox, n_kf, latest2)
    obj_ids = jnp.arange(SLOTS, dtype=jnp.int32)
    bg_bbox = jnp.tile(jnp.asarray([0, W, 0, H], jnp.float32), (1, KF, 1))
    bg_tab = (kf_pool[:1], bg_bbox, n_kf[:1], latest2[:1])

    step = make_frame_step(st)
    return step, st, (bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab)


def anchor_obj_kernel_ms() -> float:
    """Standalone object-kernel timing at a PINNED config (cap=104, h=32,
    full-image bbox, f32, all knob defaults) — a fixed-work anchor recorded
    alongside the headline so cross-session comparisons of BENCH_rNN.json
    can separate code effects from shared-tunnel frontend drift (identical
    code measured 11.66 vs 12.79 ms frames on different days, round 4
    notes). Changes to this function invalidate the anchor series."""
    import jax
    import jax.numpy as jnp
    from vmap_tpu.core.bank import init_bank
    from vmap_tpu.core.step import StepStatics, _sample_bank
    from vmap_tpu.kernels.train_step import fused_frame_prepared, prepare_bank

    CAP, HIDDEN, W, H, POOL, KF = 104, 32, 1200, 680, 20, 20
    st = StepStatics(
        n_iter=20, win=5, n_px=24, n_b2s=1, n_bins=9, do_bg=False,
        min_depth=0.0, surface_eps=0.1, stop_eps=0.05,
        lr=1e-3, wd=0.013, compute_dtype="float32",
        fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    key = jax.random.PRNGKey(0)
    bank = init_bank(key, CAP, HIDDEN, default_scale=2.0)
    bank = bank.replace(active=jnp.ones((CAP,), bool))
    pb = prepare_bank(bank, 4)
    rng = np.random.default_rng(0)
    depth_mm = rng.integers(500, 7500, (POOL, W, H)).astype(np.uint32)
    inst_b = (rng.integers(-1, CAP, (POOL, W, H)) + 1).astype(np.uint32)
    rgbw = rng.integers(0, 2 ** 24, (POOL, W, H)).astype(np.uint32)
    pool = (jnp.asarray(np.stack([rgbw, depth_mm | (inst_b << 16)], -1),
                        jnp.uint32),
            jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (POOL, 1, 1)))
    tab = (jnp.asarray(rng.integers(0, POOL, (CAP, KF)), jnp.int32),
           jnp.tile(jnp.asarray([0, W, 0, H], jnp.float32), (CAP, KF, 1)),
           jnp.full((CAP,), KF, jnp.int32),
           jnp.tile(jnp.asarray([KF - 2, KF - 1], jnp.int32), (CAP, 1)))
    obj_ids = jnp.arange(CAP, dtype=jnp.int32)
    n_frames, n_per = st.n_iter * st.win, st.win * st.n_px
    batch = jax.jit(lambda k: _sample_bank(
        key, *pool, *tab, obj_ids, n_frames, st.n_px, st.n_b2s, st))(key)
    batch = jax.device_put({k: v for k, v in batch.items() if k != "pts"})
    fn = jax.jit(lambda pb, b: fused_frame_prepared(
        pb, b, st.n_iter, n_per, lr=st.lr, wd=st.wd, bf16="f32")[1])
    out = fn(pb, batch)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = fn(pb, batch)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / 10)
    return round(best * 1000, 2)


def verify(frames: int = 2, compute_dtype: str = "float32",
           rtol_sem: float = 2e-3, rtol_full: float = 0.25) -> dict:
    """On-hardware numerics gate, two tiers, both running the fused-Pallas
    and XLA-scan paths from identical initial state and keys:

    * SEMANTIC tier (n_iter=1): with a single optimisation iteration there
      is no compounding, so the paths must agree to reduction-order noise.
      Measured on v5e (2026-08-20): rel 1.8e-5 / 9.2e-5 over 2 frames;
      gate at ``rtol_sem`` (20x margin).
    * FULL tier (n_iter=20, the production config): training is chaotic —
      per-iteration reduction-order noise amplifies ~30x per few
      iterations through AdamW (measured same session: 9e-5 at 1 iter,
      2.9e-2 at 5, 7.3e-2 at 20), so this tier only catches
      garbage/NaN/gross miscompiles (``rtol_full`` + finiteness) — the
      VMAP_ALIAS=1 failure class (hardware NaNs invisible to
      interpret-mode exactness tests, docs/round_notes.md round 4).
    """
    import jax
    from vmap_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    def run_tier(n_iter):
        results = {}
        for fused in (True, False):
            step, st, (bo, bb, pool, obj_tab, obj_ids, bg_tab) = \
                build_workload(compute_dtype, fused, n_iter=n_iter)
            keys = np.asarray(jax.random.split(jax.random.PRNGKey(42),
                                               frames + 1))
            losses = []
            for i in range(frames):
                bo, bb, m = step(bo, bb, *pool, obj_tab, obj_ids, bg_tab,
                                 keys[i])
                losses.append((float(np.asarray(m["loss"]).ravel()[-1]),
                               float(np.asarray(m["loss_mean"]).ravel()[-1])))
            results["fused" if fused else "xla"] = losses
        fu, xl = results["fused"], results["xla"]
        rel = [abs(a - b) / max(abs(b), 1e-9)
               for (a, _), (b, _) in zip(fu, xl)]
        finite = all(np.isfinite(v) for pair in fu + xl for v in pair)
        return max(rel), finite, fu, xl

    sem_rel, sem_fin, sem_fu, sem_xl = run_tier(1)
    full_rel, full_fin, full_fu, full_xl = run_tier(20)
    ok = (sem_fin and full_fin and sem_rel < rtol_sem
          and full_rel < rtol_full)
    return {"metric": "fused_vs_xla_loss_reldiff",
            "value": round(sem_rel, 8), "unit": "rel", "ok": bool(ok),
            "rtol_sem": rtol_sem, "rtol_full": rtol_full,
            "detail": {"semantic_tier_reldiff": round(sem_rel, 8),
                       "full_tier_reldiff": round(full_rel, 6),
                       "semantic_losses": {"fused": sem_fu, "xla": sem_xl},
                       "full_losses": {"fused": full_fu, "xla": full_xl},
                       "frames": frames, "compute_dtype": compute_dtype}}


def run(frames: int = 100, compute_dtype: str = "float32",
        fused: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    if os.environ.get("BENCH_RNG"):  # e.g. "rbg": TPU hardware RNG
        jax.config.update("jax_default_prng_impl", os.environ["BENCH_RNG"])
    from vmap_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()  # fused kernel ~90 s cold; pay it once

    # frames per dispatch (BENCH_BURST): measured NEUTRAL on this frontend
    # (12.77/12.79/13.05 ms at burst 4/1/10, round 4) — the per-frame
    # dispatches already pipeline under the deferred chunk-end loss reads,
    # so burst stays opt-in here and in the configs (tpu.dispatch_burst).
    burst = int(os.environ.get("BENCH_BURST", "1"))
    burst = max(1, min(burst, frames)) if fused else 1

    step, st, (bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab) = \
        build_workload(compute_dtype, fused, burst=burst)

    # all per-frame keys pre-split to HOST arrays: a per-frame device-side
    # fold_in/split is its own dispatch (~0.8 ms tunnel latency each); a
    # numpy uint32[2] key rides the train dispatch as an 8-byte transfer
    # one warmup dispatch + 5 chunks of max(frames//5//burst, 1) dispatches,
    # `burst` keys consumed per dispatch: at tiny --frames the per-chunk
    # floor of 1 needs more keys than `frames`, so size the pool from the
    # dispatch count, not the ask
    n_keys = 1 + (1 + 5 * max(frames // 5 // burst, 1)) * burst
    all_keys = np.asarray(jax.random.split(jax.random.PRNGKey(42),
                                           max(frames + burst, n_keys)))

    if burst > 1:
        # workload-identical burst: the same keyframe tables for each of
        # the K scanned frames (the bench pool/tables are static anyway)
        obj_tabs = tuple(jnp.broadcast_to(a[None], (burst,) + a.shape)
                         for a in obj_tab)
        bg_tabs = tuple(jnp.broadcast_to(a[None], (burst,) + a.shape)
                        for a in bg_tab)

        def one_frame(bo, bb, k):
            """k: [burst, 2] keys -> one dispatch covering `burst` frames."""
            return step(bo, bb, *pool, obj_tabs, obj_ids, bg_tabs, k)
    else:
        def one_frame(bo, bb, k):
            return step(bo, bb, *pool, obj_tab, obj_ids, bg_tab, k)

    # warmup / compile. NOTE on synchronisation: on remote-execution
    # backends block_until_ready can resolve before device completion, so
    # every timed region ends with a host readback of the final loss — a
    # scalar data-dependent on the whole donated-bank chain, which cannot
    # materialise until every step actually ran.
    def key_arg(i):
        ks = all_keys[i:i + burst]
        return ks if burst > 1 else ks[0]

    def last_loss(m):
        return float(np.asarray(m["loss"]).ravel()[-1])

    t0 = time.time()
    bank_obj, bank_bg, m = one_frame(bank_obj, bank_bg, key_arg(0))
    last_loss(m)
    compile_s = time.time() - t0

    # The tunnel/dispatch latency on shared TPU frontends is noisy (2-4x
    # swings between identical runs); report the best sustained chunk as
    # the headline and the median chunk alongside.
    n_chunks = 5
    per_chunk = max(frames // n_chunks // burst, 1)   # dispatches per chunk
    chunk_times = []
    for c in range(n_chunks):
        t0 = time.time()
        for i in range(per_chunk):
            bank_obj, bank_bg, m = one_frame(
                bank_obj, bank_bg,
                # warmup consumed all_keys[0:burst]; timed chunks start at
                # index `burst` so no warmup key repeats in the RNG stream
                key_arg(burst + (c * per_chunk + i) * burst))
        last_loss(m)  # forces completion of the full chain
        chunk_times.append((time.time() - t0) / (per_chunk * burst))
    frame_s = min(chunk_times)
    frame_s_med = sorted(chunk_times)[len(chunk_times) // 2]

    anchor = None
    if os.environ.get("BENCH_ANCHOR", "1") != "0" and fused:
        try:
            anchor = anchor_obj_kernel_ms()
        except Exception as e:  # never let the anchor sink the headline
            print(f"anchor skipped: {e!r}", file=sys.stderr)

    sps = st.n_iter / frame_s
    return {
        "metric": "train_steps_per_sec_100obj",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 5000.0, 3),
        "detail": {
            "frames": frames, "iters_per_frame": st.n_iter,
            "frame_ms": round(1000 * frame_s, 2),
            "frame_ms_median": round(1000 * frame_s_med, 2),
            "steps_per_sec_median": round(st.n_iter / frame_s_med, 1),
            "frame_ms_chunks": [round(1000 * t, 2) for t in chunk_times],
            "compile_s": round(compile_s, 1),
            "compute_dtype": compute_dtype,
            "px_block": st.px_block, "px_block_bg": st.px_block_bg,
            "sample_reuse": st.sample_reuse,
            "sampling": ("reference_exact"
                         if st.px_block == 1 and st.sample_reuse == 1
                         else f"blocked_px{st.px_block}" if st.px_block > 1
                         else f"iter_reuse_x{st.sample_reuse}"),
            "path": "fused_pallas" if fused else "xla_scan",
            "dispatch_burst": burst,
            "loss_final": last_loss(m),
            "backend": jax.devices()[0].platform,
            # fixed-work anchor: standalone obj kernel at a pinned config,
            # for cross-session frontend-drift attribution (see
            # anchor_obj_kernel_ms). null if its compile fails/times out.
            "anchor_obj_kernel_ms": anchor,
        },
    }


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--verify"]
    if "--verify" in sys.argv[1:]:
        # on-hardware fused-vs-XLA numerics gate (run at the top of every
        # bench session; exits 1 on disagreement/NaN)
        result = verify(int(argv[0]) if argv else 2,
                        argv[1] if len(argv) > 1 else "float32")
        print(json.dumps(result))
        sys.exit(0 if result["ok"] else 1)
    frames = int(argv[0]) if argv else 100
    dtype = argv[1] if len(argv) > 1 else "float32"
    fused = not (len(argv) > 2 and argv[2] == "xla")
    result = run(frames, dtype, fused)
    print(json.dumps(result))
