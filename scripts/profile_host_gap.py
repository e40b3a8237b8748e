"""Decompose the wall-vs-device gap of the bench frame loop (~1.5 ms/frame
at round 4: 12.21 ms wall vs ~10.7 ms device in xprof).

Burst dispatch measured NEUTRAL (round 4), so the gap is NOT a flat
per-dispatch tunnel cost that batching would amortise — this script names
what it actually is with timestamped host-side logging of the exact bench
loop (same workload builder):

  enqueue_ms   host time spent INSIDE each step() call (arg processing,
               pytree flatten, donation bookkeeping, RPC enqueue) — pure
               host cost that serialises with everything else
  gap_ms       host time BETWEEN consecutive step() calls (the python
               loop + key slicing — should be ~0)
  sync_ms      the chunk-end loss readback (device drain + tunnel RTT,
               amortised over the chunk)
  wall_ms      per-frame wall of a synced chunk (bench.py's number)

wall ~= device_busy + max(0, host_serial - device_overlap): if
enqueue_ms * frames ~= (wall - device) * frames the residual is host
dispatch cost; if enqueue is small but wall stays high, the device is
genuinely idle between kernels (tunnel scheduling), which xprof's idle row
corroborates (scripts/profile_kernel_trace.py).

Usage: python scripts/profile_host_gap.py [frames_per_chunk] [n_chunks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    per_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import bench
    from vmap_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    step, st, (bo, bb, pool, obj_tab, obj_ids, bg_tab) = \
        bench.build_workload()
    n = per_chunk * n_chunks + 1
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(42), n))

    def last_loss(m):
        return float(np.asarray(m["loss"]).ravel()[-1])

    t0 = time.perf_counter()
    bo, bb, m = step(bo, bb, *pool, obj_tab, obj_ids, bg_tab, keys[0])
    last_loss(m)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    rows = []
    ki = 1
    for c in range(n_chunks):
        enq, gap = [], []
        t_chunk0 = time.perf_counter()
        t_prev_end = t_chunk0
        for i in range(per_chunk):
            k = keys[ki]; ki += 1
            t_a = time.perf_counter()
            bo, bb, m = step(bo, bb, *pool, obj_tab, obj_ids, bg_tab, k)
            t_b = time.perf_counter()
            enq.append(t_b - t_a)
            gap.append(t_a - t_prev_end)
            t_prev_end = t_b
        t_sync0 = time.perf_counter()
        loss = last_loss(m)
        t_end = time.perf_counter()
        rows.append({
            "wall_ms": 1000 * (t_end - t_chunk0) / per_chunk,
            "enqueue_ms": 1000 * float(np.mean(enq)),
            "enqueue_ms_p50": 1000 * float(np.median(enq)),
            "enqueue_ms_max": 1000 * float(np.max(enq)),
            "gap_ms": 1000 * float(np.mean(gap)),
            "sync_ms": 1000 * (t_end - t_sync0),
            "loss": loss,
        })
        r = rows[-1]
        print(f"chunk {c}: wall {r['wall_ms']:.2f} ms/frame | enqueue "
              f"{r['enqueue_ms']:.3f} (p50 {r['enqueue_ms_p50']:.3f}, max "
              f"{r['enqueue_ms_max']:.3f}) | loop gap {r['gap_ms']:.3f} | "
              f"chunk-end sync {r['sync_ms']:.1f} ms", flush=True)

    best = min(rows, key=lambda r: r["wall_ms"])
    host_serial = best["enqueue_ms"] + best["gap_ms"]
    sync_amort = best["sync_ms"] / per_chunk
    print(f"\nbest chunk: wall {best['wall_ms']:.2f} ms/frame")
    print(f"  host serial per frame (enqueue+gap): {host_serial:.3f} ms")
    print(f"  chunk-end sync amortised: {sync_amort:.3f} ms/frame")
    print(f"  residual (wall - host_serial - sync_amort): "
          f"{best['wall_ms'] - host_serial - sync_amort:.2f} ms "
          f"= device busy + device idle (xprof splits those)")


if __name__ == "__main__":
    main()
