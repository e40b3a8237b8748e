"""Capture a device trace of the fused frame on TPU and dump op-level stats.

Uses jax.profiler for capture and the installed xprof converter for
analysis (no TensorBoard UI needed). Prints the top ops by self-time.

Usage: python scripts/profile_kernel_trace.py [trace_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import build_workload


def capture(trace_dir: str):
    step, st, ws = build_workload(
        os.environ.get("TRACE_DTYPE", "float32"), fused=True)
    pb_obj, pb_bg, pool, obj_tab, obj_ids, bg_tab = ws
    key = jax.random.PRNGKey(0)
    # warm up / compile outside the trace
    pb_obj, pb_bg, m = step(pb_obj, pb_bg, *pool, obj_tab, obj_ids, bg_tab,
                            key)
    float(m["loss"])
    with jax.profiler.trace(trace_dir):
        for i in range(10):
            key = jax.random.fold_in(key, i)
            pb_obj, pb_bg, m = step(pb_obj, pb_bg, *pool, obj_tab,
                                    obj_ids, bg_tab, key)
        float(m["loss"])
    print("trace captured", file=sys.stderr)


def analyse(trace_dir: str):
    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane.pb found under", trace_dir, file=sys.stderr)
        return
    xplane = max(xplanes, key=os.path.getmtime)
    sess_dir = os.path.dirname(xplane)
    from xprof.convert import raw_to_tool_data as rtd
    for tool in ("op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], tool, {})
        except Exception as e:
            print(f"{tool}: failed: {e}", file=sys.stderr)
            continue
        out = os.path.join(sess_dir, f"{tool}.json")
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"wrote {out} ({len(data)} bytes)", file=sys.stderr)
    print(sess_dir)


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_trace"
    if not os.environ.get("ANALYSE_ONLY"):
        capture(trace_dir)
    analyse(trace_dir)
