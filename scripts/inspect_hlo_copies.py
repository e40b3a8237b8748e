"""Name the frame step's non-kernel device work from the compiled HLO.

Round-3 xprof showed ~0.38 ms/frame of `copy.*` rows plus ~0.4 ms of
sampler glue around the two fused kernels (docs/round_notes.md, round-3
final trace); the suspected cause was donation relayouts. This script
AOT-compiles the production bench frame step (same shapes as bench.py)
and prints every copy/transpose/bitcast-convert instruction in the
optimized HLO with its byte size, grouped, so the cause can be *named*
instead of guessed (VERDICT round-3 item #3). Compilation rides the
compile service only — safe to run while the chip executes other work.

Usage: python scripts/inspect_hlo_copies.py [xla]
"""

from __future__ import annotations

import re
import sys


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    width = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "u16": 2, "f16": 2,
             "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}
    return n * width.get(dt, 4)


def main() -> None:
    fused = not (len(sys.argv) > 1 and sys.argv[1] == "xla")
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_workload
    step, st, (bank_obj, bank_bg, pool, obj_tab, obj_ids, bg_tab) = \
        build_workload(fused=fused)
    import jax

    key = jax.random.PRNGKey(0)
    lowered = step.lower(bank_obj, bank_bg, *pool, obj_tab, obj_ids,
                         bg_tab, key)
    print("lowered; compiling (compile-service lottery: 15 s - 15 min) ...",
          flush=True)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/frame_step_hlo.txt", "w") as f:
        f.write(hlo)
    print("full optimized HLO -> /tmp/frame_step_hlo.txt")

    # Every top-level instruction of the entry computation that is a copy
    # or a fusion whose name marks it as a copy/transpose fusion.
    copies: list[tuple[int, str]] = []
    for line in hlo.splitlines():
        ln = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=\s*(\S+)\s+(copy|transpose|fusion)\(",
                     ln)
        if not m:
            continue
        name, shape, op = m.groups()
        if op == "fusion" and "copy" not in name and "transpose" not in name:
            continue
        copies.append((shape_bytes(shape), f"{op:9s} {shape:28s} {name}"))

    copies.sort(reverse=True)
    total = sum(b for b, _ in copies)
    print(f"\n{len(copies)} copy/transpose instructions, "
          f"{total / 1e6:.2f} MB total output:")
    for b, desc in copies[:40]:
        print(f"  {b / 1e3:10.1f} kB  {desc}")

    # rough memory-bound time estimate at ~800 GB/s effective HBM r/w
    print(f"\nHBM-roundtrip estimate (2x bytes / 800 GB/s): "
          f"{2 * total / 800e9 * 1e3:.3f} ms")

    # and the fusions feeding the kernels (sampler glue): count + bytes
    fus = re.findall(r"= (\S+) fusion\(", hlo)
    print(f"total fusions in entry: {len(fus)}")


if __name__ == "__main__":
    main()
