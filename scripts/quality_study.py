"""Quality studies on the analytic scene (VERDICT #6/#7 + px_block):

  A. f32 vs bf16 compute (does bf16 hurt reconstruction?)
  B. px_block=1 vs 8 (does block-contiguous pixel sampling hurt?)
  C. background ray-budget sweep (close the bg-vs-object quality gap)

Each variant runs scripts/eval_synthetic.py's train->mesh->metrics loop and
the table lands in one JSON. Run on TPU (default env) or --cpu.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_synthetic import main as eval_main


def run(tag, extra, out, base=None):
    args = list(base or []) + extra
    print(f"=== {tag}: {' '.join(args)}", file=sys.stderr)
    res = eval_main(args)
    out[tag] = {k: {m: round(v, 4) for m, v in met.items()}
                for k, met in res.items()}


def main():
    cpu = ["--cpu"] if "--cpu" in sys.argv else []
    quick = "--quick" in sys.argv
    base = (["--frames", "12", "--passes", "2", "--grid", "48",
             "--height", "88", "--width", "120"] if quick else
            ["--frames", "16", "--passes", "3", "--grid", "64",
             "--height", "96", "--width", "128"]) + cpu
    out = {}
    run("f32", [], out, base)
    run("bf16", ["--dtype", "bfloat16"], out, base)
    run("px_block8", ["--px_block", "8"], out, base)
    run("bg_rays160", ["--bg_rays", "160"], out, base)
    run("bg_rays320_h64", ["--bg_rays", "320", "--bg_hidden", "64"], out,
        base)
    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "docs/quality_study.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
