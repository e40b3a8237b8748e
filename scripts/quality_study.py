"""Quality studies on the analytic scene (VERDICT #6/#7 + px_block):

  A. f32 vs bf16 compute (does bf16 hurt reconstruction?)
  B. px_block=1 vs 8 (does block-contiguous pixel sampling hurt?)
  C. background ray-budget sweep (close the bg-vs-object quality gap)

Each variant runs scripts/eval_synthetic.py in its OWN subprocess (the
tunneled TPU worker occasionally crashes on long-lived processes; isolation
plus one retry makes the sweep robust) and the table lands in one JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL = os.path.join(REPO, "scripts", "eval_synthetic.py")


def run(tag, extra, out, base):
    args = base + extra + ["--out", f"/tmp/quality_{tag}.json"]
    print(f"=== {tag}: {' '.join(args)}", file=sys.stderr, flush=True)
    for attempt in (1, 2):
        r = subprocess.run([sys.executable, EVAL] + args,
                           capture_output=True, text=True, timeout=3600)
        if r.returncode == 0:
            break
        print(f"{tag} attempt {attempt} failed:\n{r.stderr[-1500:]}",
              file=sys.stderr, flush=True)
    else:
        out[tag] = {"error": "failed twice"}
        return
    print(r.stdout.strip(), file=sys.stderr, flush=True)
    with open(f"/tmp/quality_{tag}.json") as f:
        out[tag] = {k: {m: round(v, 4) for m, v in met.items()}
                    for k, met in json.load(f).items()}


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
