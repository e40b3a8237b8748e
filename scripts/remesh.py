"""Re-export meshes from a saved full-state checkpoint at a chosen grid cap.

The reference meshes per object at an adaptive grid capped at 256
(/root/reference/train.py:351); runs trained with a lower vis.grid_dim can
be re-meshed offline from their checkpoint instead of retraining — used by
the @1cm resolution study (VERDICT r3 #7).

    python scripts/remesh.py --config <run config> --ckpt <logdir>/ckpt/state \
        --out <mesh_dir> --grid_dim 256 [--frame 999]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--grid_dim", type=int, default=256)
    p.add_argument("--frame", type=int, default=None,
                   help="frame id used in the exported filenames "
                        "(default: the checkpoint's frame)")
    args = p.parse_args(argv)

    from vmap_tpu.config import Config
    from vmap_tpu.core import checkpoint as ckpt_lib
    from vmap_tpu.core.mapper import Mapper

    cfg = Config.from_json(args.config)
    cfg.grid_dim = args.grid_dim
    mapper = Mapper(cfg)
    frame = ckpt_lib.load_full_checkpoint(mapper, args.ckpt)
    fid = args.frame if args.frame is not None else frame
    paths = mapper.export_meshes(args.out, fid)
    print(f"re-meshed {len(paths)} objects at grid cap {args.grid_dim} "
          f"-> {args.out}")
    return paths


if __name__ == "__main__":
    main()
