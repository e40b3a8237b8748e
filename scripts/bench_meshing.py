"""TPU benchmark: bank-vectorised meshing vs the round-1 per-object loop.

Builds a Mapper with N active objects (synthetic scene content so bounds
and fields are real), then times export-style meshing both ways:
  serial : mesh_object per object (per-object dispatches + per-chunk syncs)
  batched: mesh_all_objects (one [O, chunk] eval program per chunk)

Usage: python scripts/bench_meshing.py [n_objects] [grid_dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_objects = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    grid_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from vmap_tpu.config import Config
    from vmap_tpu.core import meshing
    from vmap_tpu.core.mapper import FrameSample, Mapper
    from vmap_tpu.data.synthetic import SyntheticScene

    # a scene with many instances: tile the sphere/box ids over slots by
    # relabelling the instance map per frame
    scene = SyntheticScene(width=120, height=96, fx=90.0, fy=90.0)
    cfg = Config(
        max_n_models=max(4, n_objects), do_bg=False, hidden_feature_size=32,
        n_iter_per_frame=2, win_size=2, n_samples_per_frame=16,
        keyframe_buffer_size=6, keyframe_step=2,
        W=120, H=96, fx=90.0, fy=90.0, cx=59.5, cy=47.5,
        frame_pool_size=16, seed=0, grid_dim=grid_dim,
        live_voxel_size=0.02)
    m = Mapper(cfg)
    rng = np.random.default_rng(0)
    for fid in range(8):
        s = scene.frame_sample(fid, n_frames=8)
        inst = s["obj"].copy()
        bbox = dict(s["bbox_dict"])
        # relabel the two real objects into many ids (still real geometry)
        for k in range(2, n_objects):
            src = scene.SPHERE_ID if k % 2 else scene.BOX_ID
            if src in bbox:
                bbox[100 + k] = bbox[src]
        for k in range(2, n_objects):
            src = scene.SPHERE_ID if k % 2 else scene.BOX_ID
            sub = (inst == src) & (rng.random(inst.shape) < 0.5)
            inst = np.where(sub, 100 + k, inst)
        m.process_frame(FrameSample(s["image"], s["depth"], inst, bbox,
                                    s["T"], fid))
    obj_ids = [oid for oid in sorted(m.registry)
               if not m.registry[oid].is_bg]
    print(f"{len(obj_ids)} objects registered", file=sys.stderr)

    # warm both paths (compiles dominate first calls on the remote backend)
    meshing.mesh_all_objects(m)
    m.mesh_object(obj_ids[0])
    m.mesh_object(obj_ids[1])

    t0 = time.time()
    batched = meshing.mesh_all_objects(m)
    t_batched = time.time() - t0
    n_meshed = sum(1 for v in batched.values() if v is not None)

    t0 = time.time()
    n_serial = 0
    for oid in obj_ids:
        if m.mesh_object(oid) is not None:
            n_serial += 1
    t_serial = time.time() - t0

    out = {
        "n_objects": len(obj_ids), "grid_dim": grid_dim,
        "meshed": n_meshed, "meshed_serial": n_serial,
        "serial_s": round(t_serial, 2), "batched_s": round(t_batched, 2),
        "speedup": round(t_serial / max(t_batched, 1e-9), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
