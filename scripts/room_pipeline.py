"""Replica-SCALE acceptance run on the procedurally furnished room.

The reference's quality story is 2000-frame, ~50-object Replica rooms at
1200 x 680 evaluated per-object and per-scene
(/root/reference/metric/eval_3D_scene.py:36-82, eval_3D_obj.py:68-117;
workload shape configs/Replica/config_replica_room0_vMAP.json:18-50). Real
Replica assets don't exist in this environment, so this pipeline runs the
same protocol end-to-end on the in-repo room generator:

  1. ray-trace a furnished room (data_generation/room.py) at 1200 x 680
     in the exact Replica vMAP layout,
  2. train through the REAL CLI config (configs/Replica/room0_vmap.json
     with only dataset.path / cadence fields repointed),
  3. run the object protocol (GT-OBB/0.9 crop, bg = background-class
     submesh concat) and the composed-scene protocol.

    python scripts/room_pipeline.py [--work /tmp/vmap_room] [--frames 1000]
        [--objects 40] [--px_block N] [--skip_generate] [--out results.json]

TPU by default (generation, training and meshing all run on the chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/vmap_room")
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--objects", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--px_block", type=int, default=None,
                   help="override tpu.px_block (default: config value)")
    p.add_argument("--px_block_bg", type=int, default=None,
                   help="override tpu.px_block_bg")
    p.add_argument("--compute_dtype", default=None,
                   help="override tpu.compute_dtype (e.g. int8)")
    p.add_argument("--sample_reuse", type=int, default=None,
                   help="override tpu.sample_reuse (iteration-reuse "
                        "sampling, core/step.py)")
    p.add_argument("--train_seed", type=int, default=None,
                   help="override tpu.seed (repeat-run variance studies)")
    p.add_argument("--grid_dim", type=int, default=128)
    p.add_argument("--n_models", type=int, default=None)
    p.add_argument("--config", default="configs/Replica/room0_vmap.json",
                   help="shipped config to train with (e.g. the iMAP or "
                        "ScanNet family)")
    p.add_argument("--format", default="Replica",
                   choices=["Replica", "ScanNet"],
                   help="dataset layout to generate/train on")
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--height", type=int, default=680)
    p.add_argument("--focal", type=float, default=600.0)
    p.add_argument("--scene_only", action="store_true",
                   help="skip the object protocol (iMAP: single field)")
    p.add_argument("--tag", default=None, help="override the run tag")
    p.add_argument("--ply_furniture", action="store_true",
                   help="~1/3 of furniture from a generated .ply library")
    p.add_argument("--save_ckpt", action="store_true",
                   help="save per-object + full-state checkpoints at the "
                        "export cadence (enables offline remesh.py)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="generic config override applied after the named "
                        "flags, e.g. --set model.keyframe_buffer_size=40 "
                        "(repeatable; values parsed as JSON, falling back "
                        "to string)")
    p.add_argument("--skip_generate", action="store_true",
                   help="reuse an already-generated dataset in --work")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    data_dir = os.path.join(args.work, "data")
    tag = f"px{args.px_block}" if args.px_block is not None else "default"
    if args.px_block_bg is not None:
        tag += f"_bg{args.px_block_bg}"
    if args.compute_dtype is not None:
        tag += f"_{args.compute_dtype}"
    if args.sample_reuse is not None:
        tag += f"_reuse{args.sample_reuse}"
    if args.train_seed is not None:
        tag += f"_seed{args.train_seed}"
    if args.tag is not None:
        tag = args.tag
    logdir = os.path.join(args.work, f"run_{tag}")
    os.makedirs(args.work, exist_ok=True)

    t0 = time.time()
    if not args.skip_generate:
        print(f"[1/3] generating {args.frames}-frame room "
              f"({args.objects} objects, 1200x680) ...", flush=True)
        from scripts.generate_dataset import main as gen_main
        gen_main([data_dir, "--format", args.format, "--scene", "room",
                  "--objects", str(args.objects), "--seed", str(args.seed),
                  "--frames", str(args.frames),
                  "--width", str(args.width), "--height", str(args.height),
                  "--fx", str(args.focal), "--fy", str(args.focal)]
                 + (["--ply_furniture"] if args.ply_furniture else []))
        print(f"  generated in {time.time() - t0:.0f}s", flush=True)

    # Dataset sanity gate: the room shell is watertight, so rays only miss
    # through generator bugs. Round 4 found /tmp work dirs holding a
    # STALE-CODE regeneration (31-44% ray escapes, round-1-era trajectory)
    # that silently poisoned quality runs — fail loudly instead.
    import numpy as np
    depth_dir = os.path.join(data_dir, "depth")
    if os.path.isdir(depth_dir):
        import cv2
        files = sorted(os.listdir(depth_dir))
        probe = files[:: max(len(files) // 5, 1)][:5]
        fracs = []
        for f in probe:
            d = cv2.imread(os.path.join(depth_dir, f), cv2.IMREAD_UNCHANGED)
            if d is not None:
                fracs.append(float((d == 0).mean()))
        if fracs and float(np.mean(fracs)) > 0.15:
            raise SystemExit(
                f"dataset sanity check FAILED: mean invalid-depth fraction "
                f"{np.mean(fracs):.2f} over {len(fracs)} probed frames — "
                f"the room dataset in {data_dir} has ray escapes (stale or "
                f"buggy generation). Regenerate without --skip_generate.")

    # the shipped config with only the dataset path, pool size and export
    # cadence repointed at the generated sequence
    with open(args.config) as f:
        cfg = json.load(f)
    n_frames = args.max_frames or args.frames
    cfg["dataset"]["path"] = data_dir
    # camera must match the generated resolution (ScanNet reads fx/fy/cx/cy
    # from the dataset's intrinsic txt, but w/h/margins come from the config)
    cfg["camera"]["w"] = args.width
    cfg["camera"]["h"] = args.height
    if args.format == "Replica":
        cfg["camera"]["fx"] = cfg["camera"]["fy"] = args.focal
        cfg["camera"]["cx"] = (args.width - 1) / 2.0
        cfg["camera"]["cy"] = (args.height - 1) / 2.0
    # per-object keyframe schedules (first_seen + k*keyframe_step phases)
    # pool ~40 objects x 20-kf buffers with ~1.6x frame sharing -> ~500
    # distinct frames at steady state; 512 matches the shipped room0 config
    cfg["tpu"]["frame_pool_size"] = 512
    cfg["vis"]["n_vis_iter"] = max(n_frames - 1, 1)
    cfg["vis"]["grid_dim"] = args.grid_dim
    if args.px_block is not None:
        cfg["tpu"]["px_block"] = args.px_block
    if args.px_block_bg is not None:
        cfg["tpu"]["px_block_bg"] = args.px_block_bg
    if args.n_models is not None:
        cfg["trainer"]["n_models"] = args.n_models
    if args.compute_dtype is not None:
        cfg["tpu"]["compute_dtype"] = args.compute_dtype
    if args.sample_reuse is not None:
        cfg["tpu"]["sample_reuse"] = args.sample_reuse
    if args.train_seed is not None:
        cfg["tpu"]["seed"] = args.train_seed
    for ov in args.overrides:
        path, eq, raw = ov.partition("=")
        sec, dot, key = path.partition(".")
        if not (eq and dot and sec and key):
            raise SystemExit(f"--set expects SECTION.KEY=VALUE, got {ov!r}")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        cfg.setdefault(sec, {})[key] = val
    cfg_path = os.path.join(args.work, f"room_config_{tag}.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    if not args.skip_train:
        print(f"[2/3] training {n_frames} frames through train.py "
              f"({cfg_path}) ...", flush=True)
        t1 = time.time()
        from train import main as train_main
        train_argv = ["--config", cfg_path, "--logdir", logdir]
        if args.max_frames:
            train_argv += ["--max_frames", str(args.max_frames)]
        if args.save_ckpt:
            train_argv += ["--save_ckpt"]
        train_main(train_argv)
        print(f"  trained in {time.time() - t1:.0f}s", flush=True)

    print("[3/3] evaluating ...", flush=True)
    last_frame = n_frames - 1
    mesh_dir = os.path.join(logdir, "scene_mesh")
    gt_dir = os.path.join(data_dir, "habitat")
    from vmap_tpu.eval.eval_3d import main as eval_main
    obj_m = None
    if not args.scene_only:
        obj_path = os.path.join(args.work, f"metrics_obj_{tag}.json")
        obj_m = eval_main(["object", "--mesh_dir", mesh_dir,
                           "--gt_dir", gt_dir, "--format", args.format,
                           "--frame", str(last_frame), "--out", obj_path])

    from vmap_tpu.geometry.mesh import Mesh, load_mesh
    parts = [load_mesh(os.path.join(gt_dir, f))
             for f in sorted(os.listdir(gt_dir)) if f.endswith(".ply")]
    # rebuilt every run (seconds of work): caching by existence alone went
    # stale when the dataset was regenerated with a different --objects or
    # --seed into the same --work dir
    gt_scene_path = os.path.join(args.work, "gt_scene.obj")
    Mesh.concatenate(parts).export(gt_scene_path)
    scene_path = os.path.join(args.work, f"metrics_scene_{tag}.json")
    scene_m = eval_main(["scene", "--mesh_dir", mesh_dir,
                         "--gt_mesh", gt_scene_path,
                         "--frame", str(last_frame), "--out", scene_path])

    summary = {"tag": tag, "frames": n_frames, "objects": args.objects,
               "grid_dim": args.grid_dim, "config": args.config,
               "object_mean": obj_m["mean"] if obj_m else None,
               "bg": obj_m["per_object"].get(0) if obj_m else None,
               "scene": scene_m,
               "total_s": round(time.time() - t0, 1)}
    out = args.out or os.path.join(args.work, f"room_study_{tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
